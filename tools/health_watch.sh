#!/bin/bash
# Watch the dev TPU's health; when it recovers, capture a bench run.
# Logs to /tmp/health_watch.log; good bench JSON to /tmp/bench_good.json.
cd /root/repo
for i in $(seq 1 60); do
  probe=$(timeout 120 python -u -c "
import time, jax, jax.numpy as jnp, numpy as np
from jax import lax
x = jax.device_put(np.ones(4*1024*1024, np.float32))
@jax.jit
def f(x, k):
    def body(i, acc): return acc + jnp.sum(x * (k + i).astype(jnp.float32))
    return lax.fori_loop(0, 10, body, jnp.float32(0))
jax.device_get(f(x, jnp.float32(0)))
t0=time.perf_counter(); jax.device_get(f(x, jnp.float32(1)))
print(int(16/1.024/((time.perf_counter()-t0)/10)/1000))
" 2>/dev/null | tail -1)
  echo "$(date +%H:%M:%S) probe=${probe:-FAIL} GB/s" >> /tmp/health_watch.log
  if [ -n "$probe" ] && [ "$probe" -gt 50 ] 2>/dev/null; then
    echo "$(date +%H:%M:%S) HEALTHY — running bench" >> /tmp/health_watch.log
    timeout 560 python bench.py > /tmp/bench_good.json 2>>/tmp/health_watch.log
    echo "$(date +%H:%M:%S) bench done: $(cat /tmp/bench_good.json)" >> /tmp/health_watch.log
    exit 0
  fi
  sleep 540
done
