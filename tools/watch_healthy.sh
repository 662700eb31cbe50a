#!/bin/bash
# Persistent health watcher for the tunneled dev TPU (PERF.md documents its
# ~50x-degraded state). Probes a chained reduction every ~90 s; when the
# chip is healthy (>= 50 GB/s) it runs the measurement battery ONCE per
# 30-minute window and archives the raw artifacts under
# /root/repo/perf_records/<utc-stamp>/ so healthy-window numbers become
# repo-committed records (bench.py surfaces the best one in its JSON line).
#
# Battery (ordered most->least important so a short window still captures
# the headline): bench.py (official JSON), tools/probe_transcode.py (XLA
# scatter-engine variants -> promotion evidence), tools/bench_all.py (the
# full procedure table incl. SWAR-vs-event and pallas-vs-xla rows),
# tools/probe_vpu.py (VPU op-cost anchors). Each step is preceded by a
# fresh probe reading recorded next to its artifact so a mid-battery
# degradation is visible in the record.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
LOG=/tmp/watch_log.txt
LASTRUN=0
probe_gbps() {
  # Round-3 probe (matches bench.py): (a) chained-dependence kernel
  # acc'=sum(|x-acc|) — NOT loop-factorable (the round-2 probe's
  # acc+sum(x*(k+i)) was hoisted by XLA and printed impossible numbers,
  # VERDICT r02 weak #2/#6); bandwidth from the big-minus-small run
  # difference, which cancels tunnel launch jitter; (b) identity-scatter
  # ns/element (the flagship op's own primitive) must also be healthy.
  # Prints a single effective GB/s, or 0 when either signal is degraded
  # or implausible (above roofline / clamped).
  timeout 300 python - <<'PY' 2>/dev/null
import time, numpy as np, jax, jax.numpy as jnp
from jax import lax
x = jnp.ones(32*1024*1024, jnp.float32)  # 128 MiB
SCAT_N, SI = 1 << 22, 8
ix = jax.device_put(np.arange(SCAT_N, dtype=np.int32))
v = jax.device_put(np.ones(SCAT_N, np.int32))
def mk(iters):
    @jax.jit
    def p(x, k):
        def body(i, acc):
            return jnp.sum(jnp.abs(x - acc)) * 1e-9 + k
        return lax.fori_loop(0, iters, body, jnp.float32(0))
    return p
ps, pb = mk(8), mk(328)
@jax.jit
def scat(v, ix, k):
    def body(i, acc):
        out = jnp.zeros(SCAT_N, jnp.int32).at[ix].set(v + k + i + acc)
        return out[123] + out[SCAT_N - 5]
    return lax.fori_loop(0, SI, body, jnp.int32(0))
jax.device_get(ps(x, jnp.float32(0.))); jax.device_get(pb(x, jnp.float32(0.)))
jax.device_get(scat(v, ix, jnp.int32(0)))
t0 = time.perf_counter(); jax.device_get(ps(x, jnp.float32(1.)))
t_s = time.perf_counter() - t0
if t_s > 1.0:
    print(0.0); raise SystemExit
t0 = time.perf_counter(); jax.device_get(pb(x, jnp.float32(1.5)))
t_b = time.perf_counter() - t0
d = t_b - t_s
bw = (320 * 0.125) / d if d > 5e-3 else 0.0
if bw > 1.2 * 983:  # above-roofline reading = probe bug, not health
    bw = 0.0
t0 = time.perf_counter(); jax.device_get(scat(v, ix, jnp.int32(1)))
scat_ns = (time.perf_counter() - t0) * 1e9 / (SCAT_N * SI)
if scat_ns > 2.0:  # scatter serialization fingerprint: not healthy
    bw = 0.0
print(round(bw, 1))
PY
}
echo "=== watcher start $(date -u)" >> $LOG
BEST=0
for i in $(seq 1 500); do
  GBPS=$(probe_gbps)
  NOW=$(date +%s)
  echo "--- attempt $i probe=${GBPS:-fail} GB/s $(date -u)" >> $LOG
  # adaptive insurance: if the chip never reaches the healthy bar but
  # climbs well above anything seen so far, capture a short bench-only
  # record from the best state available (tagged by its probe value)
  if [ -n "$GBPS" ] && python -c "exit(0 if 25 <= float('$GBPS') < 50 and float('$GBPS') > 2*float('$BEST') else 1)" 2>/dev/null; then
    BEST=$GBPS
    STAMP=$(date -u +%Y%m%dT%H%M%SZ)
    REC=/root/repo/perf_records/partial_$STAMP
    mkdir -p "$REC"
    echo "$GBPS" > "$REC/probe_gbps.txt"
    echo "=== PARTIAL capture ($GBPS GB/s) -> $REC" >> $LOG
    timeout 1500 python bench.py > "$REC/bench.json" 2> "$REC/bench.stderr"
    echo "=== partial bench rc=$? $(date -u): $(cat "$REC/bench.json")" >> $LOG
  fi
  if [ -n "$GBPS" ] && python -c "exit(0 if float('$GBPS') >= 50 else 1)" 2>/dev/null; then
    if [ $((NOW - LASTRUN)) -gt 1800 ]; then
      LASTRUN=$NOW
      STAMP=$(date -u +%Y%m%dT%H%M%SZ)
      REC=/root/repo/perf_records/$STAMP
      mkdir -p "$REC"
      echo "$GBPS" > "$REC/probe_gbps.txt"
      echo "=== HEALTHY ($GBPS GB/s) at $(date -u); battery -> $REC" >> $LOG
      timeout 600 python tools/hw_smoke.py > "$REC/hw_smoke.json" 2>> "$REC/hw_smoke.json"
      echo "=== hw_smoke rc=$? $(date -u): $(tail -1 "$REC/hw_smoke.json")" >> $LOG
      BENCH_PROFILE_DIR="$REC/profile" timeout 1500 python bench.py > "$REC/bench.json" 2> "$REC/bench.stderr"
      echo "=== bench rc=$? $(date -u): $(cat "$REC/bench.json")" >> $LOG
      probe_gbps > "$REC/probe_before_transcode.txt"
      timeout 1500 python tools/probe_transcode.py > "$REC/probe_transcode.log" 2>&1
      echo "=== transcode probe rc=$? $(date -u)" >> $LOG
      probe_gbps > "$REC/probe_before_bench_all.txt"
      timeout 2400 python tools/bench_all.py --size 32 > "$REC/bench_all.jsonl" 2> "$REC/bench_all.stderr"
      echo "=== bench_all rc=$? $(date -u)" >> $LOG
      probe_gbps > "$REC/probe_before_vpu.txt"
      timeout 900 python tools/probe_vpu.py ew32 ew16 ew8 gather roll_st compact fullpath b64dec > "$REC/probe_vpu.log" 2>&1
      echo "=== vpu probe rc=$? $(date -u)" >> $LOG
      probe_gbps > "$REC/probe_after.txt"
      echo "=== battery done $(date -u)" >> $LOG
    fi
  fi
  sleep 90
done
echo "=== watcher end $(date -u)" >> $LOG
