#!/usr/bin/env python
"""Standalone honest device-health probe (non-hoistable, chained).

Three independent signals, so a single broken measurement can't lie:
  1. chained-dependence bandwidth kernel: acc' = sum(|x - acc|) — every
     iteration's full-array traversal depends on the previous scalar, so
     XLA cannot factor the loop into one reduction.
  2. identity dynamic-slice/scatter latency (ns/element) — the documented
     degraded-state fingerprint is scatter serialization (~7.5 ns/elem).
  3. elementwise copy GB/s.
Readings above 1.2x HBM roofline are treated as probe bugs, not health.
"""
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    dev = str(jax.devices()[0])
    hbm = 819.0 if "v5" in dev.lower() else 819.0
    log(f"device={dev}")

    MB = 128
    xp = jax.device_put(np.ones(MB * 1024 * 1024 // 4, np.float32))
    ITERS = 40
    GB = ITERS * MB / 1024.0

    @jax.jit
    def probe(x, k):
        def body(i, acc):
            # acc feeds back into the traversal: non-factorable
            return jnp.sum(jnp.abs(x - acc)) * 1e-9 + k
        return lax.fori_loop(0, ITERS, body, jnp.float32(0))

    jax.device_get(probe(xp, jnp.float32(0.0)))
    for t in range(3):
        t0 = time.perf_counter()
        r = jax.device_get(probe(xp, jnp.float32(t + 1.0)))
        dt = time.perf_counter() - t0
        gbps = GB / dt
        flag = " (IMPLAUSIBLE >1.2x HBM — probe bug)" if gbps > 1.2 * hbm else ""
        log(f"chained-bw probe[{t}]: {gbps:.1f} GB/s ({dt*1e3:.1f} ms){flag} r={r:.3f}")

    # scatter latency fingerprint
    N = 1 << 22
    idx = jax.device_put(np.arange(N, dtype=np.int32))
    vals = jax.device_put(np.ones(N, np.int32))

    @jax.jit
    def scat(v, ix, k):
        out = jnp.zeros(N, np.int32)
        out = out.at[ix].set(v + k)
        return out[123] + out[N - 5]

    jax.device_get(scat(vals, idx, jnp.int32(0)))
    t0 = time.perf_counter()
    jax.device_get(scat(vals, idx, jnp.int32(1)))
    dt = time.perf_counter() - t0
    log(f"identity scatter: {dt*1e9/N:.2f} ns/element ({dt*1e3:.1f} ms for {N} elems)")

    # elementwise copy
    @jax.jit
    def cp(x, k):
        return jnp.sum(x * k)

    jax.device_get(cp(xp, jnp.float32(1)))
    t0 = time.perf_counter()
    jax.device_get(cp(xp, jnp.float32(2)))
    dt = time.perf_counter() - t0
    log(f"single-pass reduce: {MB/1024/dt:.1f} GB/s")


if __name__ == "__main__":
    main()
