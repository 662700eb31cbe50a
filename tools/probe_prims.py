#!/usr/bin/env python
"""Probe the per-element cost of the primitives a variable-rate transcode
engine can be built from, in the CURRENT device state. Chained fori_loop
timing (non-hoistable: loop body consumes the previous result)."""
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(f, *args, iters=8, label=""):
    import jax

    jf = jax.jit(f)
    jax.device_get(jf(*args))  # compile
    t0 = time.perf_counter()
    jax.device_get(jf(*args))
    dt = (time.perf_counter() - t0)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    N = 1 << 24  # 16M elements
    ITERS = 8
    rng = np.random.default_rng(0)
    vals = jax.device_put(rng.integers(0, 1000, N).astype(np.int32))
    # monotone gather indices (the transcode inverse-map shape)
    gidx = jax.device_put(np.sort(rng.integers(0, N, N)).astype(np.int32))

    def chained(body):
        def f(x, ix, k):
            def b(i, acc):
                return body(x, ix, acc + i + k)
            return lax.fori_loop(0, ITERS, b, jnp.int32(0))
        return f

    tests = {}

    # 1. monotone gather: out[j] = x[ix[j]]
    tests["gather(monotone)"] = chained(
        lambda x, ix, s: jnp.sum(x[jnp.minimum(ix + (s & 1), N - 1)] & 1)
    )
    # 2. cumsum
    tests["cumsum"] = chained(lambda x, ix, s: jnp.cumsum(x + (s & 1))[N - 1])
    # 3. scatter (known degraded; for the ratio)
    def scat(x, ix, s):
        out = jnp.zeros(N, jnp.int32).at[jnp.minimum(ix + (s & 1), N - 1)].set(x)
        return out[12345] + out[N - 7]
    tests["scatter"] = chained(scat)
    # 4. take_along / reverse-gather of u16
    v16 = jax.device_put(rng.integers(0, 60000, N).astype(np.uint16))
    tests["gather(u16 vals)"] = chained(
        lambda x, ix, s: jnp.sum((v16[jnp.minimum(ix + (s & 1), N - 1)]).astype(jnp.int32) & 1)
    )
    # 5. searchsorted over 2048 tile offsets for N queries
    offs = jax.device_put(np.sort(rng.integers(0, N, 2048)).astype(np.int32))
    tests["searchsorted(2048)"] = chained(
        lambda x, ix, s: jnp.sum(
            jnp.searchsorted(offs, jnp.arange(N, dtype=jnp.int32) + (s & 1)) & 1
        )
    )
    # 6. elementwise baseline (one pass read)
    tests["elementwise-reduce"] = chained(lambda x, ix, s: jnp.sum(x + (s & 1)))

    for name, f in tests.items():
        try:
            jf = jax.jit(f)
            jax.device_get(jf(vals, gidx, jnp.int32(0)))
            t0 = time.perf_counter()
            jax.device_get(jf(vals, gidx, jnp.int32(1)))
            dt = (time.perf_counter() - t0) / ITERS
            log(f"{name:24s}: {dt*1e9/N:7.3f} ns/elem  ({dt*1e3:8.2f} ms/pass)")
        except Exception as e:
            log(f"{name:24s}: FAILED {e}")


if __name__ == "__main__":
    main()
