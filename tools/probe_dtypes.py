#!/usr/bin/env python
"""Map which op classes are fast in the CURRENT device state.

The tunneled dev chip has a recurrent state where a pure f32 chained
reduce runs at ~roofline (~685 GB/s) while uint8 XLA graphs floor at
~9 GB/s and Pallas int kernels at ~20-50 GB/s (bench 2026-08-19). This
battery times ONE shape of chained, non-hoistable loop across dtypes,
op mixes, store patterns and pallas-vs-XLA so the hot paths can be
reformulated into whatever subset the current backend executes at speed.

Every row: chained fori_loop (body consumes previous scalar), 128 MiB
input traversed ITERS times, GB/s = bytes-touched / time. Results are
appended to perf_records/dtype_probe.jsonl with a timestamp.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


MB = 128
ITERS = 16


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    dev = str(jax.devices()[0])
    log(f"device={dev}")
    nbytes = MB * 1024 * 1024

    xf = jax.device_put(np.ones(nbytes // 4, np.float32))
    xi = jax.device_put(np.arange(nbytes // 4, dtype=np.int32))
    xb = jax.device_put(np.full(nbytes, 65, np.uint8))
    xh = jax.device_put(np.full(nbytes // 2, 65, np.uint16))

    rows = {}

    def _run_once(jf, x, salt):
        t0 = time.perf_counter()
        jax.device_get(jf(x, jnp.int32(salt)))
        return time.perf_counter() - t0

    # reference kernel re-timed adjacent to every row: the device state
    # fluctuates minute-to-minute, so only same-instant ratios mean much
    def _ref_f(x, k):
        def b(i, acc):
            return jnp.sum(jnp.abs(x - acc)) * 1e-9 + i + k
        return lax.fori_loop(0, ITERS, b, jnp.float32(0))

    _ref_jit = jax.jit(_ref_f)

    def timed(name, f, x, extra_bytes=0):
        try:
            _timed(name, f, x, extra_bytes)
        except Exception as e:
            rows[name] = {"error": str(e).split("\n")[0][:200]}
            log(f"{name:34s} FAILED: {str(e).splitlines()[0][:120]}")

    def _timed(name, f, x, extra_bytes=0):
        jf = jax.jit(f)
        jax.device_get(jf(x, jnp.int32(1)))  # compile+warm
        jax.device_get(_ref_jit(xf, jnp.int32(1)))
        best, ref_best = float("inf"), float("inf")
        for t in range(2):
            ref_best = min(ref_best, _run_once(_ref_jit, xf, t + 2))
            best = min(best, _run_once(jf, x, t + 2))
        gbps = ITERS * (nbytes + extra_bytes) / best / 1e9
        ref_gbps = ITERS * nbytes / ref_best / 1e9
        rows[name] = {"gbps": round(gbps, 1), "ref_gbps": round(ref_gbps, 1),
                      "ratio": round(gbps / ref_gbps, 3)}
        log(f"{name:34s} {gbps:8.1f} GB/s  (ref {ref_gbps:7.1f}, "
            f"ratio {gbps/ref_gbps:6.2f})")

    def chained_reduce(body):
        def f(x, k):
            def b(i, acc):
                return body(x, acc + i + k)
            return lax.fori_loop(0, ITERS, b, jnp.float32(0))
        return f

    def chained_reduce_i(body):
        def f(x, k):
            def b(i, acc):
                return body(x, acc + i + k)
            return lax.fori_loop(0, ITERS, b, jnp.int32(0))
        return f

    # --- reduce-only rows (read N bytes/iter) ---
    timed("f32 sum|x-acc|", chained_reduce(
        lambda x, a: jnp.sum(jnp.abs(x - a)) * 1e-9), xf)
    timed("i32 sum(x^acc)", chained_reduce_i(
        lambda x, a: jnp.sum(x ^ a, dtype=jnp.int32) & 0xFFFF), xi)
    timed("i32 sum((x>>3)&7 ^ acc)", chained_reduce_i(
        lambda x, a: jnp.sum(((x >> 3) & 7) ^ a, dtype=jnp.int32) & 0xFFFF),
        xi)
    timed("u8 sum(x>=0x80)", chained_reduce_i(
        lambda x, a: jnp.sum(((x + a.astype(jnp.uint8)) >= 0x80)
                             .astype(jnp.int32)) & 0xFFFF), xb)
    timed("u8 max(x^acc)", chained_reduce_i(
        lambda x, a: jnp.max(x ^ a.astype(jnp.uint8)).astype(jnp.int32)), xb)
    timed("u16 sum(x&mask)", chained_reduce_i(
        lambda x, a: jnp.sum((x & (0x80 | a.astype(jnp.uint16)))
                             .astype(jnp.int32)) & 0xFFFF), xh)
    _swarmask = jnp.int32(np.int32(np.uint32(0x40404040)))
    timed("u8 via i32 bitcast SWAR", chained_reduce_i(
        lambda x, a: jnp.sum(
            (x ^ a) & _swarmask, dtype=jnp.int32) & 0xFFFF), xi)

    # --- compute-scaling row: 12 dependent i32 ops per element ---
    def heavy(x, a):
        y = x ^ a
        for s in (1, 2, 3):
            y = (y >> s) & 0x7F7F7F7F
            y = y + (y << s)
            y = y ^ (y >> 7)
            y = y & 0x0F0F0F0F
        return jnp.sum(y, dtype=jnp.int32) & 0xFFFF
    timed("i32 12-op chain + sum", chained_reduce_i(heavy), xi)

    # --- store rows (read N + write N bytes/iter) ---
    def chained_store(body, out_dtype):
        def f(x, k):
            def b(i, carry):
                y = body(x, i + k)
                return (jnp.sum(y[:8].astype(jnp.int32)) & 0xFF) + i
            return lax.fori_loop(0, ITERS, b, jnp.int32(0))
        return f

    timed("f32 store x+acc", chained_store(
        lambda x, a: x + a.astype(jnp.float32), jnp.float32), xf, nbytes)
    timed("i32 store x^acc", chained_store(
        lambda x, a: x ^ a, jnp.int32), xi, nbytes)
    timed("u8 store x^acc", chained_store(
        lambda x, a: x ^ a.astype(jnp.uint8), jnp.uint8), xb, nbytes)
    timed("u8->u16 widen store", chained_store(
        lambda x, a: (x ^ a.astype(jnp.uint8)).astype(jnp.uint16),
        jnp.uint16), xb, 2 * nbytes)
    timed("i32 cumsum store", chained_store(
        lambda x, a: jnp.cumsum(x ^ a, dtype=jnp.int32), jnp.int32),
        xi, nbytes)
    timed("u8 bitcast->i32 ops->u16 store", chained_store(
        lambda x, a: (jax.lax.bitcast_convert_type(
            x.reshape(-1, 4), jnp.int32) ^ a).astype(jnp.uint16),
        jnp.uint16), xb, 2 * nbytes)

    # --- pallas rows ---
    try:
        from jax.experimental import pallas as pl

        def pk_copy(x_ref, o_ref, k_ref):
            o_ref[...] = x_ref[...] ^ k_ref[0]

        def pallas_i32(x, k):
            def kern(k_ref, x_ref, o_ref):
                o_ref[...] = x_ref[...] ^ k_ref[0]
            from jax.experimental.pallas import tpu as pltpu
            grid = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(x.shape[0] // 512,),
                in_specs=[pl.BlockSpec((512, 128), lambda t, kr: (t, 0))],
                out_specs=pl.BlockSpec((512, 128), lambda t, kr: (t, 0)),
            )
            return pl.pallas_call(
                kern, grid_spec=grid,
                out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
            )(jnp.asarray(k, jnp.int32).reshape(1), x)

        x2 = xi.reshape(-1, 128)

        def f(x, k):
            def b(i, acc):
                y = pallas_i32(x, i + k)
                return (jnp.sum(y[:1, :8]) & 0xFF) + i
            return lax.fori_loop(0, ITERS, b, jnp.int32(0))

        jf = jax.jit(f)
        jax.device_get(jf(x2, jnp.int32(1)))
        best = float("inf")
        for t in range(2):
            t0 = time.perf_counter()
            jax.device_get(jf(x2, jnp.int32(t + 2)))
            best = min(best, time.perf_counter() - t0)
        gbps = ITERS * 2 * nbytes / best / 1e9
        rows["pallas i32 xor copy"] = round(gbps, 1)
        log(f"{'pallas i32 xor copy':34s} {gbps:8.1f} GB/s  ({best*1e3:7.1f} ms)")
    except Exception as e:
        log(f"pallas row skipped: {e}")

    rec = {"ts": time.time(), "device": dev, "mb": MB, "iters": ITERS,
           "rows": rows}
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "perf_records", "dtype_probe.jsonl")
    try:
        with open(path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        log(f"appended to {path}")
    except OSError as e:
        log(f"record not written: {e}")
    print(json.dumps(rec))


if __name__ == "__main__":
    sys.exit(main())
