#!/usr/bin/env python
"""Attribute the butterfly transcode's cost piece by piece on-device.

All rows are chained fori_loop timings (ITERS deep, loop-dependent args)
so the tunnel's ~28 ms launch roundtrip is amortized — at small corpora a
single launch IS the measurement floor, which poisoned the round-3
unchained numbers.

Rows:
  prep     : u8 -> (R,128) i32 bitcast + halo pad (XLA glue before phase B)
  phaseB   : prep + classification/scan/butterfly/pack pallas kernel
  phaseB0  : phase B kernel on a pre-packed i32 input (kernel proper)
  phaseC   : composition kernel (5-candidate dynamic rolls), scratch input
  outcast  : out32 -> u16 bitcast (the final XLA pass over 2N out bytes)
  full     : to_utf16_compose end to end
  scatter  : the XLA classify->cumsum->scatter engine (A/B reference)

Appends results to perf_records/butterfly_probe.jsonl.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(*a):
    print(*a, file=sys.stderr, flush=True)


ITERS = int(os.environ.get("PROBE_ITERS", "12"))
MB = int(os.environ.get("PROBE_MB", "64"))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    import simdutf_tpu.kernels.butterfly as kb
    import simdutf_tpu.ops.utf8 as o8

    dev = str(jax.devices()[0])
    log(f"device={dev} corpus={MB} MiB iters={ITERS}")
    nbytes = MB * 1024 * 1024
    block = (
        "The quick brown fox jumps over the lazy dog. "
        "東京は日本の首都であり、世界最大の都市圏です。"
        "Привет, мир! Это тестовый текст. "
        "🙂🚀🌍💡🎉 emoji and 𝄞 astral chars. "
    ).encode()
    data = (block * (nbytes // len(block) + 1))[:nbytes]
    cut = nbytes
    while data[cut - 1] & 0xC0 == 0x80:
        cut -= 1
    if data[cut - 1] >= 0xC0:
        cut -= 1
    arr = np.zeros(nbytes, np.uint8)
    arr[:cut] = np.frombuffer(data[:cut], np.uint8)
    xj = jax.device_put(arr)
    nt = nbytes // kb.TILE

    rows = {}

    def timed(name, f, *args):
        try:
            jf = jax.jit(f)
            jax.device_get(jf(*args, jnp.int32(cut)))
            best = float("inf")
            for t in range(2):
                t0 = time.perf_counter()
                jax.device_get(jf(*args, jnp.int32(cut - 24 * (t + 1))))
                best = min(best, time.perf_counter() - t0)
            per_iter = best / ITERS
            gbps = nbytes / per_iter / 1e9
            rows[name] = {"ms_per_iter": round(per_iter * 1e3, 2),
                          "gbps_in": round(gbps, 2)}
            log(f"{name:10s} {per_iter*1e3:9.2f} ms/iter  {gbps:7.2f} GB/s-in")
        except Exception as e:
            rows[name] = {"error": str(e).split("\n")[0][:200]}
            log(f"{name:10s} FAILED: {str(e).splitlines()[0][:120]}")

    def chain(body):
        def f(x, n):
            def b(i, acc):
                return acc + body(x, n - 24 * (i & 3))
            return lax.fori_loop(0, ITERS, b, jnp.int32(0))
        return f

    def prep(x):
        x32 = lax.bitcast_convert_type(
            x.reshape(-1, 4), jnp.int32).reshape(-1, kb.PW)
        return jnp.pad(x32, ((kb.PR, kb.PR), (0, 0)))

    timed("prep", chain(
        lambda x, n: prep(x)[0, 0] + prep(x)[-1, -1] + n * 0), xj)
    timed("phaseB", chain(
        lambda x, n: kb._phase_b(prep(x), n, nt, False)[1][0, 0]), xj)

    # phase B kernel on a pre-packed input (kernel cost proper)
    xpk = jax.device_put(np.pad(
        arr.view(np.int32).reshape(-1, kb.PW),
        ((kb.PR, kb.PR), (0, 0))))
    timed("phaseB0", chain(
        lambda x, n: kb._phase_b(x, n, nt, False)[1][0, 0]), xpk)

    # scratch/offsets computed once; phase C timed alone
    scratch, stats = jax.jit(
        lambda x, n: kb._phase_b(prep(x), n, nt, False))(xj, jnp.int32(cut))
    counts = stats[::8, 0]
    off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)])
    bases = jnp.arange(nt, dtype=jnp.int32) * kb.UNITS
    t0v = (jnp.sum(off[None, :nt] <= bases[:, None], axis=1)
           .astype(jnp.int32) - 1)
    scratch, t0v, off = (jax.device_put(jax.device_get(a))
                         for a in (scratch, t0v, off))

    def phase_c_only(s, t0a, offa, n):
        def b(i, acc):
            thi = kb._span_hi(offa + (i & 1), nt, kb.UNITS)
            out = kb._phase_c(s, t0a, thi, offa + (i & 1), nt, n - (i & 3))
            return acc + out[0, 0] + n * 0
        return lax.fori_loop(0, ITERS, b, jnp.int32(0))

    timed("phaseC", phase_c_only, scratch, t0v, off)

    out32 = jax.device_put(jax.device_get(
        jax.jit(lambda s: s[: nt * kb.PR])(scratch)))

    def outcast_only(o32, n):
        def b(i, acc):
            u16 = lax.bitcast_convert_type(
                (o32 ^ i).reshape(-1), jnp.uint16).reshape(-1)
            return acc + u16[0].astype(jnp.int32) + n * 0
        return lax.fori_loop(0, ITERS, b, jnp.int32(0))

    timed("outcast", outcast_only, out32)

    timed("full", chain(
        lambda x, n: kb.to_utf16_compose(x, n, False)[1]), xj)
    # 'full' consumes only the unit count, so XLA dead-code-eliminates
    # phase C and the out-cast (the round-3 11.7 ms "full pipeline" was
    # really phase B + glue). The rows below force the real output:
    #   fullc    : + phase C (out[0] read; the out-cast still folds away)
    #   flagship : the bench-identical wrapper (o8.to_utf16, engine
    #              pinned to butterfly) with the same out-probe bench.py
    #              uses — everything the official row pays, including the
    #              u16 bitcast pass and the census/routing wrapper
    timed("fullc", chain(
        lambda x, n: kb.to_utf16_compose(x, n, False)[0][0]
        .astype(jnp.int32)), xj)

    from simdutf_tpu.ops import engine_probe as ep

    ep._CHOICE = "butterfly"

    def flagship_body(x, n):
        code, pos, out, out_len = o8.to_utf16(x, n, False)
        # static content probe: a DYNAMIC single-element index into the
        # bitcast-composed output forces an unfused gather costing ~30
        # ms/iter at 64 MiB in the scatter-degraded state (bisected
        # 2026-08-20: compose_out0 14.5 ms vs compose_outdyn 43.9 ms)
        return out_len + code + pos + out[0].astype(jnp.int32)

    timed("flagship", chain(flagship_body), xj)
    timed("scatter", chain(
        lambda x, n: o8._to_utf16_general(x, n, False)[3]), xj)

    rec = {"ts": time.time(), "device": dev, "mb": MB, "nt": nt,
           "iters": ITERS, "rows": rows}
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        with open(os.path.join(here, "perf_records",
                               "butterfly_probe.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
    except OSError:
        pass
    print(json.dumps(rec))


if __name__ == "__main__":
    sys.exit(main())
