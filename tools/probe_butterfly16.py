#!/usr/bin/env python
"""Attribute the utf16->utf8 butterfly transcode's cost piece by piece
on-device (VERDICT r04 #5: the row ran at 66% of its in-state ceiling
with no phase evidence; probe_butterfly.py covers utf8->utf16 only).

Chained fori_loop timings (ITERS deep, loop-dependent lengths), the
probe_butterfly.py methodology applied to kernels/butterfly16.

Rows:
  prep     : u16 -> (R,128) i32 widen (XLA glue before phase B16)
  phaseB16 : prep + classification/scan/butterfly/pack pallas kernel
  phaseC16 : composition kernel alone (scratch input)
  full     : to_utf8_compose consuming only the total (C dead-coded)
  fullc    : + phase C (out[0] read)
  flagship : the bench-identical wrapper (o16.to_utf8, butterfly pinned)
  scatter  : the XLA scatter engine (A/B reference)

Appends results to perf_records/butterfly16_probe.jsonl.
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

    import simdutf_tpu.kernels.butterfly16 as kb16
    import simdutf_tpu.ops.utf16 as o16
    from simdutf_tpu.ops import engine_probe as ep

    dev = str(jax.devices()[0])
    nbytes = MB * 1024 * 1024
    block = (
        "The quick brown fox jumps over the lazy dog. "
        "東京は日本の首都であり、世界最大の都市圏です。"
        "Привет, мир! Это тестовый текст. "
        "🙂🚀🌍💡🎉 emoji and 𝄞 astral chars. "
    )
    n_units = nbytes // 2
    units = np.frombuffer(
        (block * (n_units // len(block) + 1)).encode("utf-16-le"),
        np.uint16)[:n_units].copy()
    # snap the tail off a dangling high surrogate
    if 0xD800 <= int(units[-1]) <= 0xDBFF:
        units = units[:-1]
    nt = units.shape[0] // kb16.TILE_U
    n_al = nt * kb16.TILE_U
    buf = np.zeros(n_al, np.uint16)
    cut = n_al
    while 0xD800 <= int(units[cut - 1]) <= 0xDBFF:
        cut -= 1
    buf[:cut] = units[:cut]
    xj = jax.device_put(buf)
    log(f"device={dev} units={cut} nt={nt} iters={ITERS}")

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
            gbps = 2 * cut / per_iter / 1e9
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
        return x.astype(jnp.int32).reshape(-1, kb16.PW)

    timed("prep", chain(lambda x, n: prep(x)[0, 0] + n * 0), xj)
    timed("phaseB16", chain(
        lambda x, n: kb16._phase_b16(prep(x), n, nt)[1][0, 0]), xj)

    scratch, stats = jax.jit(
        lambda x, n: kb16._phase_b16(prep(x), n, nt))(xj, jnp.int32(cut))
    counts = stats[::8, 0]
    off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)])
    bases = jnp.arange(nt, dtype=jnp.int32) * kb16.CAPB
    t0v = (jnp.sum(off[None, :nt] <= bases[:, None], axis=1)
           .astype(jnp.int32) - 1)
    scratch, t0v, off = (jax.device_put(jax.device_get(a))
                         for a in (scratch, t0v, off))

    def phase_c_only(s, t0a, offa, n):
        def b(i, acc):
            out = kb16._phase_c16(s, t0a, offa + (i & 1), nt, n - (i & 3))
            return acc + out[0, 0] + n * 0
        return lax.fori_loop(0, ITERS, b, jnp.int32(0))

    timed("phaseC16", phase_c_only, scratch, t0v, off)

    timed("full", chain(
        lambda x, n: kb16.to_utf8_compose(x, n)[1]), xj)
    timed("fullc", chain(
        lambda x, n: kb16.to_utf8_compose(x, n)[0][0].astype(jnp.int32)), xj)

    ep._CHOICE16 = "butterfly"

    def flagship_body(x, n):
        code, pos, out, out_len = o16.to_utf8(x, n, False)
        return out_len + code + pos + out[0].astype(jnp.int32)

    timed("flagship", chain(flagship_body), xj)
    ep._CHOICE16 = "scatter"
    timed("scatter", chain(flagship_body), xj)
    ep._CHOICE16 = "butterfly"

    rec = {"ts": time.time(), "device": dev, "mb": MB, "nt": nt,
           "iters": ITERS, "rows": rows}
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        with open(os.path.join(here, "perf_records",
                               "butterfly16_probe.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
    except OSError:
        pass
    print(json.dumps(rec))


if __name__ == "__main__":
    sys.exit(main())
