#!/usr/bin/env python
"""Attribute the forgiving-base64 decode pipeline's cost piece by piece
on-device (VERDICT r04 #1: the official row ran at 15% of its in-state
ceiling with no attribution evidence; probe_butterfly.py covers
utf8->utf16 only).

All rows are chained fori_loop timings (ITERS deep, loop-dependent args)
so the tunnel launch roundtrip is amortized — the probe_butterfly.py
methodology applied to the base64 pipeline (kernels/butterfly64 +
ops/base64_ops.decode_bulk_routed).

Rows:
  phaseB64  : classification/scan/butterfly/pack pallas kernel (stats only)
  compact   : compact_codes end to end (phase B64 + phase C16 compose)
  repack    : sextets_to_bytes alone on a pre-made dense-code buffer
  tailvals  : the 4 single-element gathers dense[nfull+i] (fast() tail)
  tailstart : dynamic_slice rescan window for tail_start (fast() tail)
  lastchar  : chars[n-1] classify (nvalid_at_bad epilogue)
  fast_all  : compact + repack + both tails (= fast() body inline)
  routed    : decode_bulk_routed (bench-identical body incl. cand_ok cond)
  scatter   : decode_bulk (the XLA scatter engine, A/B reference)

Appends results to perf_records/base64_probe.jsonl.
"""
from __future__ import annotations

import base64 as pyb64
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

    import simdutf_tpu.kernels.butterfly64 as kb64
    import simdutf_tpu.ops.base64_ops as ob
    from simdutf_tpu.ops import engine_probe as ep

    dev = str(jax.devices()[0])
    nbytes = MB * 1024 * 1024
    # MIME-wrapped corpus, bench.py's exact construction
    raw = np.random.default_rng(7).integers(
        0, 256, nbytes * 3 // 4, dtype=np.uint8).tobytes()
    raw64 = pyb64.b64encode(raw)
    mime = b"\r\n".join(raw64[i:i + 76] for i in range(0, len(raw64), 76))
    a64 = np.frombuffer(mime, np.uint8)
    import simdutf_tpu.ops.impl as oi

    p64, n64 = oi._pad(a64)
    n = p64.shape[0]
    if n % kb64.TILE:
        pad = (-n) % kb64.TILE
        p64 = np.pad(p64, (0, pad))
        n = p64.shape[0]
    nt = n // kb64.TILE
    xj = jax.device_put(p64)
    cut = int(n64) - int(n64) % 4
    log(f"device={dev} mime={len(a64)} bytes padded={n} nt={nt} iters={ITERS}")

    rows = {}

    def timed(name, f, *args):
        try:
            jf = jax.jit(f)
            jax.device_get(jf(*args, jnp.int32(cut)))
            best = float("inf")
            for t in range(2):
                t0 = time.perf_counter()
                jax.device_get(jf(*args, jnp.int32(cut - 4 * (t + 1))))
                best = min(best, time.perf_counter() - t0)
            per_iter = best / ITERS
            gbps = len(a64) / per_iter / 1e9
            rows[name] = {"ms_per_iter": round(per_iter * 1e3, 2),
                          "gbps_in": round(gbps, 2)}
            log(f"{name:10s} {per_iter*1e3:9.2f} ms/iter  {gbps:7.2f} GB/s-in")
        except Exception as e:
            rows[name] = {"error": str(e).split("\n")[0][:200]}
            log(f"{name:10s} FAILED: {str(e).splitlines()[0][:120]}")

    def chain(body):
        def f(x, nn):
            def b(i, acc):
                return acc + body(x, nn - 4 * (i & 3))
            return lax.fori_loop(0, ITERS, b, jnp.int32(0))
        return f

    # phase B64 alone (stats consumed; scratch dead-code-eliminated along
    # with phase C — the same caveat probe_butterfly documents for 'full')
    from simdutf_tpu.kernels.validate import u8_words

    timed("phaseB64", chain(
        lambda x, nn: kb64._phase_b64(
            u8_words(x), nn, nt, False, False)[1][0, 0]), xj)

    timed("compact", chain(
        lambda x, nn: kb64.compact_codes(x, nn, False, False)[0][0, 0]), xj)

    # dense code words made once on host; repack timed alone
    dense0 = jax.device_get(jax.jit(
        lambda x, nn: kb64.compact_codes(x, nn, False, False)[0])(
            xj, jnp.int32(cut)))
    dj = jax.device_put(dense0)

    from simdutf_tpu.kernels import base64_kernel as kbk

    timed("repack", chain(
        lambda d, nn: kbk.pack_words(d ^ (nn & 1))[0, 0]), dj)

    # the OLD repack route (u8 round-trip + (R,512) relayout +
    # pack_sextets), kept as the A/B reference for the fix
    timed("repack_old", chain(
        lambda d, nn: ob.sextets_to_bytes(jax.lax.bitcast_convert_type(
            (d ^ (nn & 1)).reshape(-1, 1), jnp.uint8).reshape(-1),
            4 * d.size)[0].astype(jnp.int32)), dj)

    nvalid0 = int(jax.device_get(jax.jit(
        lambda x, nn: kb64.compact_codes(x, nn, False, False)[1])(
            xj, jnp.int32(cut))))

    def tailvals_body(d, nn):
        nfull = ((nvalid0 - (nn & 63)) // 4) * 4
        tw = d[(nfull // 4) // 128, (nfull // 4) % 128]
        return sum(((tw >> (8 * i)) & 0xFF) for i in range(4))

    timed("tailvals", chain(tailvals_body), dj)

    # tail_start window rescan on the raw chars (fast() epilogue)
    off0 = jax.device_put(jax.device_get(jax.jit(
        lambda x, nn: kb64.compact_codes(x, nn, False, False)[5])(
            xj, jnp.int32(cut))))

    def tailstart_body(x, nn):
        from simdutf_tpu.ops.common import BIG, positions
        nfull = ((nvalid0 - (nn & 63)) // 4) * 4
        t_star = jnp.clip(jnp.sum(off0 <= nfull) - 1, 0, nt - 1)
        win = lax.dynamic_slice(
            x, (t_star * kb64.TILE,), (kb64.TILE,)).astype(jnp.int32)
        codes_w = ob.classify_chars(win, False, False)
        wpos = t_star * kb64.TILE + positions(kb64.TILE)
        valid_w = (codes_w <= 63) & (wpos < nn)
        rank_w = jnp.cumsum(valid_w.astype(jnp.int32)) - valid_w
        hit = valid_w & (rank_w == (nfull - off0[t_star]))
        return jnp.min(jnp.where(hit, wpos, BIG))

    timed("tailstart", chain(tailstart_body), xj)

    timed("lastchar", chain(
        lambda x, nn: ob.classify_chars(
            x[n - 1].astype(jnp.int32).reshape(1), False, False)[0] + nn * 0),
        xj)

    ep._CHOICE64 = "butterfly"

    def routed_body(x, nn):
        fb, nv, nvb, packed, tv, ts = ob.decode_bulk_routed(
            x, nn, False, False)
        return nv + fb % 7 + packed[0].astype(jnp.int32)

    timed("routed", chain(routed_body), xj)

    def scatter_body(x, nn):
        fb, nv, nvb, packed, tv, ts = ob.decode_bulk(x, nn, False, False)
        return nv + fb % 7 + packed[0].astype(jnp.int32)

    timed("scatter", chain(scatter_body), xj)

    rec = {"ts": time.time(), "device": dev, "mb": MB, "nt": nt,
           "iters": ITERS, "rows": rows}
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        with open(os.path.join(here, "perf_records",
                               "base64_probe.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
    except OSError:
        pass
    print(json.dumps(rec))


if __name__ == "__main__":
    sys.exit(main())
