#!/usr/bin/env python
"""On-device experiments for the utf8->utf16 transcode engine.

Round-1's XLA path measured ~208 GB/s-in (~69% rw-SOL) on the mixed
corpus. These variants attack the two non-elementwise HLOs (cumsum,
scatter) one at a time so the winning combination can be promoted into
ops/utf8.py:

  base       : current ops/utf8.to_utf16 (validating, 1 scatter)
  valid      : ops/utf8.to_utf16_valid (no error lattice) — lattice share
  blkscan    : blocked cumsum (row-wise cumsum + tiny row-offset scan)
  uniq       : scatter with unique_indices=True hint
  u16        : scatter u16 values instead of int32
  widen      : pure ASCII widen (b.astype(u16)) — the ASCII fast path SOL
  gather_rev : output-centric gather via searchsorted on row offsets

Usage: python tools/probe_transcode.py [variant ...] [--size MB]
"""

from __future__ import annotations

import functools
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax import lax

import simdutf_tpu.ops.impl as oi
import simdutf_tpu.ops.utf8 as o8
from simdutf_tpu.ops.common import positions, shift_right

ITERS = 10
TRIALS = 5
MB = 1024 * 1024


def mixed_corpus(nbytes: int) -> bytes:
    block = (
        "The quick brown fox jumps over the lazy dog. "
        "Höfn í Hornafirði er bær á Suðausturlandi. "
        "東京は日本の首都であり、世界最大の都市圏です。"
        "مرحبا بالعالم، هذا نص تجريبي باللغة العربية. "
        "Привет, мир! Это тестовый текст. "
        "🙂🚀🌍💡🎉 emoji and 𝄞 astral chars. "
    )
    data = (block * (nbytes // len(block.encode()) + 1)).encode()
    return data[:nbytes]


def _time(f, x, n):
    jax.device_get(f(x, jnp.int32(n)))
    ts = []
    for t in range(TRIALS):
        t0 = time.perf_counter()
        jax.device_get(f(x, jnp.int32(n - 8 * (t + 1))))
        ts.append((time.perf_counter() - t0) / ITERS)
    return statistics.median(ts)


def _chain(body):
    @jax.jit
    def f(x, n0):
        def it(i, acc):
            out, out_len = body(x, n0 - (i & 7))
            probe = out[(acc % 1000).astype(jnp.int32)].astype(jnp.int32)
            return acc + out_len + probe
        return lax.fori_loop(0, ITERS, it, jnp.int32(0))

    return f


# --- emission variants -------------------------------------------------------


def _emit_variant(b, length, *, blocked, unique, u16, gather_rev=False):
    n = b.shape[0]
    idx = positions(n)
    cls = o8.classify(b, length)
    lead = cls["lead"] & (idx < length)
    cp, lead4 = cls["cp"], cls["lead4"]
    cpx = cp - 0x10000
    unit0 = jnp.where(cp > 0xFFFF, 0xD800 + (cpx >> 10), cp)
    unit1 = 0xDC00 + (cpx & 0x3FF)
    after_lead4 = shift_right((lead & lead4).astype(jnp.int32), 1).astype(bool)
    keep = lead | after_lead4
    val = jnp.where(after_lead4, shift_right(unit1, 1), unit0)
    k32 = keep.astype(jnp.int32)

    if blocked:
        B = 4096
        k2 = k32.reshape(n // B, B)
        row_inc = jnp.cumsum(k2, axis=1)
        row_tot = row_inc[:, B - 1]
        row_off = jnp.cumsum(row_tot) - row_tot
        off_inc = (row_inc + row_off[:, None]).reshape(n)
    else:
        off_inc = jnp.cumsum(k32)
    off = off_inc - k32
    total = off_inc[n - 1]

    if gather_rev:
        # output-centric: out[j] = val[src[j]]; src via j + dropped-before,
        # iterated to a fixed point is wrong in general — use searchsorted
        src = jnp.searchsorted(off_inc, jnp.arange(1, n + 1, dtype=jnp.int32))
        out = jnp.where(jnp.arange(n) < total, val[jnp.minimum(src, n - 1)], 0)
        return out.astype(jnp.uint16), total

    if u16:
        out = jnp.zeros(n, dtype=jnp.uint16)
        vv = val.astype(jnp.uint16)
    else:
        out = jnp.zeros(n, dtype=jnp.int32)
        vv = val
    if unique:
        # distinct OOB target per dropped element: duplicate drop indices
        # under unique_indices=True are UB (same hazard class that crashed
        # the worker on gather_rev); this also matches ops.common's engine
        tgt = jnp.where(keep, off, n + idx)
        out = out.at[tgt].set(vv, mode="drop", unique_indices=True)
    else:
        tgt = jnp.where(keep, off, n)
        out = out.at[tgt].set(vv, mode="drop")
    return out.astype(jnp.uint16), total


def make_variant(**kw):
    def body(x, length):
        return _emit_variant(x, length, **kw)

    return body


def widen(x, length):
    out = x.astype(jnp.uint16)
    return out, length


VARIANTS = {
    "base": lambda x, n: o8.to_utf16(x, n, False)[2:],
    "valid": lambda x, n: o8.to_utf16_valid(x, n, False),
    "blkscan": make_variant(blocked=True, unique=False, u16=False),
    "uniq": make_variant(blocked=False, unique=True, u16=False),
    "blk_uniq": make_variant(blocked=True, unique=True, u16=False),
    "blk_uniq16": make_variant(blocked=True, unique=True, u16=True),
    "u16": make_variant(blocked=False, unique=False, u16=True),
    "widen": widen,
    # NOTE: gather_rev (searchsorted over the full buffer) crashed the TPU
    # worker on 2026-08-17 ("kernel fault"); run it explicitly if ever.
    "_gather_rev": make_variant(blocked=True, unique=False, u16=False,
                                gather_rev=True),
}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    size = 64
    for a in sys.argv[1:]:
        if a.startswith("--size"):
            size = int(a.split("=")[1])
    names = args or [k for k in VARIANTS if not k.startswith("_")]
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    data = mixed_corpus(size * MB - 4096)
    arr = np.frombuffer(data, np.uint8)
    p, n = oi._pad(arr)
    xj = jax.device_put(p)
    xj.block_until_ready()
    for name in names:
        try:
            f = _chain(VARIANTS[name])
            dt = _time(f, xj, int(n))
            print(f"{name:11s} {len(data)/dt/1e9:7.1f} GB/s-in  {dt*1e3:8.3f} ms/iter")
        except Exception as e:
            print(f"{name:11s} ERROR {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
