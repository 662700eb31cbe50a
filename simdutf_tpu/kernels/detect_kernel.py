"""Fused one-pass encoding detection, Pallas tier.

The reference's SIMD backends run the UTF-8 checker, the UTF-16 surrogate
machine, and the UTF-32 range scan simultaneously per 64-byte block
(haswell/implementation.cpp:152-260). This kernel does the same per
(BR, 512)-byte VMEM tile in ONE read of the corpus:

  * UTF-8  — the event-minimum algebra (validate._utf8_events), sharing
    the b1..b4 halo shifts with the other two machines;
  * UTF-16LE — units from byte pairs; validity is forward-only local:
    bad[k] = is_high[k] XOR is_low[k+1] (high/low are disjoint classes,
    so every unpaired low at j>0 is caught at k=j-1), plus a low at
    global unit 0;
  * UTF-32LE — word range: > 0x10FFFF (unsigned, via the int32 sign bit)
    or a surrogate code point.

BOM sniffing stays on the host (encodings.check_bom), as in the XLA tier.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .validate import (
    BIG,
    BR,
    HALO,
    W,
    _interpret,
    _iotas,
    _shifts,
    _utf8_events,
)


def _detect_kernel(len_ref, x_ref, nxt_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[0, 0] = BIG  # min utf8 event position
        out_ref[0, 1] = 0    # bad utf16 pair count
        out_ref[0, 2] = 0    # bad utf32 word count
        out_ref[0, 3] = 0    # (spare)

    base = i * (BR * W)
    length = len_ref[0]
    b = x_ref[...].astype(jnp.int32)
    nxt = nxt_ref[...].astype(jnp.int32)
    shifts = _shifts(b, nxt)
    b1, b2, b3, _ = shifts

    pos8, _ = _utf8_events(b, nxt, base, shifts=shifts)

    row, lane = _iotas(b.shape)
    gpos = base + row * W + lane

    # UTF-16LE surrogate machine (2 bytes per unit, units never straddle
    # rows since W is even; the next unit's bytes ride the b2/b3 halos)
    even = (lane & 1) == 0
    u = b | (b1 << 8)
    un = b2 | (b3 << 8)
    hi = (u & 0xFC00) == 0xD800
    lo_next = (un & 0xFC00) == 0xDC00
    len16 = (length // 2) * 2
    in16 = even & (gpos < len16)
    bad16 = (hi ^ lo_next) & in16
    cnt16 = jnp.sum(bad16.astype(jnp.int32))
    # a low surrogate at global unit 0 has no predecessor pair check
    lo0 = ((u & 0xFC00) == 0xDC00).astype(jnp.int32)[0, 0]
    cnt16 = cnt16 + jnp.where((base == 0) & (length >= 2), lo0, 0)

    # UTF-32LE range scan (4 bytes per word, in-row by construction)
    w32 = b | (b1 << 8) | (b2 << 16) | (b3 << 24)
    neg = w32 < 0  # >= 2^31 unsigned
    bad_w = neg | (w32 > 0x10FFFF) | ((w32 >= 0xD800) & (w32 <= 0xDFFF))
    len32 = (length // 4) * 4
    in32 = ((lane & 3) == 0) & (gpos < len32)
    cnt32 = jnp.sum((bad_w & in32).astype(jnp.int32))

    @pl.when(pos8 < out_ref[0, 0])
    def _upd8():
        out_ref[0, 0] = pos8

    out_ref[0, 1] = out_ref[0, 1] + cnt16
    out_ref[0, 2] = out_ref[0, 2] + cnt32


@jax.jit
def detect_fused(x2d: jnp.ndarray, length):
    """x2d: (R+BR, W) uint8 zero-padded (the _pad2d layout). Returns
    (utf8_ok, utf16le_ok, utf32le_ok) int32 flags; the caller gates
    length % 2 / % 4 and BOM."""
    rows = x2d.shape[0] - BR
    grid = rows // BR
    out = pl.pallas_call(
        _detect_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BR, W), lambda i: (i, 0)),
            pl.BlockSpec((8, HALO), lambda i: ((i + 1) * BR // 8, 0)),
        ],
        out_specs=pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 4), jnp.int32),
        interpret=_interpret(),
    )(jnp.reshape(length, (1,)).astype(jnp.int32), x2d, x2d)
    ok8 = (out[0, 0] >= length).astype(jnp.int32)
    ok16 = (out[0, 1] == 0).astype(jnp.int32)
    ok32 = (out[0, 2] == 0).astype(jnp.int32)
    return ok8, ok16, ok32
