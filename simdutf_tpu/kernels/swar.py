"""SWAR UTF-8 validity check: 4 bytes per int32 lane, pure bitwise algebra.

The hot path answers only "is there any error?" — the reference's own
structure (generic/utf8_validation/utf8_validator.h:10-79: vector pass,
exact rescan on failure). Exact (pos, code) on the rare error path comes
from the event kernel (kernels/validate.py).

Equivalence to the scalar machine's error set (any-error semantics):
  * structural:  must-be-continuation XOR is-continuation, where
    must[i] = lead2|3|4 at i-1, lead3|4 at i-2, lead4 at i-3 — this is
    Keiser-Lemire's check_multibyte_lengths reformulated
    (utf8_lookup4_algorithm.h:100-108), and catches TOO_SHORT/TOO_LONG
    (zero padding past the logical end supplies EOF truncation).
  * ranges: overlong2 = byte in {C0,C1}; overlong3 = E0 with next < A0;
    surrogate = ED with next >= A0; overlong4 = F0 with next < 90;
    too-large = F4 with next >= 90, or byte in F5..F7; header = >= F8.
    (When 'next' is not a continuation the structural check fires anyway,
    so approximating 'next' ranges by its high bits is sound.)

Per-byte predicates become per-byte 0x80-bit masks via the classic
zero-byte trick: haszero(v) = (v - 0x01010101) & ~v & 0x80808080.
Byte-granular mask shifts are int32 shifts + one lane roll (with column
-block halos from the neighboring tiles for the boundary lanes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .validate import BIG, BR, _interpret, _iotas, vany

W32 = 128  # int32 lanes per row (512 bytes)
HALO = 128

_ONES = 0x01010101
_HIGH = 0x80808080 - 0x100000000  # as signed int32


def _i32(x: int) -> int:
    """Python int -> value representable as signed int32 (same bits)."""
    x &= 0xFFFFFFFF
    return x - 0x100000000 if x >= 0x80000000 else x


def _hz(v):
    """0x80 bit per zero byte of v (bytes of v must be < 0x100... here all
    inputs are byte-masked)."""
    return (v - _ONES) & ~v & _HIGH


def _eq(b, mask, val):
    return _hz((b & _i32(mask * _ONES)) ^ _i32(val * _ONES))


def _swar_kernel(salt_ref, x_ref, nxt_ref, prv_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[0, 0] = BIG
        out_ref[0, 1] = salt_ref[0]

    b = x_ref[...]
    _, lane = _iotas(b.shape)

    # ASCII fast path (the reference's per-block is_ascii short-circuit,
    # generic/utf8_validation/utf8_validator.h): a pure-ASCII tile whose
    # predecessor's last word holds no multi-byte lead can produce no
    # events — skip the whole algebra.
    any_nonascii = vany((b & _HIGH) != 0)
    prev_last = prv_ref[7:8, HALO - 1 :]
    prev_lead = vany(_eq(prev_last, 0xC0, 0xC0) != 0)

    @pl.when(any_nonascii | prev_lead)
    def _full_check():
        _swar_body(x_ref, nxt_ref, prv_ref, out_ref, i, lane)


def _swar_body(x_ref, nxt_ref, prv_ref, out_ref, i, lane):
    b = x_ref[...]

    cont = _eq(b, 0xC0, 0x80)

    lu = jnp.uint32  # logical right shifts need unsigned

    def lsr(m, k):
        return (m.astype(lu) >> k).astype(jnp.int32)

    # --- previous-byte arrays: bm_k[byte j] = byte j-k (raw bytes shifted,
    # boundary lane patched with the neighboring tile's raw word — masks
    # must be computed AFTER alignment, never spliced across tiles)
    prev_word = jnp.where(
        lane > 0,
        pltpu.roll(b, shift=1, axis=1),  # b[r, l-1]
        jnp.concatenate(
            [prv_ref[7:8, HALO - 1 :], b[:-1, W32 - 1 :]], axis=0
        ),
    )
    bm1 = (b << 8) | lsr(prev_word, 24)
    bm2 = (b << 16) | lsr(prev_word, 16)
    bm3 = (b << 24) | lsr(prev_word, 8)

    def lead234(x):
        return _eq(x, 0xE0, 0xC0) | _eq(x, 0xF0, 0xE0) | _eq(x, 0xF8, 0xF0)

    must = (
        lead234(bm1)
        | (_eq(bm2, 0xF0, 0xE0) | _eq(bm2, 0xF8, 0xF0))
        | _eq(bm3, 0xF8, 0xF0)
    )
    err = must ^ cont

    # --- next-byte array: b1[byte k] = byte k+1, then range masks on it
    nxt_word = jnp.where(
        lane < W32 - 1,
        pltpu.roll(b, shift=W32 - 1, axis=1),  # b[r, l+1]
        jnp.concatenate([b[1:, :1], nxt_ref[0:1, :1]], axis=0),
    )
    b1 = lsr(b, 8) | (nxt_word << 24)
    a_80_9f = _eq(b1, 0xE0, 0x80)  # next byte in 80..9F
    a_a0_bf = _eq(b1, 0xE0, 0xA0)
    a_80_8f = _eq(b1, 0xF0, 0x80)

    err |= _eq(b, 0xFE, 0xC0)  # overlong 2-byte (C0/C1)
    err |= _eq(b, 0xFF, 0xE0) & a_80_9f  # overlong 3-byte
    err |= _eq(b, 0xFF, 0xED) & a_a0_bf  # surrogate
    err |= _eq(b, 0xFF, 0xF0) & a_80_8f  # overlong 4-byte
    err |= _eq(b, 0xFF, 0xF4) & ~a_80_8f & _HIGH  # too large (F4 + next>=90)
    err |= _eq(b, 0xFC, 0xF4) & ~_eq(b, 0xFF, 0xF4)  # F5..F7
    err |= _eq(b, 0xF8, 0xF8)  # >= F8

    row, lane32 = _iotas(b.shape)
    tilepos = jnp.min(
        jnp.where(err != 0, (i * BR + row) * W32 + lane32, BIG)
    )

    @pl.when(tilepos < out_ref[0, 0])
    def _update():
        out_ref[0, 0] = tilepos


@jax.jit
def utf8_swar_first_bad_word(x32: jnp.ndarray, salt=0):
    """x32: (BR + R + BR, 128) int32 view of the zero-padded byte buffer
    (one zero tile fore and aft). Returns the flattened index of the first
    int32 word containing an error byte (BIG when fully valid).

    ``salt`` is echoed through the kernel's scratch output so benchmark
    loops can make each call's arguments distinct (defeats loop-invariant
    hoisting / execution caching in remote runtimes); it does not affect
    the result."""
    grid = (x32.shape[0] - 2 * BR) // BR
    out = pl.pallas_call(
        _swar_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BR, W32), lambda i: (i + 1, 0)),
            pl.BlockSpec((8, HALO), lambda i: ((i + 2) * BR // 8, 0)),
            pl.BlockSpec((8, HALO), lambda i: ((i + 1) * BR // 8 - 1, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
        interpret=_interpret(),
    )(jnp.reshape(jnp.asarray(salt, jnp.int32), (1,)), x32, x32, x32)
    return out[0, 0]


def _ascii_swar_kernel(x_ref, out_ref):
    """First int32 word containing a non-ASCII byte (high-bit OR-reduce:
    one op per 4 bytes vs 3-4 in the widened kernel)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[0, 0] = BIG
        out_ref[0, 1] = 0  # unused slot: deterministic output

    b = x_ref[...]
    row, lane = _iotas(b.shape)
    hit = (b & _HIGH) != 0
    pos = jnp.min(jnp.where(hit, (i * BR + row) * W32 + lane, BIG))

    @pl.when(pos < out_ref[0, 0])
    def _update():
        out_ref[0, 0] = pos


@jax.jit
def ascii_swar_first_bad_word(x32: jnp.ndarray):
    """x32: (BR + R + BR, 128) int32 view (same layout as the utf8 SWAR
    buffer). Returns the first word index with a non-ASCII byte (BIG when
    pure ASCII)."""
    grid = (x32.shape[0] - 2 * BR) // BR
    out = pl.pallas_call(
        _ascii_swar_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((BR, W32), lambda i: (i + 1, 0))],
        out_specs=pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
        interpret=_interpret(),
    )(x32)
    return out[0, 0]


# ---------------------------------------------------------------------------
# UTF-16 SWAR: two code units per int32 word (halfword predicates via the
# 16-bit zero-detect analog of the byte trick).

_HONES = 0x00010001
_HHIGH = _i32(0x80008000)


def _hz16(v):
    return (v - _HONES) & ~v & _HHIGH


def _eq16(w, mask, val):
    return _hz16((w & _i32(mask * _HONES)) ^ _i32(val * _HONES))


def _bswap16x2(w):
    """Byteswap both u16 units packed in each int32 word (BE -> native);
    one definition shared by the tile, next-halo and prev-halo reads."""
    return ((w << 8) & _i32(0xFF00FF00)) | (
        (w.astype(jnp.uint32) >> 8).astype(jnp.int32) & 0x00FF00FF
    )


def _utf16_swar_kernel(x_ref, nxt_ref, prv_ref, out_ref, *, be: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[0, 0] = BIG
        out_ref[0, 1] = 0  # unused slot: deterministic output

    wr = x_ref[...]
    if be:
        wr = _bswap16x2(wr)
    # surrogate-free fast path: a first-error position can only sit ON a
    # surrogate unit, so a tile with no D800..DFFF units contributes no
    # errors regardless of its neighbors — no halo read needed here
    sur_here = vany(_eq16(wr, 0xF800, 0xD800) != 0)

    @pl.when(sur_here)
    def _full_check():
        _utf16_swar_body(x_ref, nxt_ref, prv_ref, out_ref, i, be)


def _utf16_swar_body(x_ref, nxt_ref, prv_ref, out_ref, i, be):
    w = x_ref[...]
    if be:
        w = _bswap16x2(w)
    _, lane = _iotas(w.shape)

    high = _eq16(w, 0xFC00, 0xD800)  # 0x8000 bit per high surrogate
    low = _eq16(w, 0xFC00, 0xDC00)

    lu = jnp.uint32

    def lsr(m, k):
        return (m.astype(lu) >> k).astype(jnp.int32)

    # next unit's low-flag aligned at current unit
    # the roll's wrapped value at lane W32-1 is immediately overwritten by
    # the raw-next-word recompute below, so no same-tile splice is needed
    nxt_word_low = pltpu.roll(low, shift=W32 - 1, axis=1)
    # boundary: recompute from the raw next word (masks can't cross tiles)
    nxt_raw = jnp.concatenate([x_ref[1:, :1], nxt_ref[0:1, :1]], axis=0)
    if be:
        nxt_raw = _bswap16x2(nxt_raw)
    nxt_low_b = _eq16(nxt_raw, 0xFC00, 0xDC00)
    nxt_word_low = jnp.where(lane < W32 - 1, nxt_word_low, nxt_low_b)
    next_low = lsr(low, 16) | (nxt_word_low << 16)

    # previous unit's high-flag aligned at current unit
    prv_word_high = jnp.where(
        lane > 0,
        pltpu.roll(high, shift=1, axis=1),
        jnp.zeros_like(high),
    )
    prv_raw = jnp.concatenate(
        [prv_ref[7:8, HALO - 1 :], x_ref[:-1, W32 - 1 :]], axis=0
    )
    if be:
        prv_raw = _bswap16x2(prv_raw)
    prv_high_b = _eq16(prv_raw, 0xFC00, 0xD800)
    prv_word_high = jnp.where(lane > 0, prv_word_high, prv_high_b)
    prev_high = (high << 16) | lsr(prv_word_high, 16)

    bad = (high & ~next_low) | (low & ~prev_high)
    row, lane32 = _iotas(w.shape)
    pos = jnp.min(jnp.where(bad != 0, (i * BR + row) * W32 + lane32, BIG))

    @pl.when(pos < out_ref[0, 0])
    def _update():
        out_ref[0, 0] = pos


import functools as _ft


@_ft.partial(jax.jit, static_argnames=("be",))
def utf16_swar_first_bad_word(x32: jnp.ndarray, be: bool = False):
    """x32: (BR + R + BR, 128) int32 view of a zero-padded uint16 buffer
    (units packed 2/word, zero tiles fore and aft). Returns the first word
    index containing an ill-formed surrogate (BIG when valid)."""
    grid = (x32.shape[0] - 2 * BR) // BR
    out = pl.pallas_call(
        _ft.partial(_utf16_swar_kernel, be=be),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((BR, W32), lambda i: (i + 1, 0)),
            pl.BlockSpec((8, HALO), lambda i: ((i + 2) * BR // 8, 0)),
            pl.BlockSpec((8, HALO), lambda i: ((i + 1) * BR // 8 - 1, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
        interpret=_interpret(),
    )(x32, x32, x32)
    return out[0, 0]
