"""One-pass structural census as a pallas kernel: the routing facts
(ascii / uniform-2/3/4-byte / has-2-byte-leads / has-4-byte-leads) for a
whole buffer in a single read at stream rate.

Why a kernel: the jnp census (ops/utf8.census) is elementwise over the
1-D u8 buffer, and TPU processes u8 elementwise at one byte per 32-bit
VPU lane — a bare AND-reduce over 64 MiB measures 2.2 ms (31 GB/s) and
the full census 3.2 ms in the 2026-08-20 230 GB/s state, ~20% of the
whole flagship transcode. SWAR over an int32 view fixes the lane width,
but every XLA route to the word form pays materialized copies
(u8_words = 4 strided widening passes ~2.2 ms; reshape(-1,4)+bitcast =
the round-4 minor-dim-4 class). In-kernel ``pltpu.bitcast`` reinterprets
a (4K, 128) u8 block as (K, 128) int32 IN REGISTERS — zero extra
traffic.

Byte geometry after the bitcast (verified on-device 2026-08-20): word
(r, lane) packs u8 rows 4r..4r+3 at the same lane, so byte slot m of
word (r, lane) is flat position p = (4r+m)*128 + lane. Consequences the
kernel exploits:
  * p+1 (the next byte, for first-continuation range checks) is the
    same byte slot at lane+1 — ONE lane roll serves all 4 slots, with a
    column splice at lane 127 (the swar.py idiom).
  * p mod 2 / mod 4 are functions of lane alone (128 = 0 mod 4), so the
    uniform-2/4 positional masks are whole-word per-lane constants.
  * p mod 3 = (2r + 2m + lane) mod 3: three per-lane constant mask
    vectors selected by r mod 3.

Reference counterpart: the per-block is_ascii fast path
(src/generic/utf8_to_utf16/utf8_to_utf16.h:237-240) generalized to the
corpus-scale class census that drives device-tier routing
(ops/utf8.to_utf16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .validate import _interpret, _iotas, vany

KW = 64  # minimum int32 word rows per block (4*KW u8 rows = one 32 KiB
# tile, the shape gate); _census_call picks the largest divisible block
# up to KW_MAX — small blocks cost ~0.3-0.4 us/grid-step of per-step
# overhead, ~1.5 ms at 64 MiB with 32 KiB blocks (measured 2026-08-20)
KW_MAX = 512
LW = 128  # lanes

_ONES = 0x01010101


def _i32(x: int) -> int:
    x &= 0xFFFFFFFF
    return x - 0x100000000 if x >= 0x80000000 else x


_HIGH = _i32(0x80808080)


def _hz(v):
    return (v - _ONES) & ~v & _HIGH


def _eq(b, mask, val):
    return _hz((b & _i32(mask * _ONES)) ^ _i32(val * _ONES))


# result bit assignments (out word)
BIT_NONASCII = 1
BIT_V2 = 2
BIT_V3 = 4
BIT_V4 = 8
BIT_HAS2 = 16
BIT_HAS4 = 32
BIT_HASLO = 64  # some in-range byte < 0x80 (the latin1 allhi census)


def _census_kernel(len_ref, x_ref, nxtcol_ref, out_ref, *, kw: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[0, 0] = 0
        out_ref[0, 1] = 0  # unused: deterministic output

    x = x_ref[...]  # (4*kw, LW) u8
    w = pltpu.bitcast(x, jnp.int32)  # (kw, LW)
    length = len_ref[0]

    row, lane = _iotas((kw, LW))
    r = i * kw + row  # global word row

    # per-byte in-range mask (0x80 bit of slot m iff (4r+m)*128+lane < length)
    base = (4 * r) * LW + lane
    inr = jnp.where(base < length, 0x80, 0)
    inr |= jnp.where(base + LW < length, 0x80 << 8, 0)
    inr |= jnp.where(base + 2 * LW < length, 0x80 << 16, 0)
    inr |= jnp.where(base + 3 * LW < length, jnp.int32(_i32(0x80 << 24)), 0)

    # next byte (p+1): same slot, lane+1; at lane 127 the successor of
    # slot m is slot m+1 of the SAME word row at lane 0 (flat position
    # (4r+m)*128 + 128 = (4r+m+1)*128 + 0), and slot 3's successor is
    # slot 0 of word row r+1 at lane 0 (halo word for the last row)
    w1 = pltpu.roll(w, LW - 1, 1)  # w[r, lane+1] for lane < 127
    lu = jnp.uint32

    def lsr(m, k):
        return (m.astype(lu) >> k).astype(jnp.int32)

    nxtw = pltpu.bitcast(nxtcol_ref[...], jnp.int32)  # (2, LW)
    wc0 = w[:, :1]  # (KW, 1): lane-0 word of each row
    wc0n = jnp.concatenate([wc0[1:], nxtw[0:1, :1]], axis=0)  # row r+1
    splice_col = lsr(wc0, 8) | (wc0n << 24)  # (KW, 1)
    b1w = jnp.where(lane < LW - 1, w1, splice_col)

    cont = _eq(w, 0xC0, 0x80)
    ncont = ~cont & _HIGH
    c1 = _eq(b1w, 0xC0, 0x80)

    viol_ascii = w & _HIGH
    has2m = _eq(w, 0xE0, 0xC0)
    has4m = _eq(w, 0xF0, 0xF0)

    # uniform-2: even positions C2..DF leads, odd continuations
    # positional masks from iotas (pallas kernels cannot capture array
    # constants): p mod 2 / mod 4 are functions of lane alone
    ok2lead = has2m & ~_eq(w, 0xFE, 0xC0)
    meven = jnp.where((lane & 1) == 0, _HIGH, 0)
    viol_u2 = (meven & ~ok2lead) | (~meven & _HIGH & ncont)

    # uniform-3: mod-3 positions E0..EF leads with in-class first
    # continuation bounds (E0 needs next >= A0, ED needs next < A0)
    b1_80_9f = _eq(b1w, 0xE0, 0x80)
    b1_a0_bf = _eq(b1w, 0xE0, 0xA0)
    lead3ok = (
        _eq(w, 0xF0, 0xE0)
        & c1
        & ~(_eq(w, 0xFF, 0xE0) & b1_80_9f)
        & ~(_eq(w, 0xFF, 0xED) & b1_a0_bf)
    )
    # slot m is a mod-3 lead position iff (2r + 2m + lane) % 3 == 0,
    # i.e. t == m % 3 with t = (2r + lane) % 3
    t3 = (2 * r + lane) % 3
    m3 = jnp.where(
        t3 == 0,
        jnp.int32(_i32(0x80000080)),
        jnp.where(t3 == 1, jnp.int32(0x8000), jnp.int32(0x800000)),
    )
    viol_u3 = (m3 & ~lead3ok) | ((m3 ^ _HIGH) & ncont)

    # uniform-4: mod-4 positions F0..F4 leads with first-continuation
    # bounds (F0 needs next >= 90, F4 needs next < 90)
    b1_80_8f = _eq(b1w, 0xF0, 0x80)
    in_f0_f4 = _eq(w, 0xFC, 0xF0) | _eq(w, 0xFF, 0xF4)
    lead4ok = (
        in_f0_f4
        & c1
        & ~(_eq(w, 0xFF, 0xF0) & b1_80_8f)
        & ~(_eq(w, 0xFF, 0xF4) & c1 & ~b1_80_8f)
    )
    m4 = jnp.where((lane & 3) == 0, _HIGH, 0)
    viol_u4 = (m4 & ~lead4ok) | (~m4 & _HIGH & ncont)

    bits = jnp.where(vany((viol_ascii & inr) != 0), BIT_NONASCII, 0)
    bits |= jnp.where(vany((viol_u2 & inr) != 0), BIT_V2, 0)
    bits |= jnp.where(vany((viol_u3 & inr) != 0), BIT_V3, 0)
    bits |= jnp.where(vany((viol_u4 & inr) != 0), BIT_V4, 0)
    bits |= jnp.where(vany((has2m & inr) != 0), BIT_HAS2, 0)
    bits |= jnp.where(vany((has4m & inr) != 0), BIT_HAS4, 0)
    bits |= jnp.where(vany((~w & _HIGH & inr) != 0), BIT_HASLO, 0)
    out_ref[0, 0] = out_ref[0, 0] | bits


def _pick_kw(nw: int, kw_min: int, kw_max: int) -> int:
    kw = kw_max
    while kw > kw_min and nw % kw:
        kw //= 2
    return kw


def _census_call(b2: jnp.ndarray, length, nb: int, tot8: int):
    import functools as _ft

    nw = b2.shape[0] // 4  # total word rows
    kw = _pick_kw(nw, KW, KW_MAX)
    nb = nw // kw
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((4 * kw, LW), lambda i, L: (i, 0)),
            # next block's first 8 u8 rows (two word rows; the first is
            # consumed), clamped at the buffer end
            pl.BlockSpec(
                (8, LW),
                lambda i, L: (jnp.minimum((i + 1) * kw // 2, tot8 - 1), 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 2), lambda i, L: (0, 0), memory_space=pltpu.SMEM
        ),
    )
    out = pl.pallas_call(
        _ft.partial(_census_kernel, kw=kw),
        grid_spec=grid,
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
        interpret=_interpret(),
    )(jnp.asarray(length, jnp.int32).reshape(1), b2, b2)
    return out[0, 0]


BLOCK_B = 4 * KW * LW  # bytes per grid block (= kernels/butterfly.TILE)

_KERNEL_OK: list = []


def census_supported(n: int) -> bool:
    """Shape gate + one-block compile probe for the census kernel.

    Unlike the rate-converting kernels this one contains no vector shape
    casts (bitcast + one lane roll + elementwise only), so the
    per-request-inconsistent tunnel compile pool is not a risk class for
    it — the butterfly kernels with the same primitive mix run
    unconditionally. The probe exists only to catch a toolchain without
    ``pltpu.bitcast`` and routes to the jnp census on any failure."""
    if n % BLOCK_B:
        return False
    if _interpret():
        # interpret-mode support for pltpu.bitcast is not guaranteed;
        # the jnp census is exact and cheap at test sizes
        return False
    if not _KERNEL_OK:
        try:
            b2 = jnp.zeros((4 * KW, LW), jnp.uint8)
            jax.block_until_ready(
                jax.jit(lambda b: _census_call(b, 512, 1, KW // 2))(b2))
            _KERNEL_OK.append(True)
        except Exception:
            _KERNEL_OK.append(False)
    return _KERNEL_OK[0]


def census_bits(b_u8: jnp.ndarray, length):
    """OR-reduced violation/presence bits for the whole buffer. Requires
    ``b_u8.size % BLOCK_B == 0`` (see :func:`census_supported`).

    Bit semantics (positional checks only; the caller ANDs the scalar
    length-divisibility facts): BIT_NONASCII / BIT_V2 / BIT_V3 / BIT_V4
    set iff some in-range byte violates the ascii / uniform-2 / 3 / 4
    pattern; BIT_HAS2 / BIT_HAS4 set iff some in-range byte is a 2-byte
    lead / is >= 0xF0."""
    n = b_u8.shape[0]
    b2 = b_u8.reshape(-1, LW)
    nb = n // BLOCK_B
    return _census_call(b2, length, nb, b2.shape[0] // 8)


# ---------------------------------------------------------------------------
# UTF-16 census kernel: the routing facts for ops/utf16 (ascii / uniform
# 2-UTF-8-byte / uniform 3-byte / astral-pairs) in one read. Same
# motivation and bitcast geometry as the UTF-8 kernel above, at 16-bit
# granularity: a (2K, 128) u16 block bitcasts to (K, 128) int32 with
# unit slot h of word (r, lane) at flat unit position p = (2r+h)*128 +
# lane — so unit parity (the astral pair pattern) is lane parity, a
# whole-word per-lane constant, and no neighbor reads are needed at all.

_HONES = 0x00010001
_HHIGH = _i32(0x80008000)


def _hz16(v):
    return (v - _HONES) & ~v & _HHIGH


def _eq16(w, mask, val):
    return _hz16((w & _i32(mask * _HONES)) ^ _i32(val * _HONES))


BIT16_NONASCII = 1
BIT16_V2 = 2
BIT16_V3 = 4
BIT16_VASTRAL = 8

KW16 = 32  # minimum word rows per block (2*KW16 u16 rows = TILE_U, the
# shape gate); _census16_call picks the largest divisible block up to
KW16_MAX = 512
BLOCK_U16 = 2 * KW16 * LW  # units per minimum grid block


def _census16_kernel(len_ref, x_ref, out_ref, *, be: bool, kw: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[0, 0] = 0
        out_ref[0, 1] = 0  # unused: deterministic output

    x = x_ref[...]  # (2*kw, LW) u16
    w = pltpu.bitcast(x, jnp.int32)  # (kw, LW)
    if be:
        # BE units byteswapped in-register (both slots at once)
        w = ((w << 8) & _i32(0xFF00FF00)) | (
            (w.astype(jnp.uint32) >> 8).astype(jnp.int32) & 0x00FF00FF
        )
    length = len_ref[0]

    row, lane = _iotas((kw, LW))
    r = i * kw + row

    # per-unit in-range mask (0x8000 bit of slot h iff (2r+h)*128+lane
    # < length)
    base = (2 * r) * LW + lane
    inr = jnp.where(base < length, 0x8000, 0)
    inr |= jnp.where(base + LW < length, jnp.int32(_i32(0x8000 << 16)), 0)

    # ascii: unit < 0x80
    ok_ascii = _eq16(w, 0xFF80, 0)
    viol_ascii = ~ok_ascii & _HHIGH
    # u2r: 0x80 <= unit <= 0x7FF  (top 5 bits zero, bits 7..10 not all 0)
    top0 = _eq16(w, 0xF800, 0)
    low0 = _eq16(w, 0x0780, 0)
    viol_u2 = ~(top0 & ~low0) & _HHIGH
    # u3r: unit >= 0x800 and not a surrogate
    sur = _eq16(w, 0xF800, 0xD800)
    viol_u3 = ~(~top0 & ~sur) & _HHIGH
    # astral: even units high surrogates, odd units low surrogates
    hi = _eq16(w, 0xFC00, 0xD800)
    lo = _eq16(w, 0xFC00, 0xDC00)
    meven = jnp.where((lane & 1) == 0, _HHIGH, 0)
    viol_astral = (meven & ~hi) | (~meven & _HHIGH & ~lo)

    bits = jnp.where(vany((viol_ascii & inr) != 0), BIT16_NONASCII, 0)
    bits |= jnp.where(vany((viol_u2 & inr) != 0), BIT16_V2, 0)
    bits |= jnp.where(vany((viol_u3 & inr) != 0), BIT16_V3, 0)
    bits |= jnp.where(vany((viol_astral & inr) != 0), BIT16_VASTRAL, 0)
    out_ref[0, 0] = out_ref[0, 0] | bits


def _census16_call(w2: jnp.ndarray, length, nb: int, be: bool):
    import functools as _ft

    nw = w2.shape[0] // 2
    kw = _pick_kw(nw, KW16, KW16_MAX)
    nb = nw // kw
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec((2 * kw, LW), lambda i, L: (i, 0))],
        out_specs=pl.BlockSpec(
            (1, 2), lambda i, L: (0, 0), memory_space=pltpu.SMEM
        ),
    )
    out = pl.pallas_call(
        _ft.partial(_census16_kernel, be=be, kw=kw),
        grid_spec=grid,
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
        interpret=_interpret(),
    )(jnp.asarray(length, jnp.int32).reshape(1), w2)
    return out[0, 0]


_KERNEL16_OK: list = []


def census16_supported(n_units: int) -> bool:
    """Shape gate + one-block compile probe (see census_supported)."""
    if n_units % BLOCK_U16:
        return False
    if _interpret():
        return False
    if not _KERNEL16_OK:
        try:
            w2 = jnp.zeros((2 * KW16, LW), jnp.uint16)
            jax.block_until_ready(
                jax.jit(lambda w: _census16_call(w, 128, 1, False))(w2))
            _KERNEL16_OK.append(True)
        except Exception:
            _KERNEL16_OK.append(False)
    return _KERNEL16_OK[0]


def census16_bits(w_u16: jnp.ndarray, length, be: bool = False):
    """OR-reduced violation bits for a uint16 buffer (length in units).
    ``be=True`` byteswaps units in-register (the BE census needs no
    separate byteswapped copy of the buffer)."""
    n = w_u16.shape[0]
    w2 = w_u16.reshape(-1, LW)
    return _census16_call(w2, length, n // BLOCK_U16, be)
