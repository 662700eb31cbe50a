"""Pallas transcode kernels: the ASCII fast paths.

The reference's transcoders lead with a per-64B ``is_ascii`` short-circuit
that zero-extend-stores the whole block
(generic/utf8_to_utf16/utf8_to_utf16.h:237-240,
``store_ascii_as_utf16``). On TPU the same idea pays off at corpus scale:
an all-ASCII buffer transcodes as a pure elementwise widen at HBM speed,
and the ASCII check *is* the validity proof (ASCII ⊂ valid UTF-8), so one
fused pass replaces validate+transcode entirely.

The trick that makes the widen elementwise (no lane interleave, which
Mosaic relayouts would make expensive): view the input as int16 pairs.
Little-endian byte pair (b0, b1) widens to the u16 pair (b0, b1), whose
int32 memory image is ``b0 | b1 << 16`` — computable per-lane from the
int16 value ``h = b0 | b1 << 8`` as ``(h & 0xFF) | ((h & 0xFF00) << 8)``.
The int32 output IS the UTF-16LE byte stream. Same shape in and out, three
VPU ops per 2 bytes; the kernel is memory-bound.

A (1,1) SMEM output accumulates the "saw non-ASCII" flag; the caller falls
back to the XLA general path when it fires (outputs written so far are
discarded — the flag makes them meaningless, matching the reference's
error-path contract of unspecified partial content).

General-path (mixed-script) compaction stays on the XLA scatter engine by
measurement: the VPU cost of in-kernel stream compaction (scan + search +
gather + butterfly merge, see tools/probe_vpu.py fullpath) exceeds the
scatter's measured cost several-fold on v5e (DESIGN-compaction.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import validate as kv
from .validate import BR, _interpret, vany


# whole-array XLA drivers of the kernel cores (shared with base64_kernel)
_xla_driver = kv.xla_driver


W16 = 256  # int16 lanes per row (512 bytes)
_I16_HIGH = -32640  # 0x8080 as int16 (plain int: never a device constant)


def _widen_kernel(x_ref, out_ref, flag_ref, *, big_endian: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        flag_ref[0, 0] = 0

    h = x_ref[...]  # (BR, 256) int16: 2 input bytes per lane
    nonascii = vany((h & _I16_HIGH) != 0)

    @pl.when(nonascii)
    def _flag():
        flag_ref[0, 0] = 1

    w = h.astype(jnp.int32) & 0xFFFF
    if big_endian:
        # each unit is the byteswapped u16: (0, b0, 0, b1) in memory
        out = ((w & 0xFF) << 8) | ((w & 0xFF00) << 16)
    else:
        out = (w & 0xFF) | ((w & 0xFF00) << 8)
    out_ref[...] = out


@functools.partial(jax.jit, static_argnames=("big_endian",))
def ascii_widen_utf16(x16: jnp.ndarray, big_endian: bool = False):
    """x16: (R, 256) int16 view of the zero-padded byte buffer (R % BR == 0).

    Returns (out, flag): ``out`` (R, 256) int32 whose memory image is the
    UTF-16 stream (2 units per lane); ``flag`` != 0 when any non-ASCII byte
    was seen (out is then meaningless — caller must fall back)."""
    grid = x16.shape[0] // BR
    out, flag = pl.pallas_call(
        functools.partial(_widen_kernel, big_endian=big_endian),
        grid=(grid,),
        in_specs=[pl.BlockSpec((BR, W16), lambda i: (i, 0))],
        out_specs=(
            pl.BlockSpec((BR, W16), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x16.shape[0], W16), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(x16)
    return out, flag[0, 0]


def _narrow_kernel(x_ref, out_ref, flag_ref, *, big_endian: bool):
    """UTF-16 -> UTF-8 when every unit is ASCII: pack 2 units into one
    int16 lane (the byte stream), flag anything >= 0x80."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        flag_ref[0, 0] = 0

    w = x_ref[...]  # (BR, 256) int32: 2 u16 units per lane (raw memory)
    if big_endian:
        # BE unit memory image is (hi, lo): ASCII unit = char << 8
        non = vany((w & (-2130738945)) != 0)  # ~0x7F007F00
        packed = ((w >> 8) & 0x7F) | (((w >> 24) & 0x7F) << 8)
    else:
        non = vany((w & (-8355712)) != 0)  # 0xFF80FF80
        packed = (w & 0x7F) | (((w >> 16) & 0x7F) << 8)

    @pl.when(non)
    def _flag():
        flag_ref[0, 0] = 1

    # unit0 -> low byte, unit1 -> high byte of the int16 lane
    out_ref[...] = packed.astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("big_endian",))
def ascii_narrow_utf8(x32: jnp.ndarray, big_endian: bool = False):
    """x32: (R, 256) int32 view of the zero-padded uint16 buffer (2 units
    per lane, 1 KiB of UTF-16 per row; R % BR == 0).

    Returns (out (R, 256) int16 = the UTF-8 byte stream, flag != 0 when any
    unit >= 0x80 was seen — caller must fall back)."""
    grid = x32.shape[0] // BR
    out, flag = pl.pallas_call(
        functools.partial(_narrow_kernel, big_endian=big_endian),
        grid=(grid,),
        in_specs=[pl.BlockSpec((BR, W16), lambda i: (i, 0))],
        out_specs=(
            pl.BlockSpec((BR, W16), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x32.shape[0], W16), jnp.int16),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(x32)
    return out, flag[0, 0]


# --- uniform-width UTF-8 -> UTF-16 kernels -----------------------------------
#
# Single-width corpora are the other structured class the reference's own
# benchmark datasets exercise (benchmarks/dataset/wikipedia_mars is
# artificially all-3-byte, per its README/convert_to_utf6.py). They need
# no stream compaction:
#   * pure 2-byte chars: one int32 word = 2 chars = 2 units — elementwise.
#   * pure 3-byte chars: 3 words = 4 chars -> 2 out words — the same
#     phase-plane 3:2 repack as the base64 kernels, on (64, 384) blocks
#     (384 % 3 == 0 keeps every row group-aligned; no carry, no DMA).
# Validity is checked exactly for the uniform shape (structure + overlong
# + surrogate); anything else raises the fallback flag.

RU = 64  # rows per uniform-kernel tile


def _u16unit(cp, big_endian: bool):
    return ((cp >> 8) | ((cp & 0xFF) << 8)) & 0xFFFF if big_endian else cp


def _uniform2_kernel(n_ref, x_ref, o_ref, f_ref, *, big_endian: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        f_ref[0, 0] = 0

    x = x_ref[...]  # (RU, 256) int32: two 2-byte chars per lane
    lu = jnp.uint32
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    wbyte = ((i * x.shape[0] + row) * 256 + lane) * 4

    def half(shift, off):
        h = (x.astype(lu) >> shift).astype(jnp.int32) & 0xFFFF
        lead, cont = h & 0xFF, (h >> 8) & 0xFF
        ok = ((lead & 0xE0) == 0xC0) & ((cont & 0xC0) == 0x80) & (lead >= 0xC2)
        ok = ok | (wbyte + off >= n_ref[0])  # padding chars never flag
        cp = ((lead & 0x1F) << 6) | (cont & 0x3F)
        return cp, ok

    cp0, ok0 = half(0, 0)
    cp1, ok1 = half(16, 2)
    bad = vany(~(ok0 & ok1))

    @pl.when(bad)
    def _flag():
        f_ref[0, 0] = 1

    u0 = _u16unit(cp0, big_endian)
    u1 = _u16unit(cp1, big_endian)
    o_ref[...] = u0 | (u1 << 16)


@functools.partial(jax.jit, static_argnames=("big_endian",))
def uniform2_utf8_to_utf16(x32: jnp.ndarray, n, big_endian: bool = False):
    """x32: (R, 256) int32 view of the zero-padded byte buffer
    (R % RU == 0); ``n`` = logical byte length (n % 2 == 0). Bytes at/after
    ``n`` never flag. Returns (out (R, 256) int32 = u16-pair stream, flag).
    """
    grid = x32.shape[0] // RU
    out, flag = pl.pallas_call(
        functools.partial(_uniform2_kernel, big_endian=big_endian),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((RU, 256), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((RU, 256), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x32.shape[0], 256), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(jnp.reshape(jnp.asarray(n, jnp.int32), (1,)), x32)
    return out, flag[0, 0]


def _u8_3byte_char(b0, b1, b2):
    """(codepoint, structurally_ok) of one 3-byte UTF-8 char."""
    cp = ((b0 & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F)
    ok = (
        ((b0 & 0xF0) == 0xE0)
        & ((b1 & 0xC0) == 0x80)
        & ((b2 & 0xC0) == 0x80)
        & (cp >= 0x800)
        & ((cp < 0xD800) | (cp > 0xDFFF))
    )
    return cp, ok


def _uniform3_chars(x, i, n):
    """Decode the 4 chars of every 3-word (12-byte) group of a (R, 384)
    tile; tile index ``i`` globalizes the padding mask. Returns
    (c0..c3 each (R, 128), bad)."""
    R = x.shape[0]
    lu = jnp.uint32
    I = x.reshape(R, 128, 3)
    w0, w1, w2 = I[..., 0], I[..., 1], I[..., 2]
    row = jax.lax.broadcasted_iota(jnp.int32, w0.shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, w0.shape, 1)
    gbyte = ((i * R + row) * 128 + lane) * 12  # group's first byte

    def byte(w, k):
        return (w.astype(lu) >> (8 * k)).astype(jnp.int32) & 0xFF

    def char(b0, b1, b2, off):
        cp, ok = _u8_3byte_char(b0, b1, b2)
        return cp, ok | (gbyte + off >= n)  # padding chars never flag

    c0, k0 = char(byte(w0, 0), byte(w0, 1), byte(w0, 2), 0)
    c1, k1 = char(byte(w0, 3), byte(w1, 0), byte(w1, 1), 3)
    c2, k2 = char(byte(w1, 2), byte(w1, 3), byte(w2, 0), 6)
    c3, k3 = char(byte(w2, 1), byte(w2, 2), byte(w2, 3), 9)
    bad = vany(~(k0 & k1 & k2 & k3))
    return c0, c1, c2, c3, bad


def _uniform3_core(x, i, n, big_endian: bool):
    c0, c1, c2, c3, bad = _uniform3_chars(x, i, n)
    u0, u1 = _u16unit(c0, big_endian), _u16unit(c1, big_endian)
    u2, u3 = _u16unit(c2, big_endian), _u16unit(c3, big_endian)
    out = jnp.stack(
        [u0 | (u1 << 16), u2 | (u3 << 16)], axis=-1
    ).reshape(x.shape[0], 256)
    return out, bad


def _uniform3_kernel(n_ref, x_ref, o_ref, f_ref, *, big_endian: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        f_ref[0, 0] = 0

    out, bad = _uniform3_core(x_ref[...], i, n_ref[0], big_endian)

    @pl.when(bad)
    def _flag():
        f_ref[0, 0] = 1

    o_ref[...] = out


def uniform3_utf8_to_utf16(x32: jnp.ndarray, n, big_endian: bool = False):
    """x32: (R, 384) int32 view of the zero-padded byte buffer (1536 bytes
    = 512 chars per row; R % RU == 0); ``n`` = logical byte length
    (n % 3 == 0). Bytes at/after ``n`` never flag.
    Returns (out (R, 256) int32, flag)."""
    if not kv.pallas_lowers(
            "uniform3_u8_u16",
            lambda: _uniform3_pallas(jnp.zeros((RU, 384), jnp.int32), 0)):
        return _xla_driver(_uniform3_core, x32, n, big_endian)
    return _uniform3_pallas(x32, n, big_endian)


@functools.partial(jax.jit, static_argnames=("big_endian",))
def _uniform3_pallas(x32: jnp.ndarray, n, big_endian: bool = False):
    grid = x32.shape[0] // RU
    out, flag = pl.pallas_call(
        functools.partial(_uniform3_kernel, big_endian=big_endian),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((RU, 384), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((RU, 256), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x32.shape[0], 256), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(jnp.reshape(jnp.asarray(n, jnp.int32), (1,)), x32)
    return out, flag[0, 0]


# --- uniform-width UTF-16 -> UTF-8 kernels -----------------------------------
#
# The inverse structured classes (reference: per-arch
# arm_convert_utf16_to_utf8.cpp's 1/2/3-byte classification, here as
# whole-corpus classes): every unit in [0x80, 0x7FF] -> 2 bytes each
# (word-elementwise), every unit in [0x800, 0xFFFF] \ surrogates -> 3
# bytes each (2:3 phase-plane repack). Flag-clean implies valid UTF-16.


def _units(w, big_endian):
    """Split an int32 word into its two u16 units (native values)."""
    lu = jnp.uint32
    u0 = w & 0xFFFF
    u1 = (w.astype(lu) >> 16).astype(jnp.int32) & 0xFFFF
    if big_endian:
        u0 = ((u0 >> 8) | (u0 << 8)) & 0xFFFF
        u1 = ((u1 >> 8) | (u1 << 8)) & 0xFFFF
    return u0, u1


def _rev2_kernel(n_ref, x_ref, o_ref, f_ref, *, big_endian: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        f_ref[0, 0] = 0

    w = x_ref[...]  # (RU, 256) int32: 2 units per lane
    row = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
    uidx = ((i * w.shape[0] + row) * 256 + lane) * 2
    u0, u1 = _units(w, big_endian)
    ok0 = ((u0 >= 0x80) & (u0 <= 0x7FF)) | (uidx >= n_ref[0])
    ok1 = ((u1 >= 0x80) & (u1 <= 0x7FF)) | (uidx + 1 >= n_ref[0])
    bad = vany(~(ok0 & ok1))

    @pl.when(bad)
    def _flag():
        f_ref[0, 0] = 1

    b0 = 0xC0 | (u0 >> 6)
    b1 = 0x80 | (u0 & 0x3F)
    b2 = 0xC0 | (u1 >> 6)
    b3 = 0x80 | (u1 & 0x3F)
    o_ref[...] = b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)


@functools.partial(jax.jit, static_argnames=("big_endian",))
def uniform2_utf16_to_utf8(x32: jnp.ndarray, n, big_endian: bool = False):
    """x32: (R, 256) int32 view of the zero-padded uint16 buffer; ``n`` =
    logical unit count. Every unit must be in [0x80, 0x7FF] or the flag
    fires. Returns (out (R, 256) int32 = UTF-8 byte stream, flag)."""
    grid = x32.shape[0] // RU
    out, flag = pl.pallas_call(
        functools.partial(_rev2_kernel, big_endian=big_endian),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((RU, 256), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((RU, 256), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x32.shape[0], 256), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(jnp.reshape(jnp.asarray(n, jnp.int32), (1,)), x32)
    return out, flag[0, 0]


def _pack3x4(q0, q1, q2, q3):
    """12 output bytes per group (4 units x 3 UTF-8 bytes) -> 3 words in
    stream order; q* are (byte0, byte1, byte2) triples per unit."""
    (a0, a1, a2), (c0, c1, c2) = q0, q1
    (d0, d1, d2), (e0, e1, e2) = q2, q3
    o0 = a0 | (a1 << 8) | (a2 << 16) | (c0 << 24)
    o1 = c1 | (c2 << 8) | (d0 << 16) | (d1 << 24)
    o2 = d2 | (e0 << 8) | (e1 << 16) | (e2 << 24)
    return o0, o1, o2


def _b3utf8(u):
    """3 UTF-8 bytes of a BMP (>= 0x800) unit."""
    return 0xE0 | (u >> 12), 0x80 | ((u >> 6) & 0x3F), 0x80 | (u & 0x3F)


def _rev3_core(x, i, n, big_endian: bool):
    R = x.shape[0]
    I = x.reshape(R, 128, 2)
    wa, wb = I[..., 0], I[..., 1]
    row = jax.lax.broadcasted_iota(jnp.int32, wa.shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, wa.shape, 1)
    gunit = ((i * R + row) * 128 + lane) * 4  # group's first unit index
    u0, u1 = _units(wa, big_endian)
    u2, u3 = _units(wb, big_endian)

    def ok(u, off):
        good = (u >= 0x800) & ((u < 0xD800) | (u > 0xDFFF))
        return good | (gunit + off >= n)

    bad = vany(~(ok(u0, 0) & ok(u1, 1) & ok(u2, 2) & ok(u3, 3)))
    o0, o1, o2 = _pack3x4(_b3utf8(u0), _b3utf8(u1), _b3utf8(u2), _b3utf8(u3))
    out = jnp.stack([o0, o1, o2], axis=-1).reshape(R, 384)
    return out, bad


def _rev3_kernel(n_ref, x_ref, o_ref, f_ref, *, big_endian: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        f_ref[0, 0] = 0

    out, bad = _rev3_core(x_ref[...], i, n_ref[0], big_endian)

    @pl.when(bad)
    def _flag():
        f_ref[0, 0] = 1

    o_ref[...] = out


def uniform3_utf16_to_utf8(x32: jnp.ndarray, n, big_endian: bool = False):
    """x32: (R, 256) int32 view of the zero-padded uint16 buffer; ``n`` =
    logical unit count (n % 4 == 0 padding-wise is not required — masked).
    Every unit must be in [0x800, 0xFFFF] minus surrogates.
    Returns (out (R, 384) int32 = UTF-8 byte stream, flag)."""
    if not kv.pallas_lowers(
            "uniform3_u16_u8",
            lambda: _rev3_pallas(jnp.zeros((RU, 256), jnp.int32), 0)):
        return _xla_driver(_rev3_core, x32, n, big_endian)
    return _rev3_pallas(x32, n, big_endian)


@functools.partial(jax.jit, static_argnames=("big_endian",))
def _rev3_pallas(x32: jnp.ndarray, n, big_endian: bool = False):
    grid = x32.shape[0] // RU
    out, flag = pl.pallas_call(
        functools.partial(_rev3_kernel, big_endian=big_endian),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((RU, 256), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((RU, 384), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x32.shape[0], 384), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(jnp.reshape(jnp.asarray(n, jnp.int32), (1,)), x32)
    return out, flag[0, 0]


# --- widen/narrow families: latin1 -> utf16/utf32, BMP utf16 <-> utf32 -------
#
# Latin1 widening is unconditional (every byte is a codepoint); the
# utf16<->utf32 pair covers the no-astral (BMP, surrogate-free) class,
# where both directions are fixed-rate 1:2 / 2:1 lane mixes.


def _l1_32_core(x16):
    h = x16.astype(jnp.int32) & 0xFFFF  # (R, 256) int16: 2 bytes per lane
    R = h.shape[0]
    w0 = h & 0xFF
    w1 = (h >> 8) & 0xFF
    return jnp.stack([w0, w1], axis=-1).reshape(R, 512)


def _l1_32_kernel(x_ref, o_ref):
    o_ref[...] = _l1_32_core(x_ref[...])


def latin1_widen_utf32(x16: jnp.ndarray):
    """x16: (R, 256) int16 byte-pair view. Returns (R, 512) int32 = the
    UTF-32LE stream (one word per input byte). Always valid."""
    if not kv.pallas_lowers(
            "latin1_widen_u32",
            lambda: _l1_32_pallas(jnp.zeros((RU, 256), jnp.int16))):
        return _l1_32_xla(x16)
    return _l1_32_pallas(x16)


_l1_32_xla = jax.jit(_l1_32_core)


@jax.jit
def _l1_32_pallas(x16: jnp.ndarray):
    grid = x16.shape[0] // RU
    return pl.pallas_call(
        _l1_32_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((RU, 256), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((RU, 512), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((x16.shape[0], 512), jnp.int32),
        interpret=_interpret(),
    )(x16)


def _bmp_widen_planes(w, big_endian: bool):
    """Unit planes + surrogate flag of a u16-pair word tile (shared by
    the shape-cast core and the butterfly kernel)."""
    u0, u1 = _units(w, big_endian)
    bad = vany(((u0 & 0xF800) == 0xD800) | ((u1 & 0xF800) == 0xD800))
    return u0, u1, bad


def _bmp_widen_core(w, i, n, big_endian: bool):
    del i, n  # zero padding is surrogate-free: no length masking needed
    u0, u1, bad = _bmp_widen_planes(w, big_endian)
    return jnp.stack([u0, u1], axis=-1).reshape(w.shape[0], 512), bad


def _bmp_widen_kernel(x_ref, o_ref, f_ref, *, big_endian: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        f_ref[0, 0] = 0

    out, bad = _bmp_widen_core(x_ref[...], i, 0, big_endian)

    @pl.when(bad)
    def _flag():
        f_ref[0, 0] = 1

    o_ref[...] = out


def _butterfly_enabled() -> bool:
    """Opt-in third path for lane-split kernels: synthesize the interleave
    in-kernel from roll+select (kernels/shuffle.py) instead of routing to
    the XLA driver. Never the silent default — enable to measure it
    (SIMDUTF_TPU_BUTTERFLY=1)."""
    import os

    return os.environ.get("SIMDUTF_TPU_BUTTERFLY") == "1"


def bmp_widen_utf32(x32: jnp.ndarray, big_endian: bool = False):
    """UTF-16 -> UTF-32 when no surrogates exist (zero-padding is
    surrogate-free, so no length masking is needed). Returns
    ((R, 512) int32 UTF-32LE stream, flag)."""
    if _butterfly_enabled():
        return _bmp_widen_bf(x32, big_endian)
    if not kv.pallas_lowers(
            "bmp_widen_u32",
            lambda: _bmp_widen_pallas(jnp.zeros((RU, 256), jnp.int32))):
        return _xla_driver(_bmp_widen_core, x32, 0, big_endian)
    return _bmp_widen_pallas(x32, big_endian)


def _bmp_widen_bf_kernel(x_ref, o_ref, f_ref, *, big_endian: bool):
    from . import shuffle as ksh

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        f_ref[0, 0] = 0

    w = x_ref[...]  # (RU, 256) int32: 2 u16 units per lane
    u0, u1, bad = _bmp_widen_planes(w, big_endian)

    @pl.when(bad)
    def _flag():
        f_ref[0, 0] = 1

    o_ref[...] = ksh.interleave2(u0, u1)


@functools.partial(jax.jit, static_argnames=("big_endian",))
def _bmp_widen_bf(x32: jnp.ndarray, big_endian: bool = False):
    grid = x32.shape[0] // RU
    out, flag = pl.pallas_call(
        functools.partial(_bmp_widen_bf_kernel, big_endian=big_endian),
        grid=(grid,),
        in_specs=[pl.BlockSpec((RU, 256), lambda i: (i, 0))],
        out_specs=(
            pl.BlockSpec((RU, 512), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x32.shape[0], 512), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(x32)
    return out, flag[0, 0]


@functools.partial(jax.jit, static_argnames=("big_endian",))
def _bmp_widen_pallas(x32: jnp.ndarray, big_endian: bool = False):
    grid = x32.shape[0] // RU
    out, flag = pl.pallas_call(
        functools.partial(_bmp_widen_kernel, big_endian=big_endian),
        grid=(grid,),
        in_specs=[pl.BlockSpec((RU, 256), lambda i: (i, 0))],
        out_specs=(
            pl.BlockSpec((RU, 512), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x32.shape[0], 512), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(x32)
    return out, flag[0, 0]


def _bmp_narrow_from_planes(c0, c1, big_endian: bool):
    """(u16-pair words, flag) from two codepoint planes (shared by the
    shape-cast core and the butterfly kernel)."""
    lu = jnp.uint32

    def bad1(c):
        cu = c.astype(lu)
        # -2048 == 0xFFFFF800 as int32 (Python-int literal would overflow)
        return (cu > 0xFFFF) | ((c & (-2048)) == 0xD800)

    bad = vany(bad1(c0) | bad1(c1))
    u0 = c0 & 0xFFFF
    u1 = c1 & 0xFFFF
    if big_endian:
        u0 = ((u0 >> 8) | (u0 << 8)) & 0xFFFF
        u1 = ((u1 >> 8) | (u1 << 8)) & 0xFFFF
    return u0 | (u1 << 16), bad


def _bmp_narrow_core(x, i, n, big_endian: bool):
    del i, n  # zero padding is BMP: no length masking needed
    I = x.reshape(x.shape[0], 256, 2)
    return _bmp_narrow_from_planes(I[..., 0], I[..., 1], big_endian)


def _bmp_narrow_kernel(x_ref, o_ref, f_ref, *, big_endian: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        f_ref[0, 0] = 0

    out, bad = _bmp_narrow_core(x_ref[...], i, 0, big_endian)

    @pl.when(bad)
    def _flag():
        f_ref[0, 0] = 1

    o_ref[...] = out


def bmp_narrow_utf16(x32: jnp.ndarray, big_endian: bool = False):
    """UTF-32 -> UTF-16 when every codepoint is BMP and non-surrogate
    (flag-clean implies valid UTF-32; zero padding never flags). Returns
    ((R, 256) int32 u16-pair stream, flag)."""
    if _butterfly_enabled():
        return _bmp_narrow_bf(x32, big_endian)
    if not kv.pallas_lowers(
            "bmp_narrow_u16",
            lambda: _bmp_narrow_pallas(jnp.zeros((RU, 512), jnp.int32))):
        return _xla_driver(_bmp_narrow_core, x32, 0, big_endian)
    return _bmp_narrow_pallas(x32, big_endian)


def _bmp_narrow_bf_kernel(x_ref, o_ref, f_ref, *, big_endian: bool):
    from . import shuffle as ksh

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        f_ref[0, 0] = 0

    x = x_ref[...]  # (RU, 512) int32: one u32 codepoint per lane
    c0, c1 = ksh.deinterleave2(x)
    out, bad = _bmp_narrow_from_planes(c0, c1, big_endian)

    @pl.when(bad)
    def _flag():
        f_ref[0, 0] = 1

    o_ref[...] = out


@functools.partial(jax.jit, static_argnames=("big_endian",))
def _bmp_narrow_bf(x32: jnp.ndarray, big_endian: bool = False):
    grid = x32.shape[0] // RU
    out, flag = pl.pallas_call(
        functools.partial(_bmp_narrow_bf_kernel, big_endian=big_endian),
        grid=(grid,),
        in_specs=[pl.BlockSpec((RU, 512), lambda i: (i, 0))],
        out_specs=(
            pl.BlockSpec((RU, 256), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x32.shape[0], 256), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(x32)
    return out, flag[0, 0]


@functools.partial(jax.jit, static_argnames=("big_endian",))
def _bmp_narrow_pallas(x32: jnp.ndarray, big_endian: bool = False):
    grid = x32.shape[0] // RU
    out, flag = pl.pallas_call(
        functools.partial(_bmp_narrow_kernel, big_endian=big_endian),
        grid=(grid,),
        in_specs=[pl.BlockSpec((RU, 512), lambda i: (i, 0))],
        out_specs=(
            pl.BlockSpec((RU, 256), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x32.shape[0], 256), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(x32)
    return out, flag[0, 0]


# --- uniform-width UTF-8 <-> UTF-32 ------------------------------------------


def _u2_32_core(x, i, n):
    R = x.shape[0]
    lu = jnp.uint32
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    wbyte = ((i * R + row) * 256 + lane) * 4

    def half(shift, off):
        h = (x.astype(lu) >> shift).astype(jnp.int32) & 0xFFFF
        lead, cont = h & 0xFF, (h >> 8) & 0xFF
        ok = ((lead & 0xE0) == 0xC0) & ((cont & 0xC0) == 0x80) & (lead >= 0xC2)
        ok = ok | (wbyte + off >= n)
        return ((lead & 0x1F) << 6) | (cont & 0x3F), ok

    cp0, ok0 = half(0, 0)
    cp1, ok1 = half(16, 2)
    bad = vany(~(ok0 & ok1))
    return jnp.stack([cp0, cp1], axis=-1).reshape(R, 512), bad


def _u2_32_kernel(n_ref, x_ref, o_ref, f_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        f_ref[0, 0] = 0

    out, bad = _u2_32_core(x_ref[...], i, n_ref[0])

    @pl.when(bad)
    def _flag():
        f_ref[0, 0] = 1

    o_ref[...] = out


def uniform2_utf8_to_utf32(x32: jnp.ndarray, n):
    """Pure 2-byte UTF-8 -> UTF-32: (R, 256) int32 in, ((R, 512) int32
    UTF-32LE stream, flag) out; ``n`` = logical byte length (n % 2 == 0)."""
    if not kv.pallas_lowers(
            "uniform2_u8_u32",
            lambda: _u2_32_pallas(jnp.zeros((RU, 256), jnp.int32), 0)):
        return _xla_driver(_u2_32_core, x32, n)
    return _u2_32_pallas(x32, n)


@jax.jit
def _u2_32_pallas(x32: jnp.ndarray, n):
    grid = x32.shape[0] // RU
    out, flag = pl.pallas_call(
        _u2_32_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((RU, 256), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((RU, 512), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x32.shape[0], 512), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(jnp.reshape(jnp.asarray(n, jnp.int32), (1,)), x32)
    return out, flag[0, 0]


def _rev2_32_core(x, i, n):
    R = x.shape[0]
    I = x.reshape(R, 256, 2)
    c0, c1 = I[..., 0], I[..., 1]
    row = jax.lax.broadcasted_iota(jnp.int32, c0.shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, c0.shape, 1)
    cidx = ((i * R + row) * 256 + lane) * 2

    def ok(c, off):
        return ((c >= 0x80) & (c <= 0x7FF)) | (cidx + off >= n)

    bad = vany(~(ok(c0, 0) & ok(c1, 1)))

    def two(c):  # 2 UTF-8 bytes, low byte first
        return (0xC0 | (c >> 6)) | ((0x80 | (c & 0x3F)) << 8)

    return two(c0) | (two(c1) << 16), bad


def _rev2_32_kernel(n_ref, x_ref, o_ref, f_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        f_ref[0, 0] = 0

    out, bad = _rev2_32_core(x_ref[...], i, n_ref[0])

    @pl.when(bad)
    def _flag():
        f_ref[0, 0] = 1

    o_ref[...] = out


def uniform2_utf32_to_utf8(x32: jnp.ndarray, n):
    """Pure 2-byte-range UTF-32 -> UTF-8: (R, 512) int32 codepoints in,
    ((R, 256) int32 byte stream, flag) out; ``n`` = logical codepoints."""
    if not kv.pallas_lowers(
            "uniform2_u32_u8",
            lambda: _rev2_32_pallas(jnp.zeros((RU, 512), jnp.int32), 0)):
        return _xla_driver(_rev2_32_core, x32, n)
    return _rev2_32_pallas(x32, n)


@jax.jit
def _rev2_32_pallas(x32: jnp.ndarray, n):
    grid = x32.shape[0] // RU
    out, flag = pl.pallas_call(
        _rev2_32_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((RU, 512), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((RU, 256), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x32.shape[0], 256), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(jnp.reshape(jnp.asarray(n, jnp.int32), (1,)), x32)
    return out, flag[0, 0]


def _u3_32_core(x, i, n):
    c0, c1, c2, c3, bad = _uniform3_chars(x, i, n)
    return jnp.stack([c0, c1, c2, c3], axis=-1).reshape(x.shape[0], 512), bad


def _u3_32_kernel(n_ref, x_ref, o_ref, f_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        f_ref[0, 0] = 0

    out, bad = _u3_32_core(x_ref[...], i, n_ref[0])

    @pl.when(bad)
    def _flag():
        f_ref[0, 0] = 1

    o_ref[...] = out


def uniform3_utf8_to_utf32(x32: jnp.ndarray, n):
    """Pure 3-byte UTF-8 -> UTF-32: (R, 384) int32 in (512 chars per row),
    ((R, 512) int32 UTF-32LE stream, flag); ``n`` = byte length (n%3==0)."""
    if not kv.pallas_lowers(
            "uniform3_u8_u32",
            lambda: _u3_32_pallas(jnp.zeros((RU, 384), jnp.int32), 0)):
        return _xla_driver(_u3_32_core, x32, n)
    return _u3_32_pallas(x32, n)


@jax.jit
def _u3_32_pallas(x32: jnp.ndarray, n):
    grid = x32.shape[0] // RU
    out, flag = pl.pallas_call(
        _u3_32_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((RU, 384), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((RU, 512), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x32.shape[0], 512), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(jnp.reshape(jnp.asarray(n, jnp.int32), (1,)), x32)
    return out, flag[0, 0]


def _rev3_32_core(x, i, n):
    R = x.shape[0]
    I = x.reshape(R, 128, 4)
    cs = [I[..., k] for k in range(4)]
    row = jax.lax.broadcasted_iota(jnp.int32, cs[0].shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, cs[0].shape, 1)
    gidx = ((i * R + row) * 128 + lane) * 4

    oks = []
    for k, c in enumerate(cs):
        good = (c >= 0x800) & (c <= 0xFFFF) & ((c < 0xD800) | (c > 0xDFFF))
        oks.append(good | (gidx + k >= n))
    bad = vany(~(oks[0] & oks[1] & oks[2] & oks[3]))
    o0, o1, o2 = _pack3x4(
        _b3utf8(cs[0]), _b3utf8(cs[1]), _b3utf8(cs[2]), _b3utf8(cs[3])
    )
    return jnp.stack([o0, o1, o2], axis=-1).reshape(R, 384), bad


def _rev3_32_kernel(n_ref, x_ref, o_ref, f_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        f_ref[0, 0] = 0

    out, bad = _rev3_32_core(x_ref[...], i, n_ref[0])

    @pl.when(bad)
    def _flag():
        f_ref[0, 0] = 1

    o_ref[...] = out


def uniform3_utf32_to_utf8(x32: jnp.ndarray, n):
    """Pure 3-byte-range UTF-32 -> UTF-8: (R, 512) int32 codepoints in,
    ((R, 384) int32 byte stream, flag); ``n`` = logical codepoints."""
    if not kv.pallas_lowers(
            "uniform3_u32_u8",
            lambda: _rev3_32_pallas(jnp.zeros((RU, 512), jnp.int32), 0)):
        return _xla_driver(_rev3_32_core, x32, n)
    return _rev3_32_pallas(x32, n)


@jax.jit
def _rev3_32_pallas(x32: jnp.ndarray, n):
    grid = x32.shape[0] // RU
    out, flag = pl.pallas_call(
        _rev3_32_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((RU, 512), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((RU, 384), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x32.shape[0], 384), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(jnp.reshape(jnp.asarray(n, jnp.int32), (1,)), x32)
    return out, flag[0, 0]


# --- uniform 4-byte / astral classes (elementwise 1:1 word maps) --------------
#
# The remaining single-width corpus class: astral-only text (emoji streams,
# musical/math symbols, CJK extension blocks). Every representation of one
# supplementary codepoint is exactly 4 bytes — a 4-byte UTF-8 sequence, a
# UTF-16 surrogate pair, or one UTF-32 word — so every direction between
# them is a pure per-int32-word map: no repack, no carry, no compaction.
# (Reference counterpart: the 4-byte arm of the per-arch masked converters,
# e.g. haswell/avx2_convert_utf8_to_utf16.cpp's 2x2-word path; here the
# whole corpus is that arm.) Validity is checked exactly for the class;
# anything else raises the fallback flag.


def _astral_pair(cp, big_endian):
    """Surrogate pair of a supplementary codepoint, packed LE-unit-order."""
    cpp = cp - 0x10000
    hi = _u16unit(0xD800 | (cpp >> 10), big_endian)
    lo = _u16unit(0xDC00 | (cpp & 0x3FF), big_endian)
    return hi | (lo << 16)


def _u8_4byte_cp(w):
    """Decode one 4-byte UTF-8 char from an int32 word (stream order);
    returns (cp, structurally_ok)."""
    lu = jnp.uint32
    b0 = w & 0xFF
    b1 = (w >> 8) & 0xFF
    b2 = (w >> 16) & 0xFF
    b3 = (w.astype(lu) >> 24).astype(jnp.int32) & 0xFF
    cp = ((b0 & 0x07) << 18) | ((b1 & 0x3F) << 12) | \
        ((b2 & 0x3F) << 6) | (b3 & 0x3F)
    ok = (
        ((b0 & 0xF8) == 0xF0)
        & ((b1 & 0xC0) == 0x80)
        & ((b2 & 0xC0) == 0x80)
        & ((b3 & 0xC0) == 0x80)
        & (cp >= 0x10000)
        & (cp <= 0x10FFFF)
    )
    return cp, ok


def _wordmap_kernel(n_ref, x_ref, o_ref, f_ref, *, variant: str,
                    units_per_word: int, big_endian: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        f_ref[0, 0] = 0

    w = x_ref[...]  # (RU, 256) int32: one codepoint per word
    lu = jnp.uint32
    row = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
    widx = ((i * w.shape[0] + row) * 256 + lane) * units_per_word

    if variant in ("u8_to_u16", "u8_to_u32"):
        cp, ok = _u8_4byte_cp(w)
        out = _astral_pair(cp, big_endian) if variant == "u8_to_u16" else cp
    elif variant == "u16pair_to_u32":
        u0, u1 = _units(w, big_endian)
        ok = ((u0 & 0xFC00) == 0xD800) & ((u1 & 0xFC00) == 0xDC00)
        out = 0x10000 + ((u0 & 0x3FF) << 10) + (u1 & 0x3FF)
    else:  # u32 source
        cu = w.astype(lu)
        ok = (cu >= 0x10000) & (cu <= 0x10FFFF)
        if variant == "u32_to_u16pair":
            out = _astral_pair(w, big_endian)
        else:  # u32_to_u8: the 4-byte UTF-8 sequence, stream order
            out = (
                (0xF0 | (w >> 18))
                | ((0x80 | ((w >> 12) & 0x3F)) << 8)
                | ((0x80 | ((w >> 6) & 0x3F)) << 16)
                | ((0x80 | (w & 0x3F)) << 24)
            )

    bad = vany(~(ok | (widx >= n_ref[0])))

    @pl.when(bad)
    def _flag():
        f_ref[0, 0] = 1

    o_ref[...] = out


_WORDMAP_UNITS = {
    "u8_to_u16": 4,  # n in bytes; 4 bytes per word
    "u8_to_u32": 4,
    "u16pair_to_u32": 2,  # n in u16 units; 2 per word
    "u32_to_u16pair": 1,  # n in codepoints
    "u32_to_u8": 1,
}


@functools.partial(jax.jit, static_argnames=("variant", "big_endian"))
def astral_wordmap(x32: jnp.ndarray, n, variant: str,
                   big_endian: bool = False):
    """One codepoint per int32 word in, one int32 word out (see module
    comment). x32: (R, 256), R % RU == 0; ``n`` = logical input length in
    the variant's input units (zero padding never flags). Returns
    ((R, 256) int32 output stream, flag)."""
    grid = x32.shape[0] // RU
    out, flag = pl.pallas_call(
        functools.partial(
            _wordmap_kernel, variant=variant,
            units_per_word=_WORDMAP_UNITS[variant], big_endian=big_endian),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((RU, 256), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((RU, 256), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x32.shape[0], 256), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(jnp.reshape(jnp.asarray(n, jnp.int32), (1,)), x32)
    return out, flag[0, 0]
