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

from .validate import BR, _interpret

W16 = 256  # int16 lanes per row (512 bytes)
_I16_HIGH = -32640  # 0x8080 as int16 (plain int: never a device constant)


def _widen_kernel(x_ref, out_ref, flag_ref, *, big_endian: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        flag_ref[0, 0] = 0

    h = x_ref[...]  # (BR, 256) int16: 2 input bytes per lane
    nonascii = jnp.any((h & _I16_HIGH) != 0)

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
        non = jnp.any((w & (-2130738945)) != 0)  # ~0x7F007F00
        packed = ((w >> 8) & 0x7F) | (((w >> 24) & 0x7F) << 8)
    else:
        non = jnp.any((w & (-8355712)) != 0)  # 0xFF80FF80
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
