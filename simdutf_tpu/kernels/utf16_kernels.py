"""Pallas UTF-16 kernels: surrogate validation (exact first error),
counting/length reduction, and to_well_formed (U+FFFD repair).

Layout: uint16 units as (BR, 256) tiles (512 bytes/row). The surrogate
algebra needs one unit of lookahead and one of lookback per position
(generic/validate_utf16.h:48-126); both cross-tile carries stream in as
(8, 128) column blocks of the neighboring tiles, so the input array is
padded with one zero tile before and after the data.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..errors import error_code as ec
from ..ops.common import bswap16
from .validate import BIG, BR, _interpret, _iotas

W16 = 256  # units per row
HALO = 128

_SURROGATE = int(ec.SURROGATE)


def _native(x, be: bool):
    w = x.astype(jnp.int32)
    if be:
        w = bswap16(w)
    return w


def _neighbors(w, nxt_halo, prv_halo):
    """(next_w, prev_w) in row-major unit order for a (BR, W16) tile.
    nxt_halo: (8, HALO) first lanes of the row after the tile;
    prv_halo: (8, HALO) *last* lanes of the 8 rows before the tile."""
    _, lane = _iotas(w.shape)
    # next unit
    below_first = jnp.concatenate([w[1:, :HALO], nxt_halo[0:1]], axis=0)
    below = jnp.pad(below_first, ((0, 0), (0, W16 - HALO)))
    nxt = jnp.where(
        lane < W16 - 1,
        pltpu.roll(w, shift=W16 - 1, axis=1),
        pltpu.roll(below, shift=W16 - 1, axis=1),
    )
    # prev unit: above[r] = last unit of row r-1
    above_last = jnp.concatenate(
        [prv_halo[7:8, HALO - 1 :], w[:-1, W16 - 1 :]], axis=0
    )  # (BR, 1)
    prv = jnp.where(
        lane > 0,
        pltpu.roll(w, shift=1, axis=1),
        above_last,  # broadcast over lanes; only lane 0 is selected
    )
    return nxt, prv


def _utf16_kernel(x_ref, nxt_ref, prv_ref, out_ref, *, be: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[0, 0] = BIG
        out_ref[0, 1] = _SURROGATE

    w = _native(x_ref[...], be)
    nxt = _native(nxt_ref[...], be)
    prv = _native(prv_ref[...], be)
    nw, pw = _neighbors(w, nxt, prv)
    is_high = (w & 0xFC00) == 0xD800
    is_low = (w & 0xFC00) == 0xDC00
    next_low = (nw & 0xFC00) == 0xDC00
    prev_high = (pw & 0xFC00) == 0xD800
    bad = (is_high & ~next_low) | (is_low & ~prev_high)
    row, lane = _iotas(w.shape)
    gpos = i * (BR * W16) + row * W16 + lane
    pos = jnp.min(jnp.where(bad, gpos, BIG))

    @pl.when(pos < out_ref[0, 0])
    def _update():
        out_ref[0, 0] = pos


def _wf_kernel(x_ref, nxt_ref, prv_ref, out_ref, *, be: bool):
    w = _native(x_ref[...], be)
    nxt = _native(nxt_ref[...], be)
    prv = _native(prv_ref[...], be)
    nw, pw = _neighbors(w, nxt, prv)
    is_high = (w & 0xFC00) == 0xD800
    is_low = (w & 0xFC00) == 0xDC00
    next_low = (nw & 0xFC00) == 0xDC00
    prev_high = (pw & 0xFC00) == 0xD800
    bad = (is_high & ~next_low) | (is_low & ~prev_high)
    out = jnp.where(bad, 0xFFFD, w)
    if be:
        out = bswap16(out)
    out_ref[...] = out.astype(jnp.uint16)


def _count16_kernel(len_ref, x_ref, out_ref, *, be: bool, what: str):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[0, 0] = 0
        out_ref[0, 1] = 0

    w = _native(x_ref[...], be)
    row, lane = _iotas(w.shape)
    in_r = (i * (BR * W16) + row * W16 + lane) < len_ref[0]
    if what == "count":
        part = jnp.sum((((w & 0xFC00) != 0xDC00) & in_r).astype(jnp.int32))
    else:  # utf8 length (scalar/utf16.h:80-94)
        part = jnp.sum(in_r.astype(jnp.int32))
        part += jnp.sum(((w > 0x7F) & in_r).astype(jnp.int32))
        part += jnp.sum(
            ((((w > 0x7FF) & (w <= 0xD7FF)) | (w >= 0xE000)) & in_r).astype(
                jnp.int32
            )
        )
    out_ref[0, 0] = out_ref[0, 0] + part


def _specs():
    """x, next-halo, prev-halo input specs over an array padded with one
    zero tile before and after the data (tiles at block index i+1)."""
    return [
        pl.BlockSpec((BR, W16), lambda i: (i + 1, 0)),
        pl.BlockSpec((8, HALO), lambda i: ((i + 2) * BR // 8, 0)),
        pl.BlockSpec((8, HALO), lambda i: ((i + 1) * BR // 8 - 1, 1)),
    ]


@functools.partial(jax.jit, static_argnames=("be",))
def utf16_first_bad(x2d: jnp.ndarray, be: bool):
    """x2d: (BR + R + BR, W16) uint16 with zero tiles fore and aft.
    Returns min bad-surrogate position (BIG when valid)."""
    grid = (x2d.shape[0] - 2 * BR) // BR
    out = pl.pallas_call(
        functools.partial(_utf16_kernel, be=be),
        grid=(grid,),
        in_specs=_specs(),
        out_specs=pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
        interpret=_interpret(),
    )(x2d, x2d, x2d)
    return out[0, 0]


@functools.partial(jax.jit, static_argnames=("be",))
def utf16_to_well_formed(x2d: jnp.ndarray, be: bool):
    grid = (x2d.shape[0] - 2 * BR) // BR
    return pl.pallas_call(
        functools.partial(_wf_kernel, be=be),
        grid=(grid,),
        in_specs=_specs(),
        out_specs=pl.BlockSpec((BR, W16), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((grid * BR, W16), jnp.uint16),
        interpret=_interpret(),
    )(x2d, x2d, x2d)


@functools.partial(jax.jit, static_argnames=("be", "what"))
def utf16_reduce(x2d: jnp.ndarray, length, be: bool, what: str):
    grid = (x2d.shape[0] - 2 * BR) // BR
    out = pl.pallas_call(
        functools.partial(_count16_kernel, be=be, what=what),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BR, W16), lambda i: (i + 1, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
        interpret=_interpret(),
    )(jnp.reshape(length, (1,)).astype(jnp.int32), x2d)
    return out[0, 0]
