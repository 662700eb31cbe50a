"""In-kernel lane shuffles from roll + select only.

The rate-converting kernels need modular lane interleaves/deinterleaves.
The natural spelling — ``x.reshape(R, L, k)`` / ``stack().reshape`` — is a
vector shape cast that the current Mosaic toolchain rejects
(validate.lane_shapecast_supported), so this module builds the k=2 (and
by composition k=4) perfect shuffle out of primitives every toolchain
lowers: static lane rolls (``pltpu.roll``), iota compares, and selects.

Construction: the perfect shuffle of a 2L-lane vector decomposes into
log2(2L)-1 stages of the quarter-swap permutation — within every g-sized
group [A B C D] (quarters of size q=g/4), swap B and C:

    z[q:2q]  <- old C  (comes from lane j+q: roll left by q)
    z[2q:3q] <- old B  (comes from lane j-q: roll right by q)

Each stage is an involution, so the deinterleave applies the same stages
in ascending-g order. Cost: ~6 vector ops x (log2(2L)-1) stages on the
full row — an alternative worth measuring against the XLA drivers in a
healthy window (gated behind SIMDUTF_TPU_BUTTERFLY=1, never the silent
default).

No reference counterpart: simdutf gets lane movement for free from
vpshufb/tbl (e.g. src/haswell/avx2_convert_utf8_to_utf16.cpp); on TPU the
shuffle must be synthesized from rotates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def _quarter_swap(z, g: int):
    """One stage: swap quarters B and C of every g-sized lane group."""
    q = g // 4
    pos = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1) & (g - 1)
    # pltpu.roll requires non-negative shifts; roll(z, s)[j] = z[j - s],
    # so "read lane j+q" is a roll by (width - q)
    from_right = pltpu.roll(z, z.shape[1] - q, 1)  # lane j reads j+q
    from_left = pltpu.roll(z, q, 1)  # lane j reads old lane j-q
    take_c = (pos >= q) & (pos < 2 * q)
    take_b = (pos >= 2 * q) & (pos < 3 * q)
    return jnp.where(take_c, from_right, jnp.where(take_b, from_left, z))


def interleave2(a, b):
    """(R, L) x (R, L) -> (R, 2L) with out[:, 2i] = a[:, i],
    out[:, 2i+1] = b[:, i]."""
    z = jnp.concatenate([a, b], axis=1)
    g = z.shape[1]
    while g >= 4:
        z = _quarter_swap(z, g)
        g //= 2
    return z


def deinterleave2(z):
    """(R, 2L) -> ((R, L) even lanes, (R, L) odd lanes); inverse of
    :func:`interleave2` (each stage is an involution, applied in reverse
    order)."""
    L2 = z.shape[1]
    g = 4
    while g <= L2:
        z = _quarter_swap(z, g)
        g *= 2
    return z[:, : L2 // 2], z[:, L2 // 2:]


def interleave4(p0, p1, p2, p3):
    """Four (R, L) planes -> (R, 4L) with out[:, 4i + k] = pk[:, i]."""
    return interleave2(interleave2(p0, p2), interleave2(p1, p3))


def deinterleave4(z):
    """(R, 4L) -> four (R, L) planes of lanes congruent 0..3 (mod 4)."""
    even, odd = deinterleave2(z)
    p0, p2 = deinterleave2(even)
    p1, p3 = deinterleave2(odd)
    return p0, p1, p2, p3
