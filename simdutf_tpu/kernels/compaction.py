"""Prototype: in-VMEM stream compaction via lane-gather binary search.

Round-1 discovery: Mosaic lowers dynamic lane gathers
(``jnp.take_along_axis(x, idx, axis=-1)``) on TPU, though not scatters.
That turns the variable-width-output problem (DESIGN-compaction.md) into a
gather formulation::

    out[j] = val[src[j]],   src[j] = searchsorted(inclusive_offsets, j+1)

i.e. each output slot binary-searches the monotone offset array for its
source element — log2(n) vectorized gather steps, no scatter anywhere.

Hardware constraints probed on v5e (2026-08-17):
  * the gather dimension must fit ONE vreg: sources wider than 128 lanes
    fail with "Multiple source vregs along gather dimension";
  * ``take_along_axis`` requires idx.shape == src.shape (no wide-index
    narrow-source form).
So a (R, 512) tile must be processed as four 128-lane windows with a
4-way select-merge; this module holds the windowed primitive (verified on
hardware at W=128; the interpreter covers wider rows).

Round-2 status: the general mixed-script transcode deliberately stays on
the XLA scatter engine — the measured VPU cost of the full in-VMEM
compaction path (scan + log2(W) gather steps + window merge, see
tools/probe_vpu.py ``compact``/``fullpath`` and DESIGN-compaction.md)
exceeds the scatter's cost several-fold on v5e. The primitive is kept
correct and measurement-ready for hardware generations with cheaper
dynamic lane gathers; it is exercised through the registry's
``internal_tests()`` mechanism (kernels/impl.py ``lane_compaction``),
the reference's own pattern for private SIMD helpers
(src/ppc64/implementation.cpp:899-902).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .validate import _interpret, _iotas


def _row_compact(val, keep):
    """Compact each row independently: val, keep: (R, W) int32/bool.
    Returns (out, counts): out[r, j] = j-th kept val of row r (0 beyond),
    counts[r] = kept per row. Pure gather: exclusive scan + binary search.
    ``W`` must be a power of two: the halving binary search only spans
    every index under that precondition.
    """
    R, W = val.shape
    if W & (W - 1):
        raise ValueError(f"row width {W} must be a power of two")
    k = keep.astype(jnp.int32)
    # inclusive prefix sum per row (Hillis-Steele with masked rolls)
    inc = k
    _, lane = _iotas(val.shape)
    shift = 1
    while shift < W:
        rolled = pltpu.roll(inc, shift=shift, axis=1)
        inc = inc + jnp.where(lane >= shift, rolled, 0)
        shift *= 2
    counts = inc[:, W - 1]

    # src[j] = first index i with inc[i] >= j+1  (binary search, gathers)
    target = lane + 1  # (R, W) broadcast of j+1
    lo = jnp.zeros_like(val)
    step = W // 2
    while step >= 1:
        probe = lo + step - 1  # check if inc[probe] < target -> move lo
        pv = jnp.take_along_axis(inc, jnp.minimum(probe, W - 1), axis=1)
        lo = jnp.where(pv < target, lo + step, lo)
        step //= 2
    src = lo  # == searchsorted(inc, j+1, side='left')
    out = jnp.take_along_axis(val, jnp.minimum(src, W - 1), axis=1)
    valid = target <= counts[:, None]
    return jnp.where(valid, out, 0), counts


def _compact_kernel(val_ref, keep_ref, out_ref, cnt_ref):
    out, counts = _row_compact(
        val_ref[...].astype(jnp.int32), keep_ref[...] != 0
    )
    out_ref[...] = out
    cnt_ref[...] = counts[:, None] * jnp.ones((1, 128), jnp.int32)


@jax.jit
def row_compact_pallas(val: jnp.ndarray, keep: jnp.ndarray):
    """(val, keep): (R, W) int32. Returns (compacted (R, W), counts (R,)).

    On real Mosaic the gather dimension is limited to one 128-lane vreg
    (module header: "Multiple source vregs along gather dimension" probed
    on v5e); wider rows are only valid in interpret mode."""
    R, W = val.shape
    if W > 128 and not _interpret():
        raise ValueError(
            f"row width {W} > 128 cannot lower on TPU Mosaic (single-vreg "
            "gather limit); split rows or use the XLA tier")
    out, cnt = pl.pallas_call(
        _compact_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((R, W), jnp.int32),
            jax.ShapeDtypeStruct((R, 128), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(val.astype(jnp.int32), keep.astype(jnp.int32))
    return out, cnt[:, 0]
