"""Data-parallel execution over a jax Mesh with collective reduction.

Shards run the same single-chip ops (ops/utf8.py) under shard_map; result
structs reduce on-device:
  * first error   = min over shards of (shard_offset + local_error_pos),
    with the error code carried via a paired max-select (mirrors the
    reference's ``result.count`` first-error contract, error.h:34-52,
    lifted from 64-byte blocks to shards)
  * counts        = psum
Collectives ride ICI within a slice (jax inserts them from the shardings).

Multi-host: call ``jax.distributed.initialize()`` before building the mesh
(the runner in tools/dist_run.py does this); everything here is
process-count agnostic because shard_map only sees the mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..ops import utf8 as o8
from ..ops.common import BIG
from .planner import ShardPlan


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _put(plan: ShardPlan, mesh: Mesh, axis: str = "data"):
    sh = NamedSharding(mesh, P(axis))
    shards = jax.device_put(plan.shards, sh)
    lengths = jax.device_put(plan.lengths.astype(np.int32), sh)
    offsets = jax.device_put(plan.offsets.astype(np.int32), sh)
    return shards, lengths, offsets


def validate_utf8_sharded(plan: ShardPlan, mesh: Mesh, axis: str = "data"):
    """Global (err_code, err_pos) for the concatenated corpus; (0, total)
    when valid. One jit-compiled SPMD program; psum/min over ICI."""
    shards, lengths, offsets = _put(plan, mesh, axis)

    @jax.jit
    def step(shards, lengths, offsets):
        def local(shards, lengths, offsets):
            b = shards[0]
            code, pos = o8.validate_with_errors(b, lengths[0])
            bad = code != 0
            gpos = jnp.where(bad, offsets[0] + pos, BIG)
            # min over shards; carry the code of the winning shard
            best = jax.lax.pmin(gpos, axis)
            mycode = jnp.where(gpos == best, code, 0)
            bestcode = jax.lax.pmax(mycode, axis)
            return best[None], bestcode[None]

        f = shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
        )
        gpos, gcode = f(shards, lengths, offsets)
        return gpos[0], gcode[0]

    gpos, gcode = step(shards, lengths, offsets)
    gpos, gcode = int(gpos), int(gcode)
    if gpos == BIG:
        return 0, plan.total
    return gcode, gpos


def transcode_utf8_to_utf16_sharded(
    plan: ShardPlan, mesh: Mesh, axis: str = "data", big_endian: bool = False
):
    """Validating transcode of a sharded corpus.

    Returns (err_code, err_pos_or_total_units, per-shard outputs, per-shard
    unit counts). Shard outputs are left sharded (device-resident); the
    host can gather/concatenate by counts when materializing bytes.
    """
    shards, lengths, offsets = _put(plan, mesh, axis)

    @jax.jit
    def step(shards, lengths, offsets):
        def local(shards, lengths, offsets):
            b = shards[0]
            code, pos, out, out_len = o8.to_utf16(b, lengths[0], big_endian)
            bad = code != 0
            gpos = jnp.where(bad, offsets[0] + pos, BIG)
            best = jax.lax.pmin(gpos, axis)
            mycode = jnp.where(gpos == best, code, 0)
            bestcode = jax.lax.pmax(mycode, axis)
            total_units = jax.lax.psum(out_len, axis)
            return best[None], bestcode[None], total_units[None], out[None], out_len[None]

        f = shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        )
        return f(shards, lengths, offsets)

    gpos, gcode, gunits, outs, out_lens = step(shards, lengths, offsets)
    gpos0, gcode0 = int(gpos[0]), int(gcode[0])
    if gpos0 == BIG:
        return 0, int(gunits[0]), outs, np.asarray(out_lens)
    return gcode0, gpos0, outs, np.asarray(out_lens)


def gather_utf16(outs, out_lens) -> np.ndarray:
    """Materialize sharded transcode outputs into one host uint16 array."""
    outs = np.asarray(outs)
    return np.concatenate(
        [outs[i, : int(out_lens[i])] for i in range(outs.shape[0])]
    )
