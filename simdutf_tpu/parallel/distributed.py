"""Data-parallel execution over a jax Mesh with collective reduction.

Shards run the same single-chip ops (ops/utf8.py) under shard_map; result
structs reduce on-device:
  * winning shard  = pmin over shard indices that contain an error, with
    the shard-local error (pos, code) carried by paired pmax-selects; the
    final global byte position is combined on the host in Python ints, so
    corpora beyond 2 GiB never overflow int32 device arithmetic
  * counts         = psum
This preserves the reference's ``result.count`` first-error contract
(error.h:34-52) lifted from 64-byte blocks to shards. Collectives ride ICI
within a slice (jax inserts them from the shardings).

The SPMD step functions are built once per (mesh, axis) and cached —
rebuilding a jit closure per call would retrace and recompile every time.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh
(tools/dist_run.py does this); everything here is process-count agnostic
because shard_map only sees the mesh.
"""

from __future__ import annotations

import functools

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


def stage(plan: ShardPlan, mesh: Mesh, axis: str = "data"):
    """Place shards + lengths on the mesh (one transfer; reuse across
    calls when timing or re-running)."""
    sh = NamedSharding(mesh, P(axis))
    shards = jax.device_put(plan.shards, sh)
    lengths = jax.device_put(plan.lengths.astype(np.int32), sh)
    return shards, lengths


def _local_reduce(code, pos, out_len, axis):
    """Reduce shard-local results to (winner shard idx, its pos/code,
    total units). All int32-safe: positions stay shard-local."""
    my_idx = jax.lax.axis_index(axis).astype(jnp.int32)
    bad = code != 0
    key = jnp.where(bad, my_idx, BIG)
    win = jax.lax.pmin(key, axis)
    mine = win == my_idx
    win_pos = jax.lax.pmax(jnp.where(mine, pos, -1), axis)
    win_code = jax.lax.pmax(jnp.where(mine, code, 0), axis)
    total = jax.lax.psum(out_len, axis)
    return win, win_pos, win_code, total


@functools.lru_cache(maxsize=16)
def _validate_step(mesh: Mesh, axis: str):
    def local(shards, lengths):
        code, pos = o8.validate_with_errors(shards[0], lengths[0])
        win, wpos, wcode, _ = _local_reduce(code, pos, jnp.int32(0), axis)
        return win[None], wpos[None], wcode[None]

    f = shard_map(
        local, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
    )

    @jax.jit
    def step(shards, lengths):
        win, wpos, wcode = f(shards, lengths)
        return win[0], wpos[0], wcode[0]

    return step


@functools.lru_cache(maxsize=16)
def _transcode_step(mesh: Mesh, axis: str, big_endian: bool):
    def local(shards, lengths):
        code, pos, out, out_len = o8.to_utf16(shards[0], lengths[0], big_endian)
        win, wpos, wcode, total = _local_reduce(code, pos, out_len, axis)
        return win[None], wpos[None], wcode[None], total[None], out[None], out_len[None]

    f = shard_map(
        local, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=(P(axis),) * 4 + (P(axis), P(axis)),
    )

    @jax.jit
    def step(shards, lengths):
        win, wpos, wcode, total, outs, out_lens = f(shards, lengths)
        return win[0], wpos[0], wcode[0], total[0], outs, out_lens

    return step


def _combine(plan: ShardPlan, win: int, wpos: int, wcode: int):
    """Host-side int64-exact global first-error position."""
    if win == BIG:
        return 0, None
    return wcode, int(plan.offsets[win]) + wpos


def validate_utf8_sharded(
    plan: ShardPlan, mesh: Mesh, axis: str = "data", staged=None
):
    """Global (err_code, err_pos) for the concatenated corpus; (0, total)
    when valid. Pass ``staged = stage(plan, mesh)`` to reuse device
    placement across calls."""
    shards, lengths = staged if staged is not None else stage(plan, mesh, axis)
    win, wpos, wcode = (int(x) for x in _validate_step(mesh, axis)(shards, lengths))
    code, pos = _combine(plan, win, wpos, wcode)
    if code == 0:
        return 0, plan.total
    return code, pos


def transcode_utf8_to_utf16_sharded(
    plan: ShardPlan,
    mesh: Mesh,
    axis: str = "data",
    big_endian: bool = False,
    staged=None,
):
    """Validating transcode of a sharded corpus.

    Returns (err_code, err_pos_or_total_units, per-shard outputs, per-shard
    unit counts). Shard outputs stay sharded (device-resident); materialize
    with :func:`gather_utf16`.
    """
    shards, lengths = staged if staged is not None else stage(plan, mesh, axis)
    win, wpos, wcode, total, outs, out_lens = _transcode_step(
        mesh, axis, big_endian
    )(shards, lengths)
    code, pos = _combine(plan, int(win), int(wpos), int(wcode))
    if code == 0:
        return 0, int(total), outs, np.asarray(out_lens)
    return code, pos, outs, np.asarray(out_lens)


def gather_utf16(outs, out_lens) -> np.ndarray:
    """Materialize sharded transcode outputs into one host uint16 array."""
    outs = np.asarray(outs)
    return np.concatenate(
        [outs[i, : int(out_lens[i])] for i in range(outs.shape[0])]
    )
