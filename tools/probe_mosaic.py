#!/usr/bin/env python
"""Probe which Mosaic idioms the CURRENT toolchain lowers (the toolchain
drifts; kernels/validate.py already capability-dispatches on one probe).
Checks the primitives the butterfly general-path transcode needs:
  static pltpu.roll, dynamic-shift pltpu.roll, scalar-prefetch-driven
  index maps, output-block revisiting with read-modify-write.
"""
import functools
import sys

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def try_one(name, fn):
    try:
        fn()
        log(f"{name:34s}: OK")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        log(f"{name:34s}: FAIL {msg}")
        return False


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, W = 8, 512
    x = jnp.arange(R * W, dtype=jnp.int32).reshape(R, W)

    def static_roll():
        def k(xr, yr):
            yr[:] = pltpu.roll(xr[:], 5, 1)

        y = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((R, W), jnp.int32)
        )(x)
        got = np.asarray(y)
        want = np.roll(np.asarray(x), 5, 1)
        assert np.array_equal(got, want), got[0, :8]

    def static_roll_sublane():
        def k(xr, yr):
            yr[:] = pltpu.roll(xr[:], 3, 0)

        y = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((R, W), jnp.int32)
        )(x)
        assert np.array_equal(np.asarray(y), np.roll(np.asarray(x), 3, 0))

    def dynamic_roll():
        def k(sr, xr, yr):
            yr[:] = pltpu.roll(xr[:], sr[0], 1)

        s = jnp.array([7], jnp.int32)
        y = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((R, W), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY)
                if False
                else pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(s, x)
        assert np.array_equal(np.asarray(y), np.roll(np.asarray(x), 7, 1))

    def butterfly_round():
        # one conditional-move-left round: the butterfly's inner op
        def k(xr, dr, yr, er):
            xv, dv = xr[:], dr[:]
            take = (dv & 4) != 0
            moved_x = pltpu.roll(xv, W - 4, 1)
            moved_t = pltpu.roll(take, W - 4, 1)
            yr[:] = jnp.where(moved_t, moved_x, xv)
            er[:] = jnp.where(moved_t, pltpu.roll(dv, W - 4, 1) - 4, dv)

        d = (jnp.arange(R * W, dtype=jnp.int32).reshape(R, W)) & 7
        y, e = pl.pallas_call(
            k,
            out_shape=(
                jax.ShapeDtypeStruct((R, W), jnp.int32),
                jax.ShapeDtypeStruct((R, W), jnp.int32),
            ),
        )(x, d)
        np.asarray(y), np.asarray(e)

    def scalar_prefetch_indexmap():
        # block index chosen by a prefetched scalar array
        T = 4
        xb = jnp.arange(T * R * W, dtype=jnp.int32).reshape(T * R, W)
        order = jnp.array([2, 0, 3, 1], jnp.int32)

        def k(ord_ref, xr, yr):
            yr[:] = xr[:] + 1

        grid = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T,),
            in_specs=[pl.BlockSpec((R, W), lambda i, ord_ref: (ord_ref[i], 0))],
            out_specs=pl.BlockSpec((R, W), lambda i, ord_ref: (i, 0)),
        )
        y = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((T * R, W), jnp.int32),
            grid_spec=grid,
        )(order, xb)
        got = np.asarray(y)
        want = np.concatenate(
            [np.asarray(xb)[int(o) * R : (int(o) + 1) * R] + 1 for o in order]
        )
        assert np.array_equal(got, want)

    def revisit_accumulate():
        # two consecutive grid steps write disjoint halves of one block
        T = 4

        def k(xr, yr):
            h = pl.program_id(0) % 2
            pos = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
            mask = (pos < W // 2) == (h == 0)
            upd = jnp.where(mask, xr[:], yr[:])
            yr[:] = upd

        y = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((2 * R, W), jnp.int32),
            grid=(T,),
            in_specs=[pl.BlockSpec((R, W), lambda i: (i // 2, 0))],
            out_specs=pl.BlockSpec((R, W), lambda i: (i // 2, 0)),
        )(x.repeat(2, 0).reshape(2 * R, W))
        np.asarray(y)

    def dyn_slice_vmem():
        # dynamic slice of a VMEM vector by an SMEM scalar
        def k(sr, xr, yr):
            yr[:] = pl.load(xr, (slice(None), pl.ds(sr[0], 128)))

        s = jnp.array([64], jnp.int32)
        y = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(s, x)
        assert np.array_equal(np.asarray(y), np.asarray(x)[:, 64:192])

    results = {}
    for name, fn in [
        ("static lane roll", static_roll),
        ("static sublane roll", static_roll_sublane),
        ("dynamic lane roll (SMEM scalar)", dynamic_roll),
        ("butterfly round (roll+select)", butterfly_round),
        ("scalar-prefetch index map", scalar_prefetch_indexmap),
        ("output revisit accumulate", revisit_accumulate),
        ("dynamic lane slice", dyn_slice_vmem),
    ]:
        results[name] = try_one(name, fn)
    print({k: v for k, v in results.items()})


if __name__ == "__main__":
    main()
