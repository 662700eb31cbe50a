"""kernels/shuffle.py: roll+select lane interleaves, vs numpy and vs the
standard kernel paths.

The primitives run inside pallas kernels; here they execute through a
trivial pallas_call (interpret on CPU, Mosaic on TPU) so the exact
in-kernel semantics are what is tested.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from simdutf_tpu.kernels import shuffle as ksh
from simdutf_tpu.kernels import transcode as ktr
from simdutf_tpu.kernels.validate import _interpret


def _run_kernel(fn, args, out_shape):
    """Run fn(*arrays) -> array through a one-block pallas_call."""

    def kernel(*refs):
        *ins, out = refs
        out[...] = fn(*[r[...] for r in ins])

    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
                  for a in args],
        out_specs=pl.BlockSpec(out_shape, lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.int32),
        interpret=_interpret(),
    )(*args)


@pytest.mark.parametrize("L", [128, 256, 512])
@pytest.mark.parametrize("R", [8, 64])
def test_interleave2_matches_numpy(R, L):
    rng = np.random.default_rng(L + R)
    a = rng.integers(0, 2**31, (R, L), dtype=np.int32)
    b = rng.integers(0, 2**31, (R, L), dtype=np.int32)
    got = np.asarray(_run_kernel(
        ksh.interleave2, (jnp.asarray(a), jnp.asarray(b)), (R, 2 * L)))
    want = np.stack([a, b], axis=-1).reshape(R, 2 * L)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("L", [256, 512])
def test_deinterleave2_inverts(L):
    rng = np.random.default_rng(L)
    z = rng.integers(0, 2**31, (8, L), dtype=np.int32)

    def roundtrip(x):
        e, o = ksh.deinterleave2(x)
        return ksh.interleave2(e, o)

    got = np.asarray(_run_kernel(roundtrip, (jnp.asarray(z),), (8, L)))
    np.testing.assert_array_equal(got, z)
    # and the planes themselves are the even/odd lanes
    def evens(x):
        e, o = ksh.deinterleave2(x)
        return jnp.concatenate([e, o], axis=1)

    planes = np.asarray(_run_kernel(evens, (jnp.asarray(z),), (8, L)))
    np.testing.assert_array_equal(planes[:, : L // 2], z[:, 0::2])
    np.testing.assert_array_equal(planes[:, L // 2:], z[:, 1::2])


def test_interleave4_matches_numpy():
    rng = np.random.default_rng(4)
    ps = [rng.integers(0, 2**31, (8, 128), dtype=np.int32)
          for _ in range(4)]
    got = np.asarray(_run_kernel(
        ksh.interleave4, tuple(jnp.asarray(p) for p in ps), (8, 512)))
    want = np.stack(ps, axis=-1).reshape(8, 512)
    np.testing.assert_array_equal(got, want)

    def d4(x):
        a, b, c, d = ksh.deinterleave4(x)
        return jnp.concatenate([a, b, c, d], axis=1)

    back = np.asarray(_run_kernel(d4, (jnp.asarray(want),), (8, 512)))
    for k in range(4):
        np.testing.assert_array_equal(
            back[:, 128 * k: 128 * (k + 1)], want[:, k::4])


@pytest.mark.parametrize("be", [False, True])
def test_bmp_butterfly_matches_standard(be, monkeypatch):
    data = ("École 東京 Привет απλό " * 900).encode("utf-32-le")
    buf = np.zeros(1 << 19, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    x = jnp.asarray(buf.view(np.int32).reshape(-1, 512))
    want_out, want_flag = ktr.bmp_narrow_utf16(x, be)
    monkeypatch.setenv("SIMDUTF_TPU_BUTTERFLY", "1")
    got_out, got_flag = ktr.bmp_narrow_utf16(x, be)
    assert int(want_flag) == int(got_flag) == 0
    np.testing.assert_array_equal(np.asarray(got_out), np.asarray(want_out))

    x16 = jnp.asarray(
        np.asarray(want_out).view(np.int32).reshape(-1, 256))
    monkeypatch.delenv("SIMDUTF_TPU_BUTTERFLY")
    w_out, w_flag = ktr.bmp_widen_utf32(x16, be)
    monkeypatch.setenv("SIMDUTF_TPU_BUTTERFLY", "1")
    g_out, g_flag = ktr.bmp_widen_utf32(x16, be)
    assert int(w_flag) == int(g_flag) == 0
    np.testing.assert_array_equal(np.asarray(g_out), np.asarray(w_out))
    # flag parity on surrogate-poisoned input
    bad = np.asarray(x16).copy()
    # a lone high surrogate in unit0, in the buffer's byte order
    bad[3, 7] = np.int32((0x00D8 if be else 0xD800) | (0x41 << 16))
    _, f1 = ktr.bmp_widen_utf32(jnp.asarray(bad), be)
    monkeypatch.delenv("SIMDUTF_TPU_BUTTERFLY")
    _, f2 = ktr.bmp_widen_utf32(jnp.asarray(bad), be)
    assert int(f1) == int(f2) == 1
