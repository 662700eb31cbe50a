"""Parity of the kernels' XLA drivers vs their Pallas paths.

The rate-converting kernels need lane shape casts that some Mosaic
toolchains reject (kernels/validate.lane_shapecast_supported); on those
backends the public wrappers route to jitted XLA drivers running the SAME
core function over the whole array. This suite pins the two paths
bit-identical (out and flag) so the capability dispatch can never change
results — the analog of the reference running one test body per
implementation (tests/helpers/test.cpp).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from simdutf_tpu.kernels import base64_kernel as kb64
from simdutf_tpu.kernels import transcode as ktr


def _arr32(data: bytes, lanes: int, rows_mult: int):
    """Zero-pad ``data`` into an (R, lanes) int32 view, R a multiple of
    rows_mult."""
    per_row = lanes * 4
    rows = max(rows_mult, -(-len(data) // per_row))
    rows = -(-rows // rows_mult) * rows_mult
    buf = np.zeros(rows * per_row, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    return jnp.asarray(buf.view(np.int32).reshape(rows, lanes))


def _arr16(data: bytes, rows_mult: int):
    per_row = 512
    rows = max(rows_mult, -(-len(data) // per_row))
    rows = -(-rows // rows_mult) * rows_mult
    buf = np.zeros(rows * per_row, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    return jnp.asarray(buf.view(np.int16).reshape(rows, 256))


def _check(pallas_res, xla_res):
    if isinstance(pallas_res, tuple):
        p_out, p_flag = pallas_res
        x_out, x_flag = xla_res
        assert int(p_flag) == int(x_flag)
        if int(p_flag) == 0:  # flagged outputs are unspecified
            np.testing.assert_array_equal(np.asarray(p_out), np.asarray(x_out))
    else:
        np.testing.assert_array_equal(
            np.asarray(pallas_res), np.asarray(xla_res))


CJK = "東京は日本の首都です。" * 200  # pure 3-byte
CYR = "привеммир" * 300  # pure 2-byte
BMP16 = (CJK + CYR).encode("utf-16-le")
BAD3 = CJK.encode()[:-1] + b"\xff"


@pytest.mark.parametrize("be", [False, True])
def test_uniform3_utf8_to_utf16(be):
    for data in (CJK.encode(), BAD3):
        x = _arr32(data, 384, ktr.RU)
        n = len(data) // 3 * 3
        _check(
            ktr._uniform3_pallas(x, n, be),
            ktr._xla_driver(ktr._uniform3_core, x, n, be),
        )


@pytest.mark.parametrize("be", [False, True])
def test_uniform3_utf16_to_utf8(be):
    data = CJK.encode("utf-16-be" if be else "utf-16-le")
    x = _arr32(data, 256, ktr.RU)
    _check(
        ktr._rev3_pallas(x, len(data) // 2, be),
        ktr._xla_driver(ktr._rev3_core, x, len(data) // 2, be),
    )


def test_latin1_widen_utf32():
    data = bytes(range(256)) * 17
    x = _arr16(data, ktr.RU)
    _check(ktr._l1_32_pallas(x), ktr._l1_32_xla(x))


@pytest.mark.parametrize("be", [False, True])
def test_bmp_widen_utf32(be):
    data = (CJK + CYR).encode("utf-16-be" if be else "utf-16-le")
    x = _arr32(data, 256, ktr.RU)
    _check(
        ktr._bmp_widen_pallas(x, be),
        ktr._xla_driver(ktr._bmp_widen_core, x, 0, be),
    )


@pytest.mark.parametrize("be", [False, True])
def test_bmp_narrow_utf16(be):
    data = (CJK + CYR).encode("utf-32-le")
    x = _arr32(data, 512, ktr.RU)
    _check(
        ktr._bmp_narrow_pallas(x, be),
        ktr._xla_driver(ktr._bmp_narrow_core, x, 0, be),
    )


def test_uniform2_utf8_to_utf32():
    data = CYR.encode()
    x = _arr32(data, 256, ktr.RU)
    _check(
        ktr._u2_32_pallas(x, len(data)),
        ktr._xla_driver(ktr._u2_32_core, x, len(data)),
    )


def test_uniform2_utf32_to_utf8():
    data = CYR.encode("utf-32-le")
    x = _arr32(data, 512, ktr.RU)
    n = len(data) // 4
    _check(
        ktr._rev2_32_pallas(x, n),
        ktr._xla_driver(ktr._rev2_32_core, x, n),
    )


def test_uniform3_utf8_to_utf32():
    data = CJK.encode()
    x = _arr32(data, 384, ktr.RU)
    _check(
        ktr._u3_32_pallas(x, len(data)),
        ktr._xla_driver(ktr._u3_32_core, x, len(data)),
    )


def test_uniform3_utf32_to_utf8():
    data = CJK.encode("utf-32-le")
    x = _arr32(data, 512, ktr.RU)
    n = len(data) // 4
    _check(
        ktr._rev3_32_pallas(x, n),
        ktr._xla_driver(ktr._rev3_32_core, x, n),
    )


@pytest.mark.parametrize("url,both", [(False, False), (True, False),
                                      (False, True)])
def test_clean_decode(url, both):
    import base64 as pyb64

    raw = bytes(range(256)) * 24
    chars = pyb64.urlsafe_b64encode(raw) if url else pyb64.b64encode(raw)
    x = _arr32(chars, 512, kb64.RB)
    n = len(chars) // 4
    _check(
        kb64._clean_decode_pallas(x, n, url, both),
        kb64.xla_driver(kb64._decode_core, x, n, url, both),
    )
    # dirty input must flag on both paths
    dirty = bytearray(chars)
    dirty[100] = ord(" ")
    xd = _arr32(bytes(dirty), 512, kb64.RB)
    p = kb64._clean_decode_pallas(xd, n, url, both)
    q = kb64.xla_driver(kb64._decode_core, xd, n, url, both)
    assert int(p[1]) == 1 and int(q[1]) == 1


@pytest.mark.parametrize("url", [False, True])
def test_block_encode(url):
    raw = bytes(range(256)) * 18
    x = _arr32(raw, 384, kb64.RB)
    _check(kb64._block_encode_pallas(x, url), kb64._encode_xla(url)(x))
