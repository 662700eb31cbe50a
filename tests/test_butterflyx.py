"""The remaining variable-rate butterfly directions (kernels/butterflyx):
UTF-32 -> UTF-8, UTF-32 -> UTF-16, UTF-16 -> UTF-32 and Latin-1 -> UTF-8,
run in Pallas interpret mode on CPU, pinned bit-exact against the golden
scalar machine, plus ops-level engine A/B parity incl. exact error
fallbacks. Reference counterparts: per-arch utf32/latin1 convert kernels
(e.g. src/westmere/sse_convert_utf32_to_utf8.cpp, scalar/latin1_to_utf8)."""

import numpy as np
import jax.numpy as jnp
import pytest

import simdutf_tpu.kernels.butterflyx as kbx
from simdutf_tpu.golden import latin1 as gl1
from simdutf_tpu.golden import utf16 as g16
from simdutf_tpu.golden import utf32 as g32

N = 2 * kbx.TILE_E
MIXED = "a é 東 \U0001f642 Привет ё " * 900


def _pad(arr, dtype):
    p = np.zeros(N, dtype)
    p[: len(arr)] = arr
    return jnp.asarray(p), jnp.int32(len(arr))


def _u32(text):
    return np.frombuffer(text.encode("utf-32-le"), np.uint32)


def _u16(text):
    return np.frombuffer(text.encode("utf-16-le"), np.uint16)


def test_u32_to_utf8_matches_golden():
    words = _u32(MIXED)[: N - 5]
    x, L = _pad(words, np.uint32)
    out, total, err = kbx.u32_to_utf8_compose(x, L)
    res, want = g32.convert_to_utf8_with_errors(words)
    assert res.is_ok and not bool(err)
    assert int(total) == len(want)
    assert np.array_equal(np.asarray(out)[: len(want)], want)


@pytest.mark.parametrize("bad", [0xD800, 0xDFFF, 0x110000, 0xFFFFFFFF])
def test_u32_to_utf8_err_fires(bad):
    words = _u32("abcé東")
    w = np.concatenate([words, [bad], words]).astype(np.uint32)
    x, L = _pad(w, np.uint32)
    _, _, err = kbx.u32_to_utf8_compose(x, L)
    assert bool(err), hex(bad)


@pytest.mark.parametrize("be", [False, True])
def test_u32_to_utf16_matches_golden(be):
    words = _u32(MIXED)[: N - 3]
    x, L = _pad(words, np.uint32)
    out, total, err = kbx.u32_to_utf16_compose(x, L, be)
    res, want = g32.convert_to_utf16_with_errors(words, be)
    assert res.is_ok and not bool(err)
    assert int(total) == len(want)
    assert np.array_equal(np.asarray(out)[: len(want)], want)


def test_u16_to_utf32_matches_golden():
    units = _u16(MIXED)[: N - 7]
    if (units[-1] & 0xFC00) == 0xD800:
        units = units[:-1]
    x, L = _pad(units, np.uint16)
    out, total, err = kbx.u16_to_utf32_compose(x, L)
    res, want = g16.convert_to_utf32_with_errors(units, False)
    assert res.is_ok and not bool(err)
    assert int(total) == len(want)
    assert np.array_equal(np.asarray(out)[: len(want)], want)


def test_u16_to_utf32_pair_straddles_tile():
    units = np.concatenate([
        np.full(kbx.TILE_E - 1, 0x41, np.uint16),
        _u16("\U0001f642é東"),
    ])
    assert (units[kbx.TILE_E - 1] & 0xFC00) == 0xD800
    x, L = _pad(units, np.uint16)
    out, total, err = kbx.u16_to_utf32_compose(x, L)
    res, want = g16.convert_to_utf32_with_errors(units, False)
    assert res.is_ok and not bool(err)
    assert np.array_equal(np.asarray(out)[: int(total)], want)


@pytest.mark.parametrize("bad", [[0xD800, 0x41], [0xDC00], [0xD800]])
def test_u16_to_utf32_err_fires(bad):
    units = np.concatenate([
        np.full(17, 0x42, np.uint16),
        np.array(bad, np.uint16),
    ])
    x, L = _pad(units, np.uint16)
    _, _, err = kbx.u16_to_utf32_compose(x, L)
    assert bool(err), bad


def test_latin1_to_utf8_matches_golden():
    b = (bytes(range(256)) * 70)[: N - 11]
    arr = np.frombuffer(b, np.uint8)
    x, L = _pad(arr, np.uint8)
    out, total = kbx.latin1_to_utf8_compose(x, L)
    want = gl1.convert_to_utf8(arr)
    assert int(total) == len(want)
    assert np.array_equal(np.asarray(out)[: len(want)], want)


def test_ops_integration_engine_parity(monkeypatch):
    """Every routed op matches its scatter engine bit-for-bit with the
    butterfly forced (valid + invalid inputs, exact error parity)."""
    import simdutf_tpu.ops.latin1 as ol1
    import simdutf_tpu.ops.utf16 as o16
    import simdutf_tpu.ops.utf32 as o32

    u32w = _u32(MIXED)[: N - 5]
    u16w = _u16(MIXED)[: N - 6]
    if (u16w[-1] & 0xFC00) == 0xD800:
        u16w = u16w[:-1]
    l1b = np.frombuffer((bytes(range(256)) * 70)[: N - 3], np.uint8)

    cases = []
    x32, L32 = _pad(u32w, np.uint32)
    cases.append(("u32_to_u8", lambda: o32.to_utf8(x32, L32)))
    cases.append(("u32_to_u16", lambda: o32.to_utf16(x32, L32, False)))
    bad32 = u32w.copy(); bad32[100] = 0xD805
    xb32, Lb32 = _pad(bad32, np.uint32)
    cases.append(("u32_to_u8", lambda: o32.to_utf8(xb32, Lb32)))
    cases.append(("u32_to_u16", lambda: o32.to_utf16(xb32, Lb32, True)))
    x16, L16 = _pad(u16w, np.uint16)
    cases.append(("u16_to_u32", lambda: o16.to_utf32(x16, L16, False)))
    bad16 = u16w.copy(); bad16[50] = 0xDC00
    xb16, Lb16 = _pad(bad16, np.uint16)
    cases.append(("u16_to_u32", lambda: o16.to_utf32(xb16, Lb16, False)))
    xl1, Ll1 = _pad(l1b, np.uint8)
    cases.append(("l1_to_u8", lambda: ol1.to_utf8(xl1, Ll1)))

    for name, f in cases:
        monkeypatch.setenv("SIMDUTF_TPU_GENERAL_ENGINE", "scatter")
        want = [np.asarray(v) for v in f()]
        monkeypatch.setenv("SIMDUTF_TPU_GENERAL_ENGINE", "butterfly")
        got = [np.asarray(v) for v in f()]
        for i, (w, g) in enumerate(zip(want, got)):
            assert np.array_equal(w, g), (name, i)
