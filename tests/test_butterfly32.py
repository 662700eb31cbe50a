"""Butterfly general-path UTF-8 -> UTF-32 transcode (kernels/butterfly32):
byte-per-lane compaction with two half-word candidate planes, run in
Pallas interpret mode on CPU and pinned bit-exact against the golden
scalar machine. Reference behavior mirrored: the utf8->utf32 validating
transcode contract (generic/utf8_to_utf32/utf8_to_utf32.h)."""

import numpy as np
import jax.numpy as jnp
import pytest

import simdutf_tpu.kernels.butterfly32 as kb32
from simdutf_tpu.golden import utf8 as g8


def _run(data: bytes):
    arr = np.frombuffer(data, np.uint8)
    n = max(
        kb32.TILE_B,
        ((len(arr) + kb32.TILE_B - 1) // kb32.TILE_B) * kb32.TILE_B,
    )
    p = np.zeros(n, np.uint8)
    p[: len(arr)] = arr
    out, total, err = kb32.to_utf32_compose(
        jnp.asarray(p), jnp.int32(len(arr))
    )
    return np.asarray(out), int(total), bool(err)


VALID = {
    "mixed": ("ab é 東 \U0001f642 ".encode() * 900),
    "zh_spaces": (("東京は日本 " * 7).encode() * 120),
    "ascii": b"packed ascii! " * 800,
    "emoji": "\U0001f642\U0001f680\U0001f30d".encode() * 900,
    "one_tile_partial": ("aé東\U0001f642".encode() * 500)[: kb32.TILE_B // 2],
    # a 4-byte sequence straddling the tile boundary
    "straddle": b"x" * (kb32.TILE_B - 2) + "\U0001f642é".encode(),
}


@pytest.mark.parametrize("name", sorted(VALID))
def test_butterfly32_valid(name):
    import simdutf_tpu as su

    data = bytes(VALID[name])
    data = data[: su.trim_partial_utf8(data)]
    out, total, err = _run(data)
    res, want = g8.convert_to_utf32_with_errors(
        np.frombuffer(data, np.uint8)
    )
    assert res.is_ok and not err, (name, err, res)
    assert total == len(want), (name, total, len(want))
    assert np.array_equal(out[:total], want), name


@pytest.mark.parametrize(
    "bad",
    [
        b"\xff",  # bad lead
        b"\xc0\xaf",  # overlong 2-byte
        b"\xe0\x80\x80",  # overlong 3-byte
        b"\xed\xa0\x80",  # surrogate
        b"\xf4\x90\x80\x80",  # > U+10FFFF
        b"\xc3",  # truncated 2-byte at EOF
        b"\x80abc",  # orphan continuation at start
        b"a\x80bc",  # orphan continuation after ASCII
        b"\xe2\x98x",  # gap: missing continuation
    ],
)
def test_butterfly32_err_any_fires(bad):
    for prefix in (0, kb32.TILE_B - 2):
        data = b"A" * prefix + bad + b"tail"
        _, _, err = _run(data)
        assert err, (prefix, bad)


def test_butterfly32_empty():
    p = np.zeros(kb32.TILE_B, np.uint8)
    out, total, err = kb32.to_utf32_compose(jnp.asarray(p), jnp.int32(0))
    assert int(total) == 0 and not bool(err)


def test_ops_to_utf32_butterfly_integration(monkeypatch):
    """ops/utf8.to_utf32 with the butterfly engine forced matches the
    scatter engine bit-for-bit, including the exact-error fallback."""
    import simdutf_tpu.ops.utf8 as o8
    from simdutf_tpu.ops import engine_probe as ep

    n = 2 * kb32.TILE_B
    rng = np.random.default_rng(5)
    cps = [0x41, 0xE9, 0x2603, 0x1F642]
    text = "".join(chr(cps[i]) for i in rng.integers(0, 4, 5000))
    data = text.encode()[: n - 9]
    import simdutf_tpu as su

    data = data[: su.trim_partial_utf8(data)]
    p = np.zeros(n, np.uint8)
    p[: len(data)] = np.frombuffer(data, np.uint8)
    args = (jnp.asarray(p), jnp.int32(len(data)))

    monkeypatch.setattr(ep, "_CHOICE32", "scatter")
    want = [np.asarray(x) for x in o8.to_utf32(*args)]
    monkeypatch.setattr(ep, "_CHOICE32", "butterfly")
    got = [np.asarray(x) for x in o8.to_utf32(*args)]
    for w, g in zip(want, got):
        assert np.array_equal(w, g)

    bad = p.copy()
    bad[700] = 0xFF
    args_bad = (jnp.asarray(bad), jnp.int32(len(data)))
    monkeypatch.setattr(ep, "_CHOICE32", "scatter")
    want = [np.asarray(x) for x in o8.to_utf32(*args_bad)]
    monkeypatch.setattr(ep, "_CHOICE32", "butterfly")
    got = [np.asarray(x) for x in o8.to_utf32(*args_bad)]
    for w, g in zip(want, got):
        assert np.array_equal(w, g)
    assert int(want[0]) != 0
