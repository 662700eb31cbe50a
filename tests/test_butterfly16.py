"""Butterfly general-path UTF-16 -> UTF-8 transcode (kernels/butterfly16):
the compaction machinery of kernels/butterfly.py applied to the expansion
direction, run in Pallas interpret mode on CPU and pinned bit-exact
against the golden scalar machine — including surrogate pairs straddling
tile boundaries, BE input, and the any-error contract (err_any must fire
on lone surrogates so the caller's exact engine takes over).

Reference behavior mirrored: the utf16->utf8 validating transcode contract
(src/haswell/avx2_convert_utf16_to_utf8.cpp kernels driven by
generic-layer semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

import simdutf_tpu.kernels.butterfly16 as kb16
from simdutf_tpu.golden import utf16 as g16


def _run(units_le: np.ndarray):
    """units_le: native-order uint16 array."""
    n = max(
        kb16.TILE_U,
        ((len(units_le) + kb16.TILE_U - 1) // kb16.TILE_U) * kb16.TILE_U,
    )
    p = np.zeros(n, np.uint16)
    p[: len(units_le)] = units_le
    out, total, err, err_pos, err_code, err_len = kb16.to_utf8_compose(
        jnp.asarray(p), jnp.int32(len(units_le))
    )
    return (np.asarray(out), int(total), bool(err),
            int(err_pos), int(err_code), int(err_len))


def _u(text: str) -> np.ndarray:
    return np.frombuffer(text.encode("utf-16-le"), np.uint16)


VALID = {
    # mixed widths interleaved across >1 tile
    "mixed": _u("ab é 東 \U0001f642 " * 2000),
    # dense CJK with ASCII spaces (no fixed-rate census class)
    "zh_spaces": _u("東京は日本 " * 3000),
    # ASCII-only (1 byte/unit; maximal displacement growth)
    "ascii": _u("packed ascii! " * 1500),
    # astral-heavy (surrogate pairs, 2+2 byte split across the pair)
    "emoji": _u("\U0001f642\U0001f680\U0001f30d" * 3000),
    # 2-byte heavy
    "cyrillic": _u("Привет мир " * 2500),
    # exactly one tile, ending mid-tile
    "one_tile_partial": _u("aé東\U0001f642" * 1000)[: kb16.TILE_U // 2],
    # pair straddling the tile boundary: unit TILE_U-1 is a high surrogate
    "straddle": None,  # built below
}
_s = _u("x" * (kb16.TILE_U - 1) + "\U0001f642" + "tail é 東")
VALID["straddle"] = _s
assert (_s[kb16.TILE_U - 1] & 0xFC00) == 0xD800


@pytest.mark.parametrize("name", sorted(VALID))
def test_butterfly16_valid(name):
    units = VALID[name]
    out, total, err = _run(units)[:3]
    res, want = g16.convert_to_utf8_with_errors(units, False)
    assert res.is_ok and not err, (name, err, res)
    assert total == len(want), (name, total, len(want))
    assert np.array_equal(out[:total], want), name


@pytest.mark.parametrize(
    "bad",
    [
        np.array([0xD800], np.uint16),  # lone high at end
        np.array([0xDC00], np.uint16),  # lone low at start
        np.array([0x41, 0xD800, 0x42], np.uint16),  # high not followed by low
        np.array([0x41, 0xDC00, 0x42], np.uint16),  # low not preceded by high
        np.array([0xD800, 0xD800, 0xDC00], np.uint16),  # high high low
    ],
)
def test_butterfly16_err_any_fires(bad):
    # embed the bad pattern at a tile boundary too; the in-kernel events
    # must reproduce the golden lattice exactly (code, pos, prefix bytes)
    for prefix in (0, kb16.TILE_U - 1):
        units = np.concatenate(
            [np.full(prefix, 0x41, np.uint16), bad,
             np.full(7, 0x42, np.uint16)]
        )
        out, total, err, err_pos, err_code, err_len = _run(units)
        assert err, (prefix, bad)
        res, want = g16.convert_to_utf8_with_errors(units, False)
        assert not res.is_ok
        assert err_pos == res.count, (prefix, bad, err_pos, res.count)
        assert err_code == int(res.error), (prefix, bad)
        assert err_len == len(want), (prefix, bad, err_len, len(want))
        assert np.array_equal(out[:err_len], want), (prefix, bad)


def test_butterfly16_valid_high_low_pairs_no_error():
    units = _u("\U00010000\U0010FFFF" * 64)
    out, total, err = _run(units)[:3]
    assert not err
    _, want = g16.convert_to_utf8_with_errors(units, False)
    assert np.array_equal(out[:total], want)


def test_butterfly16_truncated_pair_is_error():
    # length cuts between high and low: the high becomes lone
    units = _u("\U0001f642" * 8)
    n = kb16.TILE_U
    p = np.zeros(n, np.uint16)
    p[: len(units)] = units
    import jax.numpy as jnp

    r = kb16.to_utf8_compose(jnp.asarray(p), jnp.int32(len(units) - 1))
    assert bool(r[2])
    # the truncated high surrogate is the error position
    assert int(r[3]) == len(units) - 2


def test_butterfly16_empty():
    p = np.zeros(kb16.TILE_U, np.uint16)
    r = kb16.to_utf8_compose(jnp.asarray(p), jnp.int32(0))
    assert int(r[1]) == 0 and not bool(r[2])


def test_butterfly16_every_width_boundary():
    """Codepoints at every UTF-8 width boundary, shuffled, vs golden."""
    cps = [0x1, 0x7F, 0x80, 0x7FF, 0x800, 0xD7FF, 0xE000, 0xFFFF,
           0x10000, 0x10FFFF]
    rng = np.random.default_rng(7)
    text = "".join(chr(cps[i]) for i in rng.integers(0, len(cps), 4000))
    units = _u(text)
    out, total, err = _run(units)[:3]
    res, want = g16.convert_to_utf8_with_errors(units, False)
    assert res.is_ok and not err
    assert total == len(want)
    assert np.array_equal(out[:total], want)


def test_ops_to_utf8_butterfly_integration(monkeypatch):
    """ops/utf16.to_utf8 with the butterfly engine forced matches the
    scatter engine bit-for-bit on valid input, falls back on invalid
    input with identical exact error results, and handles BE."""
    import simdutf_tpu.ops.utf16 as o16
    from simdutf_tpu.ops import engine_probe as ep

    n = 2 * kb16.TILE_U
    rng = np.random.default_rng(3)
    cps = [0x41, 0xE9, 0x2603, 0x1F642]
    text = "".join(chr(cps[i]) for i in rng.integers(0, 4, 6000))
    for be in (False, True):
        enc = text.encode("utf-16-be" if be else "utf-16-le")
        units = np.frombuffer(enc, np.uint16)[: n - 7]
        p = np.zeros(n, np.uint16)
        p[: len(units)] = units
        # avoid splitting a trailing pair
        L = len(units)
        args = (jnp.asarray(p), jnp.int32(L), be)

        monkeypatch.setattr(ep, "_CHOICE16", "scatter")
        want = [np.asarray(x) for x in o16.to_utf8(*args)]
        monkeypatch.setattr(ep, "_CHOICE16", "butterfly")
        got = [np.asarray(x) for x in o16.to_utf8(*args)]
        for w, g in zip(want, got):
            assert np.array_equal(w, g), be

        # invalid input: exact error parity through the fallback
        bad = p.copy()
        bad[100] = 0xDC00 if not be else 0x00DC
        args_bad = (jnp.asarray(bad), jnp.int32(L), be)
        monkeypatch.setattr(ep, "_CHOICE16", "scatter")
        want = [np.asarray(x) for x in o16.to_utf8(*args_bad)]
        monkeypatch.setattr(ep, "_CHOICE16", "butterfly")
        got = [np.asarray(x) for x in o16.to_utf8(*args_bad)]
        for w, g in zip(want, got):
            assert np.array_equal(w, g), be
        assert int(want[0]) != 0  # it IS an error case
