"""Butterfly general-path transcode (kernels/butterfly): per-tile
log-shift concentration + roll-composed output, DESIGN-compaction.md
Design B. These tests run the full two-phase pipeline in Pallas interpret
mode on CPU and pin bit-exactness against the golden scalar machine,
including cross-tile sequence straddles, BE output, and the any-error
contract (err_any must fire so the caller's exact fallback engages).

Reference behavior mirrored: the validating transcode contract of
generic/utf8_to_utf16/utf8_to_utf16.h:217-322.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import simdutf_tpu.kernels.butterfly as kb
from simdutf_tpu.golden import utf8 as g8


def _run(data: bytes, be=False):
    arr = np.frombuffer(data, np.uint8)
    n = max(kb.TILE, ((len(arr) + kb.TILE - 1) // kb.TILE) * kb.TILE)
    p = np.zeros(n, np.uint8)
    p[: len(arr)] = arr
    out, total, err, err_pos, err_code, err_len = kb.to_utf16_compose(
        jnp.asarray(p), jnp.int32(len(arr)), be
    )
    return (np.asarray(out), int(total), bool(err),
            int(err_pos), int(err_code), int(err_len))


VALID = {
    # tile-straddling mixed text (2 tiles): every class interleaved
    "mixed": ("ab é 東 \U0001f642 ".encode() * 2400),
    # dense CJK with ASCII spaces — the realistic wikipedia class that no
    # fixed-rate census branch covers (the butterfly's home turf)
    "zh_spaces": (("東京は日本 " * 7).encode() * 380),
    # ASCII-only (all-keep: displacement stays 0 through every round)
    "ascii": b"packed ascii! " * 2500,
    # astral-heavy
    "emoji": "\U0001f642\U0001f680\U0001f30d".encode() * 3000,
    # exactly one tile, ending mid-tile
    "one_tile_partial": ("aé東\U0001f642".encode() * 2000)[: kb.TILE // 2],
    # per-TILE ascii shortcut: ascii tile / CJK tile / ascii tile, with a
    # 3-byte sequence straddling the ascii->CJK boundary (the shortcut's
    # straddle guard must route tile 1 to the full path) and a multibyte
    # char in the last 512 bytes of tile 1 (disqualifies tile 2's guard)
    "tile_granular_mix": (
        b"a" * (kb.TILE - 2) + "東".encode()  # straddles into tile 1
        + "京は日本".encode() * 2340  # CJK tile
    )[: 2 * kb.TILE - 200] + "é".encode() + b"z" * kb.TILE,
}


@pytest.mark.parametrize("name", sorted(VALID))
@pytest.mark.parametrize("be", [False, True])
def test_butterfly_valid(name, be):
    import simdutf_tpu as su

    data = bytes(VALID[name])
    data = data[: su.trim_partial_utf8(data)]
    out, total, err = _run(data, be)[:3]
    res, want = g8.convert_to_utf16_with_errors(
        np.frombuffer(data, np.uint8), be
    )
    assert res.is_ok and not err, (name, err, res)
    assert total == len(want)
    assert np.array_equal(out[:total], want), name


@pytest.mark.parametrize(
    "name,data",
    [
        ("orphan_cont", b"ok " + b"\x80" + b"x" * 40000),
        ("overlong", b"a" * 33000 + b"\xc0\xaf" + b"b" * 100),
        ("surrogate_enc", b"a" * 40000 + b"\xed\xa0\x80"),
        ("truncated_tail", b"a" * 40000 + "東".encode()[:2]),
        ("start_cont", b"\xbf" + b"a" * 40000),
        ("bad_header", b"a" * 100 + b"\xff" + b"a" * 40000),
    ],
)
def test_butterfly_flags_errors(name, data):
    """In-kernel error events must reproduce the XLA lattice exactly:
    same code, same position, same valid-prefix unit count."""
    out, total, err, err_pos, err_code, err_len = _run(bytes(data))
    assert err, name
    res, want = g8.convert_to_utf16_with_errors(
        np.frombuffer(bytes(data), np.uint8), False
    )
    assert not res.is_ok
    assert err_pos == res.count, (name, err_pos, res.count)
    assert err_code == int(res.error), (name, err_code, res.error)
    assert err_len == len(want), (name, err_len, len(want))
    assert np.array_equal(out[:err_len], want), name


def test_butterfly_cross_tile_straddle():
    """A 4-byte sequence whose lead is the last byte of tile 0."""
    head = b"a" * (kb.TILE - 1)
    for ch in ("\U0001f642", "東", "é"):
        data = head[: kb.TILE - 1] + ch.encode() + b"tail"
        out, total, err = _run(data)[:3]
        res, want = g8.convert_to_utf16_with_errors(
            np.frombuffer(data, np.uint8), False
        )
        assert not err and total == len(want)
        assert np.array_equal(out[:total], want), ch


def test_stage_rule_exhaustive_small():
    """The numpy model of the LSB-first conditional-move-left rule on
    adversarial keep patterns (the congestion-freedom theorem for
    monotone displacements, exercised rather than assumed)."""
    rng = np.random.default_rng(0)
    for trial in range(400):
        T = int(rng.choice([16, 64, 256]))
        keep = rng.random(T) < rng.random()
        if trial % 7 == 0:
            keep[:] = True
        if trial % 11 == 0:
            keep[:] = False
        val = rng.integers(1, 0xFFFF, T).astype(np.int64)
        off = np.cumsum(keep) - keep
        disp = np.where(keep, np.arange(T) - off, 0).astype(np.int64)
        word = (val & 0xFFFF) | (disp << 16)
        k = 1
        while k < T:
            moved = np.roll(word, -k)
            take = ((moved >> 16) & k) != 0
            word = np.where(take, moved - (k << 16), word)
            k <<= 1
        count = int(keep.sum())
        assert np.array_equal((word & 0xFFFF)[:count], val[keep]), trial


def test_engine_probe_cpu_defaults_scatter(monkeypatch):
    """Off-TPU the general engine is always the scatter engine; env pins
    override the probe (the SIMDUTF_TPU_FORCE_IMPLEMENTATION idea at
    engine granularity, src/implementation.cpp:1294)."""
    from simdutf_tpu.ops import engine_probe as ep

    monkeypatch.setattr(ep, "_CHOICE", None)
    monkeypatch.delenv("SIMDUTF_TPU_GENERAL_ENGINE", raising=False)
    assert ep.general_engine() == "scatter"
    monkeypatch.setattr(ep, "_CHOICE", None)
    monkeypatch.setenv("SIMDUTF_TPU_GENERAL_ENGINE", "butterfly")
    assert ep.general_engine() == "butterfly"
    monkeypatch.setattr(ep, "_CHOICE", None)
    monkeypatch.setenv("SIMDUTF_TPU_GENERAL_ENGINE", "scatter")
    assert ep.general_engine() == "scatter"
    monkeypatch.setattr(ep, "_CHOICE", None)


def test_butterfly_error_positions_at_boundaries():
    """Inject every error kind at positions around tile boundaries and
    verify exact (code, pos, prefix-units) parity with the golden machine
    — the in-kernel event lattice's adversarial sweep."""
    base = ("ab é 東 \U0001f642 ".encode() * 8000)[: 3 * kb.TILE]
    import simdutf_tpu as su

    base = bytearray(base[: su.trim_partial_utf8(base)])
    # snap injection sites to codepoint starts near interesting offsets
    sites = []
    for target in (0, 5, kb.TILE - 3, kb.TILE - 1, kb.TILE, kb.TILE + 2,
                   2 * kb.TILE - 2, len(base) - 5):
        j = min(target, len(base) - 5)
        while base[j] & 0xC0 == 0x80:
            j -= 1
        sites.append(j)
    injections = [b"\x80", b"\xff", b"\xc0\xaf", b"\xed\xa0\x80",
                  b"\xf4\x90\x80\x80", b"\xc3"]
    for j in sorted(set(sites)):
        for inj in injections:
            data = bytes(base[:j]) + inj + bytes(base[j:])
            out, total, err, err_pos, err_code, err_len = _run(data)
            res, want = g8.convert_to_utf16_with_errors(
                np.frombuffer(data, np.uint8), False
            )
            if res.is_ok:
                continue  # injection happened to stay valid
            assert err, (j, inj)
            assert err_pos == res.count, (j, inj, err_pos, res.count)
            assert err_code == int(res.error), (j, inj)
            assert err_len == len(want), (j, inj, err_len, len(want))
            assert np.array_equal(out[:err_len], want), (j, inj)


# --- census-pruned kernel variants (round 5) -------------------------------

def _run_pruned(data: bytes, no_l2: bool, no_l4: bool, be=False):
    arr = np.frombuffer(data, np.uint8)
    n = max(kb.TILE, ((len(arr) + kb.TILE - 1) // kb.TILE) * kb.TILE)
    p = np.zeros(n, np.uint8)
    p[: len(arr)] = arr
    out, total, err, err_pos, err_code, err_len = kb.to_utf16_compose(
        jnp.asarray(p), jnp.int32(len(arr)), be, no_l2, no_l4
    )
    return (np.asarray(out), int(total), bool(err),
            int(err_pos), int(err_code), int(err_len))


PRUNED_CORPORA = {
    # (corpus, no_l2 legal?, no_l4 legal?)
    "zh_spaces": (("東京は日本 " * 7).encode() * 380, True, True),
    "bmp_mixed": ("aé東京 й ".encode() * 2400, False, True),
    "ascii_only": (b"plain ascii corpus " * 4000, True, True),
}


@pytest.mark.parametrize("name", sorted(PRUNED_CORPORA))
@pytest.mark.parametrize("be", [False, True])
def test_pruned_variants_match_full(name, be):
    """A pruned kernel variant must be bit-identical to the full kernel
    on any corpus its census predicate admits (the pruned terms are
    all-false there by construction)."""
    import simdutf_tpu as su

    data, ok2, ok4 = PRUNED_CORPORA[name]
    data = bytes(data[: su.trim_partial_utf8(data)])
    want = _run(data, be)
    for no_l2, no_l4 in [(False, True), (True, True)]:
        if (no_l2 and not ok2) or (no_l4 and not ok4):
            continue
        got = _run_pruned(data, no_l2, no_l4, be)
        assert got[1:] == want[1:], (name, no_l2, no_l4)
        assert np.array_equal(got[0], want[0]), (name, no_l2, no_l4)


def test_pruned_variant_error_parity():
    """Errors expressible inside the pruned class (orphan continuation,
    bad 3-byte lattice, surrogates, truncation) must report exactly like
    the full kernel under the pruned variants."""
    base = ("東京は日本 ascii ".encode() * 3000)[: 2 * kb.TILE]
    import simdutf_tpu as su

    base = bytearray(base[: su.trim_partial_utf8(base)])
    injections = [b"\x80", b"\xe0\x80\x80", b"\xed\xa0\x80",
                  b"\xe4\xb8", b"\xe4 "]
    for target in (0, kb.TILE - 2, kb.TILE + 3, len(base) - 4):
        j = min(target, len(base) - 4)
        while base[j] & 0xC0 == 0x80:
            j -= 1
        for inj in injections:
            data = bytes(base[:j]) + inj + bytes(base[j:])
            want = _run(data)
            got = _run_pruned(data, True, True)
            assert got[1:] == want[1:], (j, inj)
            assert np.array_equal(got[0], want[0]), (j, inj)


def test_routed_pruned_path_engages(monkeypatch):
    """Through ops/utf8.to_utf16 with the butterfly pinned, a zh-class
    corpus (ASCII + 3-byte, no 2-byte, no astral) routes through the
    pruned variant and must match the golden machine exactly."""
    from simdutf_tpu.ops import engine_probe as ep
    from simdutf_tpu.ops import utf8 as o8
    from simdutf_tpu.golden import utf8 as g8
    import simdutf_tpu as su

    monkeypatch.setattr(ep, "_CHOICE", "butterfly")
    data = ("東京は日本の首都 with ascii words ".encode() * 1500)
    data = data[: su.trim_partial_utf8(data)]
    arr = np.frombuffer(data, np.uint8)
    n = ((len(arr) + kb.TILE - 1) // kb.TILE) * kb.TILE
    p = np.zeros(n, np.uint8)
    p[: len(arr)] = arr
    code, pos, out, out_len = o8.to_utf16(
        jnp.asarray(p), jnp.int32(len(arr)), False)
    res, want = g8.convert_to_utf16_with_errors(arr, False)
    assert res.is_ok and int(code) == 0
    assert int(out_len) == len(want)
    assert np.array_equal(np.asarray(out)[: len(want)], want)
