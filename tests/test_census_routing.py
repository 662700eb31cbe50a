"""Device-tier census routing (round 3): the jitted transcode entry points
lax.cond into fixed-rate branches when the whole buffer is one structural
class. These tests pin (a) the census predicates are exact in-class
validity proofs, (b) routed output == unrouted general-engine output
bit-for-bit (including zeros past out_len), (c) invalid inputs fall back
to the general engine with exact first-error parity.

Reference behavior mirrored: the per-block is_ascii short-circuit of
generic/utf8_to_utf16/utf8_to_utf16.h:237-240 lifted to corpus scale.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from simdutf_tpu.ops import utf8 as o8, utf16 as o16, utf32 as o32, latin1 as ol1
from simdutf_tpu.ops.impl import _pad
from simdutf_tpu.golden import utf8 as g8, utf16 as g16, utf32 as g32

UTF8_CASES = {
    "ascii": b"Hello, world! " * 37,
    "u2": "ñöüßæπλщ".encode() * 29,
    "u3": "東京は日本の首都".encode() * 31,
    "u4": "\U0001f642\U0001f680\U0001f30d\U0001f4a1".encode() * 23,
    "mixed": "aé東\U0001f642".encode() * 41,
    "bad_u2": "ñö".encode() * 10 + b"\xc2\xc2" + "ü".encode(),
    "bad_u3": "東京".encode() * 7 + b"\xe0\x80\x80" + "本".encode(),
    "bad_u4": "\U0001f642".encode() * 5 + b"\xf4\x90\x80\x80",
    "bad_ascii": b"abc\x80def",
    "surrogate_u3": b"abc" + b"\xed\xa0\x80" + b"def",
    "trunc3": "東京は".encode()[:-1],
    "single": b"A",
    "empty": b"",
}


def _chk(code, pos, out, out_len, res, want, n_in):
    code, pos, out_len = int(code), int(pos), int(out_len)
    got = np.asarray(out)[:out_len]
    if res.is_ok:
        assert code == 0 and pos == n_in, (code, pos)
    else:
        assert code == int(res.error) and pos == int(res.count), (
            code, pos, res)
    assert np.array_equal(got, want), (got[:8], want[:8])
    if res.is_ok:
        # valid-input contract: zeros past out_len (fast branches must
        # mask their padded tails to match the scatter engine's zeros;
        # the general engine's ERROR paths legitimately leave post-error
        # units in the buffer beyond out_len, so only valid inputs pin it)
        tail = np.asarray(out)[out_len:]
        assert not tail.any(), "garbage past out_len"


@pytest.mark.parametrize("name", sorted(UTF8_CASES))
@pytest.mark.parametrize("be", [False, True])
def test_utf8_to_utf16_routed(name, be):
    arr = np.frombuffer(UTF8_CASES[name], np.uint8)
    p, n = _pad(arr)
    res, want = g8.convert_to_utf16_with_errors(arr, be)
    got = o8.to_utf16(jnp.asarray(p), jnp.int32(n), be)
    _chk(*got, res, want, len(arr))
    # bit-parity with the unrouted general engine
    gen = o8._to_utf16_general(jnp.asarray(p), jnp.int32(n), be)
    for a, b in zip(got, gen):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name


@pytest.mark.parametrize("name", sorted(UTF8_CASES))
def test_utf8_to_utf32_routed(name):
    arr = np.frombuffer(UTF8_CASES[name], np.uint8)
    p, n = _pad(arr)
    res, want = g8.convert_to_utf32_with_errors(arr)
    _chk(*o8.to_utf32(jnp.asarray(p), jnp.int32(n)), res, want, len(arr))


def test_utf8_census_exactness():
    """The census flag must be True exactly when the class validates."""
    p, n = _pad(np.frombuffer(UTF8_CASES["u3"], np.uint8))
    a, u2, u3, u4 = (bool(x) for x in o8.census(jnp.asarray(p), jnp.int32(n)))
    assert (a, u2, u3, u4) == (False, False, True, False)
    p, n = _pad(np.frombuffer(UTF8_CASES["bad_u3"], np.uint8))
    a, u2, u3, u4 = (bool(x) for x in o8.census(jnp.asarray(p), jnp.int32(n)))
    assert not (a or u2 or u3 or u4)
    # surrogate-encoding 3-byte input must NOT census as u3
    p, n = _pad(np.frombuffer(b"\xed\xa0\x80" * 4, np.uint8))
    a, u2, u3, u4 = (bool(x) for x in o8.census(jnp.asarray(p), jnp.int32(n)))
    assert not u3
    # overlong 3-byte (E0 80 80) must NOT census as u3
    p, n = _pad(np.frombuffer(b"\xe0\x80\x80" * 4, np.uint8))
    assert not bool(o8.census(jnp.asarray(p), jnp.int32(n))[2])


UTF16_TEXTS = {
    "ascii": "hello world " * 13,
    "u2r": "ñöüßæπλщ" * 13,
    "u3r": "東京は日本の首都" * 11,
    "astral": "\U0001f642\U0001f680\U0001f30d\U0001f4a1" * 7,
    "mixed": "aé東\U0001f642" * 9,
    "empty": "",
}
UTF16_RAW = {
    "lone_high": b"a\x00b\x00\x00\xd8c\x00",
    "lone_low": b"\x00\xdcx\x00y\x00",
}


def _u16_words(name):
    if name in UTF16_RAW:
        return np.frombuffer(UTF16_RAW[name], np.uint16)
    return np.frombuffer(UTF16_TEXTS[name].encode("utf-16-le"), np.uint16)


@pytest.mark.parametrize("name", sorted(UTF16_TEXTS) + sorted(UTF16_RAW))
@pytest.mark.parametrize("be", [False, True])
def test_utf16_to_utf8_routed(name, be):
    w = _u16_words(name)
    ww = w.byteswap() if be else w
    p, n = _pad(ww)
    res, want = g16.convert_to_utf8_with_errors(ww, be)
    _chk(*o16.to_utf8(jnp.asarray(p), jnp.int32(n), be), res, want, len(w))


@pytest.mark.parametrize("name", sorted(UTF16_TEXTS) + sorted(UTF16_RAW))
@pytest.mark.parametrize("be", [False, True])
def test_utf16_to_utf32_routed(name, be):
    w = _u16_words(name)
    ww = w.byteswap() if be else w
    p, n = _pad(ww)
    res, want = g16.convert_to_utf32_with_errors(ww, be)
    _chk(*o16.to_utf32(jnp.asarray(p), jnp.int32(n), be), res, want, len(w))


UTF32_CASES = {
    "ascii": np.array([ord(c) for c in "hello"], np.uint32),
    "u2": np.array([0x80, 0x7FF, 0xE9] * 5, np.uint32),
    "u3": np.array([0x800, 0xFFFF, 0x6771] * 7, np.uint32),
    "astral": np.array([0x10000, 0x10FFFF, 0x1F600] * 3, np.uint32),
    "bmp_mixed": np.array([0x41, 0x800, 0x7FF], np.uint32),
    "full_mixed": np.array([0x41, 0x1F600, 0x6771], np.uint32),
    "surrogate": np.array([0x41, 0xD800, 0x42], np.uint32),
    "too_large": np.array([0x41, 0x110000], np.uint32),
    "empty": np.array([], np.uint32),
}


@pytest.mark.parametrize("name", sorted(UTF32_CASES))
def test_utf32_to_utf8_routed(name):
    w = UTF32_CASES[name]
    p, n = _pad(w)
    res, want = g32.convert_to_utf8_with_errors(w)
    _chk(*o32.to_utf8(jnp.asarray(p), jnp.int32(n)), res, want, len(w))


@pytest.mark.parametrize("name", sorted(UTF32_CASES))
@pytest.mark.parametrize("be", [False, True])
def test_utf32_to_utf16_routed(name, be):
    w = UTF32_CASES[name]
    p, n = _pad(w)
    res, want = g32.convert_to_utf16_with_errors(w, be)
    _chk(*o32.to_utf16(jnp.asarray(p), jnp.int32(n), be), res, want, len(w))


@pytest.mark.parametrize("case", ["ascii", "hi", "mixed", "empty"])
def test_latin1_to_utf8_routed(case):
    data = {
        "ascii": bytes(range(0x20, 0x7F)) * 3,
        "hi": bytes(range(0x80, 0x100)) * 2,
        "mixed": bytes(range(0x20, 0x100)),
        "empty": b"",
    }[case]
    arr = np.frombuffer(data, np.uint8)
    p, n = _pad(arr)
    out, total = ol1.to_utf8(jnp.asarray(p), jnp.int32(n))
    want = data.decode("latin-1").encode("utf-8")
    got = np.asarray(out)[: int(total)].tobytes()
    assert got == want
    assert not np.asarray(out)[int(total):].any()


def test_valid_variants_routed():
    """convert_valid_* share the same branches; spot-check each class."""
    for name in ("ascii", "u2", "u3", "u4", "mixed"):
        arr = np.frombuffer(UTF8_CASES[name], np.uint8)
        p, n = _pad(arr)
        _, want = g8.convert_to_utf16_with_errors(arr, False)
        out, total = o8.to_utf16_valid(jnp.asarray(p), jnp.int32(n), False)
        assert np.array_equal(np.asarray(out)[: int(total)], want), name
        _, want32 = g8.convert_to_utf32_with_errors(arr)
        out, total = o8.to_utf32_valid(jnp.asarray(p), jnp.int32(n))
        assert np.array_equal(np.asarray(out)[: int(total)], want32), name
    for name in ("ascii", "u2r", "u3r", "astral", "mixed"):
        w = _u16_words(name)
        p, n = _pad(w)
        _, want = g16.convert_to_utf8_with_errors(w, False)
        out, total = o16.to_utf8_valid(jnp.asarray(p), jnp.int32(n), False)
        assert np.array_equal(np.asarray(out)[: int(total)], want), name
    for name in ("ascii", "u2", "u3", "astral", "full_mixed"):
        w = UTF32_CASES[name]
        p, n = _pad(w)
        _, want = g32.convert_to_utf16_with_errors(w, False)
        out, total = o32.to_utf16_valid(jnp.asarray(p), jnp.int32(n), False)
        assert np.array_equal(np.asarray(out)[: int(total)], want), name


def test_routed_fuzz_vs_golden():
    """Randomized: class-pure and mixed windows with random lengths, some
    mutated — routed engine must track the scalar machine exactly."""
    rng = np.random.default_rng(7)
    pools = [
        "The quick brown fox. ",
        "éñüß" * 2,
        "東京は日" * 2,
        "\U0001f642\U0001f680" * 2,
        "aé東\U0001f642",
    ]
    for trial in range(60):
        text = "".join(
            pools[rng.integers(len(pools))] for _ in range(rng.integers(1, 6))
        )
        data = bytearray(text.encode())
        if trial % 3 == 0 and data:
            data[rng.integers(len(data))] = rng.integers(0x80, 0x100)
        arr = np.frombuffer(bytes(data), np.uint8)
        cut = int(rng.integers(0, len(arr) + 1))
        arr = arr[:cut]
        p, n = _pad(arr)
        res, want = g8.convert_to_utf16_with_errors(arr, False)
        _chk(*o8.to_utf16(jnp.asarray(p), jnp.int32(n), False),
             res, want, len(arr))
