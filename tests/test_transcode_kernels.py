"""Pallas ASCII fast-path transcode kernels (interpret mode on CPU).

The fused widen/narrow kernels must (a) produce byte-exact streams on
all-ASCII input, (b) raise the fallback flag on any non-ASCII content so
the pallas tier's public entry points stay byte-exact everywhere.
"""

import numpy as np
import pytest

import simdutf_tpu as su
from simdutf_tpu.kernels import transcode as ktr
from simdutf_tpu.kernels.impl import _pad_narrow, _pad_widen


@pytest.fixture(autouse=True)
def _pallas(monkeypatch):
    su.set_active_implementation("pallas")
    yield
    su.set_active_implementation("fallback")


@pytest.mark.parametrize("be", [False, True])
@pytest.mark.parametrize("n", [0, 1, 7, 511, 512, 4097, 70000])
def test_widen_ascii_exact(be, n):
    data = bytes((i * 7 + 13) % 128 for i in range(n))
    want = data.decode().encode("utf-16-be" if be else "utf-16-le")
    x16, nn = _pad_widen(np.frombuffer(data, np.uint8))
    out, flag = ktr.ascii_widen_utf16(x16, big_endian=be)
    assert int(flag) == 0
    got = np.asarray(out).view(np.uint16).reshape(-1)[: int(nn)]
    assert got.tobytes() == want


@pytest.mark.parametrize("spot", [0, 1, 510, 511, 512, 513, 9000])
def test_widen_flags_nonascii(spot):
    data = bytearray(b"a" * 9001)
    data[spot] = 0xC3
    x16, _ = _pad_widen(np.frombuffer(bytes(data), np.uint8))
    _, flag = ktr.ascii_widen_utf16(x16, big_endian=False)
    assert int(flag) == 1


@pytest.mark.parametrize("be", [False, True])
@pytest.mark.parametrize("n", [0, 1, 255, 256, 2049, 40000])
def test_narrow_ascii_exact(be, n):
    s = "".join(chr((i * 11 + 5) % 128) for i in range(n))
    data = np.frombuffer(
        s.encode("utf-16-be" if be else "utf-16-le"), np.uint16
    )
    x32, nn = _pad_narrow(data)
    out, flag = ktr.ascii_narrow_utf8(x32, big_endian=be)
    assert int(flag) == 0
    got = np.asarray(out).view(np.uint8).reshape(-1)[: int(nn)]
    assert got.tobytes() == s.encode()


@pytest.mark.parametrize("be", [False, True])
def test_narrow_flags_nonascii(be):
    s = "abc" * 1000 + "é"
    data = np.frombuffer(
        s.encode("utf-16-be" if be else "utf-16-le"), np.uint16
    )
    x32, _ = _pad_narrow(data)
    _, flag = ktr.ascii_narrow_utf8(x32, big_endian=be)
    assert int(flag) == 1


def test_pallas_tier_ascii_and_fallback_paths():
    """Public entry points: exact on ASCII (kernel path) and on mixed
    (fallback path), matching the xla tier byte-for-byte."""
    ascii_data = b"hello pallas world " * 400
    mixed = "héllo wörld 日本語 🙂 ".encode() * 100
    for data in (ascii_data, mixed):
        su.set_active_implementation("pallas")
        got16 = su.convert_utf8_to_utf16le(data)
        gotv = su.convert_valid_utf8_to_utf16le(data)
        gotbe = su.convert_utf8_to_utf16be(data)
        su.set_active_implementation("xla")
        assert got16 == su.convert_utf8_to_utf16le(data)
        assert gotv == su.convert_valid_utf8_to_utf16le(data)
        assert gotbe == su.convert_utf8_to_utf16be(data)

    u16_ascii = ("ok " * 900).encode("utf-16-le")
    u16_mixed = ("日本 ok " * 300).encode("utf-16-le")
    for data in (u16_ascii, u16_mixed):
        su.set_active_implementation("pallas")
        got8 = su.convert_utf16le_to_utf8(data)
        su.set_active_implementation("xla")
        assert got8 == su.convert_utf16le_to_utf8(data)


def test_pallas_with_errors_result_counts():
    data = b"abc" * 1000
    su.set_active_implementation("pallas")
    r = su.convert_utf8_to_utf16le_with_errors(data)
    assert r[0].is_ok and r[0].count == len(data)
    u16 = "xyz".encode("utf-16-le") * 500
    r = su.convert_utf16le_to_utf8_with_errors(u16)
    assert r[0].is_ok and r[0].count == len(u16) // 2


# --- base64 clean-input block kernels ----------------------------------------


@pytest.mark.parametrize("url", [False, True])
@pytest.mark.parametrize("n", [0, 1, 2, 3, 4, 100, 3000, 70000])
def test_b64_kernel_roundtrip(url, n):
    import base64 as pyb64

    rng = np.random.default_rng(n + url)
    raw = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    su.set_active_implementation("pallas")
    opts = su.base64_url if url else su.base64_default
    enc = su.binary_to_base64(raw, opts)
    want = pyb64.urlsafe_b64encode(raw) if url else pyb64.b64encode(raw)
    if url:
        # reference base64_url omits padding by default
        want = want.rstrip(b"=")
    assert enc == want
    res, back = su.base64_to_binary(enc, opts)
    assert res.is_ok and back == raw


def test_b64_kernel_matches_xla_on_curated():
    cases = [
        b"aGVsbG8=", b"aGVsbG8", b"" , b"QQ==", b"QUJDRA==", b"A" * 8192,
        b"QUJD" * 5000, b"TWFu", b"bGlnaHQgdw==", b"bGlnaHQgd28=",
    ]
    from simdutf_tpu.golden import base64_impl as gb64

    for data in cases:
        for lc in (su.loose, su.strict, su.stop_before_partial):
            su.set_active_implementation("pallas")
            got = su.base64_to_binary_details(data, last_chunk_handling=lc)
            su.set_active_implementation("xla")
            want = su.base64_to_binary_details(data, last_chunk_handling=lc)
            assert got == want, (data[:20], lc)


def test_b64_kernel_fallback_paths():
    """Whitespace / garbage / invalid input must fall back byte-exactly."""
    cases = [
        b"aGVs bG8=",            # interior space
        b" " * 100 + b"aGVsbG8=",
        b"aGVsbG8=   ",
        b"aGVs!bG8=",            # invalid char
        b"QUJD" * 100 + b"\n" + b"QUJD" * 100,
    ]
    for data in cases:
        for opts in (su.base64_default, su.base64_url_accept_garbage
                     if hasattr(su, "base64_url_accept_garbage") else su.base64_default):
            su.set_active_implementation("pallas")
            got = su.base64_to_binary_details(data, options=opts)
            su.set_active_implementation("xla")
            want = su.base64_to_binary_details(data, options=opts)
            assert got == want, (data, opts)


# --- uniform-width utf8->utf16 kernels ----------------------------------------


@pytest.mark.parametrize("be", [False, True])
@pytest.mark.parametrize("script", ["cyr", "cjk"])
def test_uniform_transcode_exact(be, script):
    import random

    rng = random.Random(7)
    if script == "cyr":
        s = "".join(chr(rng.randrange(0x400, 0x500)) for _ in range(5000))
    else:
        s = "".join(chr(rng.randrange(0x4E00, 0xA000)) for _ in range(5000))
    data = s.encode()
    want = s.encode("utf-16-be" if be else "utf-16-le")
    su.set_active_implementation("pallas")
    conv = su.convert_utf8_to_utf16be if be else su.convert_utf8_to_utf16le
    assert conv(data) == want
    validc = (su.convert_valid_utf8_to_utf16be if be
              else su.convert_valid_utf8_to_utf16le)
    assert validc(data) == want


def test_uniform_kernel_flags_and_falls_back():
    # near-uniform corpora with one divergent char must match xla exactly
    cyr = ("ж" * 4000 + "a" + "ж" * 100).encode()
    cjk = ("語" * 4000 + "é" + "語" * 100).encode()
    bad2 = bytearray(("ж" * 3000).encode()); bad2[501] = 0xFF
    bad3 = bytearray(("語" * 3000).encode()); bad3[300] = 0x80
    sur3 = "語" * 2000
    sur_bytes = bytearray(sur3.encode())
    sur_bytes[99:102] = b"\xed\xa0\x80"  # encoded surrogate: invalid
    for data in (cyr, cjk, bytes(bad2), bytes(bad3), bytes(sur_bytes)):
        su.set_active_implementation("pallas")
        got = su.convert_utf8_to_utf16le_with_errors(data)
        su.set_active_implementation("xla")
        want = su.convert_utf8_to_utf16le_with_errors(data)
        assert got == want


def test_uniform_kernel_direct():
    from simdutf_tpu.kernels.impl import _pad_u2, _pad_u3

    s2 = "абвгд" * 777
    d2 = np.frombuffer(s2.encode(), np.uint8)
    x32, n = _pad_u2(d2)
    out, flag = ktr.uniform2_utf8_to_utf16(x32, n)
    assert int(flag) == 0
    got = np.asarray(out).view(np.uint16).reshape(-1)[: len(d2) // 2]
    assert got.tobytes() == s2.encode("utf-16-le")

    s3 = "一二三四五" * 999
    d3 = np.frombuffer(s3.encode(), np.uint8)
    x33, n3 = _pad_u3(d3)
    out3, flag3 = ktr.uniform3_utf8_to_utf16(x33, n3)
    assert int(flag3) == 0
    got3 = np.asarray(out3).view(np.uint16).reshape(-1)[: len(d3) // 3]
    assert got3.tobytes() == s3.encode("utf-16-le")


@pytest.mark.parametrize("be", [False, True])
@pytest.mark.parametrize("script", ["cyr", "cjk"])
def test_uniform_utf16_to_utf8(be, script):
    import random

    rng = random.Random(9)
    if script == "cyr":
        s = "".join(chr(rng.randrange(0x80, 0x800)) for _ in range(4001))
    else:
        s = "".join(
            chr(rng.choice([rng.randrange(0x800, 0xD800),
                            rng.randrange(0xE000, 0x10000)]))
            for _ in range(4001)
        )
    data = s.encode("utf-16-be" if be else "utf-16-le")
    su.set_active_implementation("pallas")
    conv = su.convert_utf16be_to_utf8 if be else su.convert_utf16le_to_utf8
    assert conv(data) == s.encode()
    # divergent unit mid-stream must fall back byte-exactly
    mixed = s[:2000] + "a" + s[2000:]
    mdata = mixed.encode("utf-16-be" if be else "utf-16-le")
    su.set_active_implementation("pallas")
    got = conv(mdata)
    su.set_active_implementation("xla")
    assert got == conv(mdata)


def test_latin1_widen_kernels():
    data = bytes(range(256)) * 40
    s = data.decode("latin-1")
    su.set_active_implementation("pallas")
    assert su.convert_latin1_to_utf16le(data) == s.encode("utf-16-le")
    assert su.convert_latin1_to_utf16be(data) == s.encode("utf-16-be")
    assert su.convert_latin1_to_utf32(data) == s.encode("utf-32-le")


@pytest.mark.parametrize("be", [False, True])
def test_bmp_widen_narrow(be):
    import random

    rng = random.Random(5)
    cps = [rng.choice([rng.randrange(1, 0xD800), rng.randrange(0xE000, 0x10000)])
           for _ in range(3001)]
    s = "".join(chr(c) for c in cps)
    u16 = s.encode("utf-16-be" if be else "utf-16-le")
    u32 = s.encode("utf-32-le")
    su.set_active_implementation("pallas")
    conv32 = su.convert_utf16be_to_utf32 if be else su.convert_utf16le_to_utf32
    assert conv32(u16) == u32
    conv16 = su.convert_utf32_to_utf16be if be else su.convert_utf32_to_utf16le
    assert conv16(u32) == u16
    # astral chars must fall back byte-exactly
    s2 = s[:100] + "🙂" + s[100:]
    u16a = s2.encode("utf-16-be" if be else "utf-16-le")
    u32a = s2.encode("utf-32-le")
    su.set_active_implementation("pallas")
    got32, got16 = conv32(u16a), conv16(u32a)
    su.set_active_implementation("xla")
    assert got32 == conv32(u16a) and got16 == conv16(u32a)


@pytest.mark.parametrize("script", ["cyr", "cjk", "ascii"])
def test_uniform_utf8_utf32_roundtrip(script):
    import random

    rng = random.Random(11)
    if script == "cyr":
        s = "".join(chr(rng.randrange(0x80, 0x800)) for _ in range(3001))
    elif script == "cjk":
        s = "".join(chr(rng.randrange(0x800, 0xD800)) for _ in range(3001))
    else:
        s = "".join(chr(rng.randrange(0x20, 0x7F)) for _ in range(3001))
    data, u32 = s.encode(), s.encode("utf-32-le")
    su.set_active_implementation("pallas")
    assert su.convert_utf8_to_utf32(data) == u32
    assert su.convert_valid_utf8_to_utf32(data) == u32
    if script != "ascii":
        assert su.convert_utf32_to_utf8(u32) == data
        assert su.convert_valid_utf32_to_utf8(u32) == data
    # divergence falls back byte-exactly
    s2 = s[:50] + ("x" if script != "ascii" else "é") + s[50:]
    d2, u2 = s2.encode(), s2.encode("utf-32-le")
    su.set_active_implementation("pallas")
    got_a, got_b = su.convert_utf8_to_utf32(d2), su.convert_utf32_to_utf8(u2)
    su.set_active_implementation("xla")
    assert got_a == su.convert_utf8_to_utf32(d2)
    assert got_b == su.convert_utf32_to_utf8(u2)


# --- fused one-pass detect kernel -------------------------------------------


@pytest.mark.parametrize("seed", range(3))
def test_detect_fused_differential(seed):
    """The pallas one-pass detect must agree with the XLA fused pass on
    every input class (valid text of each encoding, mutations, soup,
    surrogate edges). Ref: haswell/implementation.cpp:152-260."""
    import random
    import sys

    import helpers

    rng = random.Random(seed)
    cases = []
    for i in range(40):
        k = i % 5
        if k == 0:
            cases.append(helpers.random_utf8(seed * 99 + i, rng.randrange(0, 700), 2, 1, 1, 1))
        elif k == 1:
            cases.append(helpers.random_utf16(seed * 99 + i, rng.randrange(0, 350), 2, 1))
        elif k == 2:
            cps = [c for c in (rng.randrange(0, 0x110000) for _ in range(rng.randrange(0, 170)))
                   if not (0xD800 <= c <= 0xDFFF)]
            cases.append(np.array(cps, np.uint32).tobytes())
        elif k == 3:
            cases.append(helpers.random_bytes(seed * 99 + i, rng.randrange(0, 700)))
        else:
            cases.append(helpers.mutate(
                helpers.random_utf8(seed * 99 + i, 150, 1, 1, 1, 1), i, 3))
    cases += [b"\xff\xfeab", b"\xef\xbb\xbfxy", b"\x00\xd8\x00\xdc",
              b"\x00\xdc\x00\xd8", b"\x00\xd8", b"\x00\xdc", b"",
              b"\x00\xd8\x00\xd8\x00\xdc\x00\xdc", b"\x00\xdcrest"]
    for data in cases:
        su.set_active_implementation("xla")
        want = su.detect_encodings(data)
        want_auto = su.autodetect_encoding(data)
        su.set_active_implementation("pallas")
        assert su.detect_encodings(data) == want, data.hex()
        assert su.autodetect_encoding(data) == want_auto, data.hex()


# --- astral (uniform 4-byte / surrogate-pair) wordmap kernels ------------------


def _astral_string(n, seed=13):
    import random

    rng = random.Random(seed)
    return "".join(chr(rng.randrange(0x10000, 0x110000)) for _ in range(n))


@pytest.mark.parametrize("be", [False, True])
def test_astral_utf8_to_utf16_and_utf32(be):
    s = _astral_string(3001)
    data = s.encode()
    su.set_active_implementation("pallas")
    conv = su.convert_utf8_to_utf16be if be else su.convert_utf8_to_utf16le
    assert conv(data) == s.encode("utf-16-be" if be else "utf-16-le")
    if not be:
        assert su.convert_utf8_to_utf32(data) == s.encode("utf-32-le")
        r, out = su.convert_utf8_to_utf16le_with_errors(data)
        assert r.is_ok and r.count == 2 * len(s)


@pytest.mark.parametrize("be", [False, True])
def test_astral_utf16_utf32_pair_maps(be):
    s = _astral_string(2501, seed=17)
    u16 = s.encode("utf-16-be" if be else "utf-16-le")
    u32 = s.encode("utf-32-le")
    su.set_active_implementation("pallas")
    conv32 = su.convert_utf16be_to_utf32 if be else su.convert_utf16le_to_utf32
    conv16 = su.convert_utf32_to_utf16be if be else su.convert_utf32_to_utf16le
    assert conv32(u16) == u32
    assert conv16(u32) == u16
    if not be:
        assert su.convert_utf32_to_utf8(u32) == s.encode()


def test_astral_divergence_falls_back_exactly():
    s = _astral_string(2001, seed=23)
    # one BMP char / one lone surrogate / one bad byte, mid-stream
    variants = []
    s_mixed = s[:700] + "x" + s[700:]
    variants.append(("u8", s_mixed.encode()))
    bad8 = bytearray(s.encode())
    bad8[1001] = 0x2A  # breaks a 4-byte sequence
    variants.append(("u8", bytes(bad8)))
    lone = np.frombuffer(s.encode("utf-16-le"), np.uint16).copy()
    lone[501] = 0xD800  # low half replaced by a high surrogate
    variants.append(("u16", lone.tobytes()))
    bad32 = np.frombuffer(s.encode("utf-32-le"), np.uint32).copy()
    bad32[301] = 0x110000
    variants.append(("u32", bad32.tobytes()))
    for kind, data in variants:
        su.set_active_implementation("pallas")
        if kind == "u8":
            got = (su.convert_utf8_to_utf16le_with_errors(data),
                   su.convert_utf8_to_utf32_with_errors(data))
        elif kind == "u16":
            got = (su.convert_utf16le_to_utf32_with_errors(data),)
        else:
            got = (su.convert_utf32_to_utf16le_with_errors(data),
                   su.convert_utf32_to_utf8_with_errors(data))
        su.set_active_implementation("xla")
        if kind == "u8":
            want = (su.convert_utf8_to_utf16le_with_errors(data),
                    su.convert_utf8_to_utf32_with_errors(data))
        elif kind == "u16":
            want = (su.convert_utf16le_to_utf32_with_errors(data),)
        else:
            want = (su.convert_utf32_to_utf16le_with_errors(data),
                    su.convert_utf32_to_utf8_with_errors(data))
        assert got == want, (kind, data[:20])


def test_astral_wordmap_direct():
    from simdutf_tpu.kernels.impl import _pad_u2, _pad_narrow, _pad_word32

    s = "🙂🚀🌍" * 1000
    data = np.frombuffer(s.encode(), np.uint8)
    x32, n = _pad_u2(data)
    out, flag = ktr.astral_wordmap(x32, n, "u8_to_u16")
    assert int(flag) == 0
    got = np.asarray(out).view(np.uint16).reshape(-1)[: len(data) // 2]
    assert got.tobytes() == s.encode("utf-16-le")

    u16 = np.frombuffer(s.encode("utf-16-le"), np.uint16)
    p32, np16 = _pad_narrow(u16)
    out2, flag2 = ktr.astral_wordmap(p32, np16, "u16pair_to_u32")
    assert int(flag2) == 0
    got2 = np.asarray(out2).view(np.uint32).reshape(-1)[: len(u16) // 2]
    assert got2.tobytes() == s.encode("utf-32-le")

    u32 = np.frombuffer(s.encode("utf-32-le"), np.uint32)
    w32, n32 = _pad_word32(u32)
    out3, flag3 = ktr.astral_wordmap(w32, n32, "u32_to_u8")
    assert int(flag3) == 0
    got3 = np.asarray(out3).view(np.uint8).reshape(-1)[: 4 * len(u32)]
    assert got3.tobytes() == s.encode()

    out4, flag4 = ktr.astral_wordmap(w32, n32, "u32_to_u16pair")
    assert int(flag4) == 0
    got4 = np.asarray(out4).view(np.uint16).reshape(-1)[: 2 * len(u32)]
    assert got4.tobytes() == s.encode("utf-16-le")
