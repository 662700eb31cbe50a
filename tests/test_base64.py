"""Base64 conformance: every implementation vs the oracle, across the
options × last_chunk matrix (reference: tests/base64_tests.cpp genres)."""

import base64 as pybase64

import numpy as np
import pytest

import helpers
import oracle
import simdutf_tpu as su

OPTIONS = [
    oracle.BASE64_DEFAULT,
    oracle.BASE64_URL,
    oracle.BASE64_DEFAULT_OR_URL,
    oracle.BASE64_DEFAULT_ACCEPT_GARBAGE,
    oracle.BASE64_URL_ACCEPT_GARBAGE,
    oracle.BASE64_DEFAULT_OR_URL_ACCEPT_GARBAGE,
]
CHUNKS = [oracle.LOOSE, oracle.STRICT, oracle.STOP_BEFORE_PARTIAL]

CASES = [
    b"",
    b"=",
    b"==",
    b"===",
    b"A",
    b"AA",
    b"AAA",
    b"AAAA",
    b"AA==",
    b"AAA=",
    b"AA=",
    b"A===",
    b"QQ==",
    b"QR==",
    b"aGVsbG8=",
    b"aGVsbG8",
    b"aGVsbG8==",
    b"aGVs bG8=",
    b" a G V s b G 8 = ",
    b"aGVsbG8=\n",
    b"ab$d",
    b"abc\xffdef",
    b"ab=c",
    b"=abc",
    b"a=bc",
    b"TWFu",
    b"TWE=",
    b"TQ==",
    b"-_-_",
    b"+/+/",
    b"\t\n\r\x0c ",
    b"A" * 401,
    b"=" * 5,
    pybase64.b64encode(bytes(range(256))),
    pybase64.b64encode(helpers.random_bytes(3, 1000)),
]
for s in range(12):
    enc = bytearray(pybase64.b64encode(helpers.random_bytes(s, 37 + s * 13)))
    # sprinkle whitespace
    for i in range(0, len(enc), 7):
        enc[i : i + 1] = b" " + enc[i : i + 1]
    CASES.append(bytes(enc))
    CASES.append(helpers.mutate(bytes(enc), s, 2))


@pytest.mark.parametrize("options", OPTIONS)
@pytest.mark.parametrize("chunk", CHUNKS)
def test_base64_decode_matrix(impl_name, options, chunk):
    for data in CASES:
        expect_full, expect_out = oracle.base64_to_binary(data, options, chunk)
        got_full, got_out = su.base64_to_binary_details(data, options, chunk)
        assert got_full == expect_full, (data, options, chunk, got_full, expect_full)
        assert got_out == expect_out, (data, options, chunk)
        got_res, _ = su.base64_to_binary(data, options, chunk)
        assert got_res == expect_full.to_result()


@pytest.mark.parametrize(
    "options",
    [
        oracle.BASE64_DEFAULT,
        oracle.BASE64_URL,
        oracle.BASE64_DEFAULT_NO_PADDING,
        oracle.BASE64_URL_WITH_PADDING,
    ],
)
def test_base64_encode(impl_name, options):
    for n in list(range(0, 32)) + [100, 1001]:
        data = helpers.random_bytes(n, n)
        expect = oracle.binary_to_base64(data, options)
        got = su.binary_to_base64(data, options)
        assert got == expect
        assert len(got) == su.base64_length_from_binary(len(data), options)
        # roundtrip through decode
        opts_dec = options & 1  # matching alphabet
        res, back = su.base64_to_binary(got, opts_dec)
        assert res.is_ok and back == data


def test_base64_length_functions(impl_name):
    for data in CASES:
        assert su.maximal_binary_length_from_base64(
            data
        ) == oracle.maximal_binary_length_from_base64(data)


def test_base64_char16_input(impl_name):
    # char16 inputs classify units > 0xFF as invalid (is_eight_byte)
    arr = np.array([ord(c) for c in "aGVsbG8="], dtype=np.uint16)
    res, out = su.base64_to_binary(arr)
    assert res.is_ok and out == b"hello"
    arr_bad = arr.copy()
    arr_bad[2] = 0x141  # non-8-bit char whose low byte is 'A'
    res, _ = su.base64_to_binary(arr_bad)
    assert res.error == su.error_code.INVALID_BASE64_CHARACTER and res.count == 2


def test_base64_combined_option_values(impl_name):
    """Review regression: bit-combination option values (9, 11, 13) must
    resolve by bit semantics, not crash (scalar/base64.h:43-47)."""
    for options in (9, 11, 2, 3, 6, 7):
        res, out = su.base64_to_binary(b"AA__", options)
        # default_or_url bit set (8|1=9, 8|2|1=11): '_' is valid
        if options & 8:
            assert res.is_ok, options
        res2, out2 = su.base64_to_binary(b"aGVsbG8=", options)
        assert res2.is_ok and out2 == b"hello", options


def test_base64_char16_differential(impl_name):
    """char16 decode parity across tiers vs the golden tier, over random
    base64-ish strings with spaces/padding/garbage and >0xFF units
    (reference templates the whole machinery over char16_t,
    src/scalar/base64.h:33)."""
    import random

    from simdutf_tpu.golden import base64_impl as gb64
    from simdutf_tpu.registry import get_available_implementations

    rng = random.Random(1234)
    alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnop0123456789+/-_ \t\n="
    impl = get_available_implementations()[impl_name]
    for trial in range(40):
        n = rng.randrange(0, 40)
        units = [ord(rng.choice(alphabet)) for _ in range(n)]
        if trial % 5 == 4 and n:
            units[rng.randrange(n)] = rng.randrange(0x100, 0xFFFF)
        arr = np.array(units, dtype=np.uint16)
        for options in (0, 1, 4, 8):
            for last_chunk in (gb64.LOOSE, gb64.STRICT, gb64.STOP_BEFORE_PARTIAL):
                want_full, want_out = gb64.decode(
                    arr, options, last_chunk
                )
                got_full, got_out = impl.base64_to_binary_details(
                    arr, options, last_chunk
                )
                assert (want_full, bytes(np.asarray(want_out))) == (
                    got_full, bytes(np.asarray(got_out))
                ), (units, options, last_chunk)
