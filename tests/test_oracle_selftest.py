"""Cross-check the oracle itself against Python's built-in codecs.

The oracle is our ground truth, so it gets an independent meta-oracle:
CPython's strict UTF-8/16/32 codecs and base64 module, which were written
with no knowledge of simdutf.
"""

import base64 as pybase64
import codecs

import pytest

import helpers
import oracle
from simdutf_tpu.errors import error_code as ec


@pytest.mark.parametrize("seed", range(20))
def test_utf8_validity_matches_python(seed):
    data = helpers.random_utf8(seed, 200, 1, 1, 1, 1)
    assert oracle.validate_utf8(data)
    # mutate and compare accept/reject with python's strict decoder
    for m in range(25):
        mutated = helpers.mutate(data, seed * 100 + m, n_mutations=2)
        try:
            mutated.decode("utf-8", errors="strict")
            py_ok = True
        except UnicodeDecodeError:
            py_ok = False
        assert oracle.validate_utf8(mutated) == py_ok, mutated.hex()


@pytest.mark.parametrize("seed", range(10))
def test_utf8_to_utf16_matches_python(seed):
    data = helpers.random_utf8(seed, 300, 2, 1, 1, 1)
    res, out = oracle.convert_utf8_to_utf16_with_errors(data, big_endian=False)
    assert res.is_ok
    expect = data.decode("utf-8").encode("utf-16-le")
    assert out == expect
    assert res.count * 2 == len(expect)
    res_be, out_be = oracle.convert_utf8_to_utf16_with_errors(data, big_endian=True)
    assert out_be == data.decode("utf-8").encode("utf-16-be")


@pytest.mark.parametrize("seed", range(10))
def test_utf8_to_utf32_matches_python(seed):
    data = helpers.random_utf8(seed, 300, 2, 1, 1, 1)
    res, out = oracle.convert_utf8_to_utf32_with_errors(data)
    assert res.is_ok
    assert out == data.decode("utf-8").encode("utf-32-le")


@pytest.mark.parametrize("seed", range(10))
def test_utf16_roundtrip_matches_python(seed):
    data = helpers.random_utf16(seed, 300, p_bmp=2, p_astral=1)
    assert oracle.validate_utf16(data, big_endian=False)
    res, out = oracle.convert_utf16_to_utf8_with_errors(data, big_endian=False)
    assert res.is_ok
    assert out == data.decode("utf-16-le").encode("utf-8")
    res32, out32 = oracle.convert_utf16_to_utf32_with_errors(data, big_endian=False)
    assert out32 == data.decode("utf-16-le").encode("utf-32-le")


@pytest.mark.parametrize("seed", range(10))
def test_utf32_to_utf8_matches_python(seed):
    data = helpers.random_utf32(seed, 300)
    assert oracle.validate_utf32(data)
    res, out = oracle.convert_utf32_to_utf8_with_errors(data)
    assert res.is_ok
    assert out == data.decode("utf-32-le").encode("utf-8")


def test_latin1_matches_python():
    data = bytes(range(256))
    assert oracle.convert_latin1_to_utf8(data) == data.decode("latin-1").encode("utf-8")
    assert oracle.convert_latin1_to_utf16(data, False) == data.decode("latin-1").encode(
        "utf-16-le"
    )
    assert oracle.convert_latin1_to_utf32(data) == data.decode("latin-1").encode(
        "utf-32-le"
    )


@pytest.mark.parametrize("seed", range(10))
def test_base64_encode_matches_python(seed):
    data = helpers.random_bytes(seed, seed * 7 + 5)
    assert oracle.binary_to_base64(data) == pybase64.b64encode(data)
    assert oracle.binary_to_base64(data, oracle.BASE64_URL) == pybase64.urlsafe_b64encode(
        data
    ).rstrip(b"=")


@pytest.mark.parametrize("seed", range(10))
def test_base64_decode_roundtrip(seed):
    data = helpers.random_bytes(seed + 100, seed * 11 + 3)
    enc = pybase64.b64encode(data)
    res, out = oracle.base64_to_binary(enc)
    assert res.is_ok, res
    assert out == data
    # with whitespace sprinkled in (forgiving decode)
    spaced = b" ".join(enc[i : i + 3] for i in range(0, len(enc), 3)) + b"\n"
    res, out = oracle.base64_to_binary(spaced)
    assert res.is_ok, (res, spaced)
    assert out == data


def test_base64_error_cases():
    # stray character
    res, _ = oracle.base64_to_binary(b"ab$d")
    assert res.error == ec.INVALID_BASE64_CHARACTER and res.input_count == 2
    # lone char remainder
    res, _ = oracle.base64_to_binary(b"abcde")
    assert res.error == ec.BASE64_INPUT_REMAINDER
    # loose decodes partial chunk
    res, out = oracle.base64_to_binary(b"aGVsbG8")  # "hello" unpadded
    assert res.is_ok and out == b"hello"
    # strict rejects unpadded partial chunk
    res, _ = oracle.base64_to_binary(b"aGVsbG8", last_chunk=oracle.STRICT)
    assert res.error == ec.BASE64_INPUT_REMAINDER
    # strict accepts properly padded
    res, out = oracle.base64_to_binary(b"aGVsbG8=", last_chunk=oracle.STRICT)
    assert res.is_ok and out == b"hello"
    # stop_before_partial ignores the partial chunk
    res, out = oracle.base64_to_binary(
        b"aGVsbG8", last_chunk=oracle.STOP_BEFORE_PARTIAL
    )
    assert res.is_ok and out == b"hel" and res.input_count == 4
    # padding on a complete chunk is invalid
    res, _ = oracle.base64_to_binary(b"aGVsbG8==")
    assert res.error == ec.INVALID_BASE64_CHARACTER
    # strict extra bits: '9' (61) contributes nonzero trailing bits
    res, _ = oracle.base64_to_binary(b"aGVsbG9=", last_chunk=oracle.STRICT)
    assert res.error == ec.BASE64_EXTRA_BITS


def test_base64_extra_bits_strict():
    # "QQ=" -> idx==2+1 pad; value bits of second char non-zero low bits?
    # 'R' = 17 -> low 4 bits 0001 -> extra bits present
    res, _ = oracle.base64_to_binary(b"QR==", last_chunk=oracle.STRICT)
    assert res.error == ec.BASE64_EXTRA_BITS
    res, out = oracle.base64_to_binary(b"QQ==", last_chunk=oracle.STRICT)
    assert res.is_ok and out == b"A"


@pytest.mark.parametrize("seed", range(5))
def test_base64_garbage_mode(seed):
    data = helpers.random_bytes(seed, 50)
    enc = bytearray(pybase64.b64encode(data))
    # sprinkle garbage
    garbled = b"\x00#".join(bytes(enc[i : i + 5]) for i in range(0, len(enc), 5))
    res, out = oracle.base64_to_binary(garbled, options=oracle.BASE64_DEFAULT_ACCEPT_GARBAGE)
    assert res.is_ok
    assert out == data


def test_maximal_binary_length():
    assert oracle.maximal_binary_length_from_base64(b"aGVsbG8=") == 5
    assert oracle.maximal_binary_length_from_base64(b"aGVsbG8") == 5
    assert oracle.maximal_binary_length_from_base64(b"") == 0
    assert oracle.maximal_binary_length_from_base64(b"AAAA") == 3


def test_utf16_surrogate_errors():
    import numpy as np

    # lone high surrogate
    data = np.array([0x0041, 0xD800, 0x0042], dtype=np.uint16).tobytes()
    r = oracle.validate_utf16_with_errors(data, False)
    assert r.error == ec.SURROGATE and r.count == 1
    # lone low surrogate
    data = np.array([0xDC00], dtype=np.uint16).tobytes()
    r = oracle.validate_utf16_with_errors(data, False)
    assert r.error == ec.SURROGATE and r.count == 0
    # swapped pair
    data = np.array([0xDC00, 0xD800], dtype=np.uint16).tobytes()
    r = oracle.validate_utf16_with_errors(data, False)
    assert r.error == ec.SURROGATE and r.count == 0
