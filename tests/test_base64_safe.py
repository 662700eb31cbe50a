"""base64_to_binary_safe: capacity-limited decode semantics
(implementation.h:3090-3208, base64_to_binary_safe_impl in
src/implementation.cpp:2157-2330)."""

import base64 as pybase64

import pytest

import helpers
import simdutf_tpu as su
from simdutf_tpu.errors import error_code as ec


def test_safe_enough_capacity(impl_name):
    data = helpers.random_bytes(1, 100)
    enc = pybase64.b64encode(data)
    res, out = su.base64_to_binary_safe(enc, 1000)
    assert res.error == ec.SUCCESS
    # fast path success count = input length (safe contract differs from
    # base64_to_binary: count counts input chars)
    assert res.count == len(enc)
    assert out == data


def test_safe_exact_capacity(impl_name):
    data = helpers.random_bytes(2, 99)
    enc = pybase64.b64encode(data)
    res, out = su.base64_to_binary_safe(enc, len(data))
    assert res.error == ec.SUCCESS and out == data


def test_safe_too_small(impl_name):
    data = helpers.random_bytes(3, 300)
    enc = pybase64.b64encode(data)
    res, out = su.base64_to_binary_safe(enc, 10)
    assert res.error == ec.OUTPUT_BUFFER_TOO_SMALL
    assert len(out) <= 10
    # the decoded prefix must be a prefix of the data
    assert data.startswith(out)
    # count = input chars consumed; resume from there must work
    consumed = res.count
    res2, out2 = su.base64_to_binary_safe(enc[consumed:], len(data))
    assert res2.is_ok
    assert out + out2 == data


def test_safe_streaming_roundtrip(impl_name):
    data = helpers.random_bytes(4, 1000)
    enc = pybase64.b64encode(data)
    got = b""
    rest = enc
    for _ in range(100):
        res, out = su.base64_to_binary_safe(rest, 77)
        got += out
        if res.error == ec.OUTPUT_BUFFER_TOO_SMALL:
            rest = rest[res.count :]
            continue
        assert res.is_ok
        break
    assert got == data


def test_safe_invalid_char(impl_name):
    res, out = su.base64_to_binary_safe(b"aGVs$bG8=", 100)
    assert res.error == ec.INVALID_BASE64_CHARACTER
    assert res.count == 4
    # decode_up_to_bad_char writes the decodable prefix
    res, out = su.base64_to_binary_safe(
        b"aGVs$bG8=", 100, decode_up_to_bad_char=True
    )
    assert res.error == ec.INVALID_BASE64_CHARACTER
    assert out == b"hel"


def test_safe_partial_tail_fits(impl_name):
    # "aGVsbG8" -> "hello": 4 full chars -> 3 bytes, tail "bG8" -> 2 bytes
    res, out = su.base64_to_binary_safe(b"aGVsbG8", 5)
    assert res.is_ok and out == b"hello"
    # tail does not fit
    res, out = su.base64_to_binary_safe(b"aGVsbG8", 4)
    assert res.error == ec.OUTPUT_BUFFER_TOO_SMALL
    assert out == b"hel"


def test_safe_empty_and_padding(impl_name):
    res, out = su.base64_to_binary_safe(b"", 10)
    assert res.is_ok and out == b""
    res, out = su.base64_to_binary_safe(b"==", 10)
    assert res.error == ec.INVALID_BASE64_CHARACTER
    res, out = su.base64_to_binary_safe(b"==", 10, last_chunk_handling=su.strict)
    assert res.error == ec.BASE64_INPUT_REMAINDER
    res, out = su.base64_to_binary_safe(
        b"==", 10, last_chunk_handling=su.stop_before_partial
    )
    assert res.is_ok


def test_safe_stop_before_partial(impl_name):
    res, out = su.base64_to_binary_safe(
        b"aGVsbG8", 100, last_chunk_handling=su.stop_before_partial
    )
    assert res.is_ok and out == b"hel"
    assert res.count == 4  # stopped before the partial chunk


def test_atomic_aliases(impl_name):
    data = helpers.random_bytes(9, 64)
    enc = pybase64.b64encode(data)
    assert su.atomic_binary_to_base64(data) == su.binary_to_base64(data)
    r1, o1 = su.atomic_base64_to_binary_safe(enc, 1000)
    r2, o2 = su.base64_to_binary_safe(enc, 1000)
    assert (r1, o1) == (r2, o2)


def test_safe_count_is_capacity_independent(impl_name):
    """Review regression: success count must not depend on capacity
    (reference: implementation.cpp:2388 'rr.count = length')."""
    for cap in (4, 5, 100):
        res, out = su.base64_to_binary_safe(b"a G V s", cap)
        assert res.is_ok and res.count == 7 and out == b"hel", (cap, res)


def test_safe_stop_consumes_trailing_padding(impl_name):
    """Review regression: stop_before_partial consumes expected '=' and
    whitespace after a padding-completed chunk
    (implementation.cpp:2355-2386)."""
    for cap in (5, 6, 100):
        res, out = su.base64_to_binary_safe(
            b"aGVs bG8=", cap, last_chunk_handling=su.stop_before_partial
        )
        assert res.is_ok and out == b"hello" and res.count == 9, (cap, res)


def test_forced_unknown_implementation_fails_loudly():
    import subprocess
    import sys

    p = subprocess.run(
        [sys.executable, "-c", "import simdutf_tpu as su; su.validate_utf8(b'x')"],
        env={"PYTHONPATH": "/root/repo", "JAX_PLATFORMS": "cpu",
             "SIMDUTF_TPU_FORCE_IMPLEMENTATION": "no-such-tier",
             "HOME": "/root", "PATH": "/usr/bin:/bin"},
        capture_output=True,
        text=True,
    )
    assert p.returncode != 0 and "no-such-tier" in p.stderr
