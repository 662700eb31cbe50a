"""Property-based differential tests (hypothesis) — shrinking random
counterexamples, complementing the seeded fuzzers."""

import hypothesis
from hypothesis import given, settings, strategies as st

import oracle
import simdutf_tpu as su

hypothesis.settings.register_profile(
    "ci", max_examples=150, deadline=None, derandomize=True
)
hypothesis.settings.register_profile(
    "deep", max_examples=3000, deadline=None, derandomize=False
)
import os as _os  # noqa: E402

hypothesis.settings.load_profile(_os.environ.get("HYPOTHESIS_PROFILE", "ci"))


@given(st.binary(max_size=300))
def test_utf8_validity_matches_python_decoder(data):
    py_ok = True
    try:
        data.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        py_ok = False
    assert su.validate_utf8(data) == py_ok
    assert oracle.validate_utf8(data) == py_ok


@given(st.binary(max_size=200))
def test_utf8_result_parity_all_tiers(data):
    expect = oracle.validate_utf8_with_errors(data)
    for name in su.get_available_implementations():
        su.set_active_implementation(name)
        assert su.validate_utf8_with_errors(data) == expect, name
    su.set_active_implementation("fallback")


@given(st.text(max_size=120))
def test_transcode_roundtrip_identity(s):
    data = s.encode("utf-8")
    u16 = su.convert_utf8_to_utf16le(data)
    assert u16 == s.encode("utf-16-le")
    assert su.convert_utf16le_to_utf8(u16) == data
    u32 = su.convert_utf8_to_utf32(data)
    assert su.convert_utf32_to_utf8(u32) == data


@given(st.binary(max_size=200), st.sampled_from([0, 1, 8]),
       st.sampled_from([0, 1, 2]))
def test_base64_decode_parity(data, options, chunk):
    expect = oracle.base64_to_binary(data, options, chunk)
    got = su.base64_to_binary_details(data, options, chunk)
    assert (got[0], got[1]) == expect


@given(st.binary(max_size=150), st.sampled_from([0, 1, 2, 3]))
def test_base64_encode_decode_identity(data, options):
    enc = su.binary_to_base64(data, options)
    res, dec = su.base64_to_binary(enc, options & 1)
    assert res.is_ok and dec == data


@given(st.binary(max_size=120))
def test_trim_partial_prefix_valid(data):
    # for valid utf8, every trimmed prefix must validate
    if not oracle.validate_utf8(data):
        return
    for cut in range(len(data) + 1):
        t = su.trim_partial_utf8(data[:cut])
        assert su.validate_utf8(data[:t])


@given(st.lists(st.integers(0, 0xFFFF), max_size=80))
def test_to_well_formed_always_valid(units):
    import numpy as np

    data = np.array(units, dtype=np.uint16).tobytes()
    fixed = su.to_well_formed_utf16le(data)
    assert su.validate_utf16le(fixed)
    # already-valid input is unchanged
    if su.validate_utf16le(data):
        assert fixed == data
