"""Differential fuzzing across registered implementations.

Model: fuzz/conversion.cpp + fuzz/roundtrip.cpp — all implementations must
agree bit-for-bit on results (including error codes/positions); valid-input
roundtrips must be identities. Seeded (deterministic), run in CI.
"""

import base64 as pybase64
import random

import numpy as np
import pytest

import helpers
import oracle
import simdutf_tpu as su


def _impls():
    return sorted(su.get_available_implementations())


def _gen_inputs(seed: int, n_cases: int = 40):
    """Byte soups: valid text, mutated text, random bytes, pathological."""
    rng = random.Random(seed)
    out = []
    for i in range(n_cases):
        kind = i % 4
        if kind == 0:
            out.append(helpers.random_utf8(seed * 100 + i, rng.randrange(1, 300), 2, 1, 1, 1))
        elif kind == 1:
            out.append(
                helpers.mutate(
                    helpers.random_utf8(seed * 100 + i, rng.randrange(1, 300), 1, 1, 1, 1),
                    i,
                    rng.randrange(1, 4),
                )
            )
        elif kind == 2:
            out.append(helpers.random_bytes(seed * 100 + i, rng.randrange(0, 400)))
        else:
            b = rng.choice([b"\x80", b"\xc0", b"\xe0\x80", b"\xf4\x90", b"\xed\xa0"])
            out.append(
                helpers.random_utf8(i, rng.randrange(0, 50), 1, 1, 0, 0)
                + b * rng.randrange(1, 5)
                + helpers.random_utf8(i + 1, rng.randrange(0, 50), 1, 0, 1, 1)
            )
    return out


@pytest.mark.parametrize("seed", range(4))
def test_utf8_differential(seed):
    cases = _gen_inputs(seed)
    impls = _impls()
    for data in cases:
        results = {}
        for name in impls:
            su.set_active_implementation(name)
            r = su.validate_utf8_with_errors(data)
            cr, co = su.convert_utf8_to_utf16le_with_errors(data)
            c32r, c32o = su.convert_utf8_to_utf32_with_errors(data)
            l1r, l1o = su.convert_utf8_to_latin1_with_errors(data)
            cnt = su.count_utf8(data)
            u16l = su.utf16_length_from_utf8(data)
            results[name] = (r, cr, co, c32r, c32o, l1r, l1o, cnt, u16l)
        su.set_active_implementation("fallback")
        vals = list(results.values())
        for name, v in results.items():
            assert v == vals[0], (
                f"deviation in {name} on {data.hex()}: {v} != {vals[0]}"
            )
        # cross-check against the oracle
        assert vals[0][0] == oracle.validate_utf8_with_errors(data)


@pytest.mark.parametrize("seed", range(3))
def test_utf8_roundtrip(seed):
    impls = _impls()
    for i in range(20):
        data = helpers.random_utf8(seed * 50 + i, 200, 2, 1, 1, 1)
        for name in impls:
            su.set_active_implementation(name)
            u16 = su.convert_utf8_to_utf16le(data)
            assert su.convert_utf16le_to_utf8(u16) == data
            u32 = su.convert_utf8_to_utf32(data)
            assert su.convert_utf32_to_utf8(u32) == data
        su.set_active_implementation("fallback")


@pytest.mark.parametrize("seed", range(3))
def test_utf16_differential(seed):
    rng = random.Random(seed)
    impls = _impls()
    for i in range(20):
        if i % 2:
            data = helpers.random_utf16(seed * 50 + i, rng.randrange(1, 200), 2, 1)
        else:
            data = helpers.random_bytes(seed * 50 + i, rng.randrange(0, 200) * 2)
        results = {}
        for name in impls:
            su.set_active_implementation(name)
            results[name] = (
                su.validate_utf16le_with_errors(data),
                su.convert_utf16le_to_utf8_with_errors(data),
                su.convert_utf16le_to_utf32_with_errors(data),
                su.count_utf16le(data),
                su.to_well_formed_utf16le(data),
            )
        su.set_active_implementation("fallback")
        vals = list(results.values())
        for name, v in results.items():
            assert v == vals[0], f"deviation in {name} on {data.hex()}"
        # well-formed output must validate everywhere
        assert oracle.validate_utf16(vals[0][4], False)


@pytest.mark.parametrize("seed", range(3))
def test_base64_differential(seed):
    rng = random.Random(seed)
    impls = _impls()
    cases = []
    for i in range(25):
        k = i % 3
        if k == 0:
            cases.append(pybase64.b64encode(helpers.random_bytes(seed * 9 + i, rng.randrange(0, 200))))
        elif k == 1:
            cases.append(helpers.mutate(
                pybase64.b64encode(helpers.random_bytes(seed * 9 + i, 100)), i, 2))
        else:
            cases.append(helpers.random_bytes(seed * 9 + i, rng.randrange(0, 100)))
    for data in cases:
        for options in (0, 1, 8):
            for chunk in (0, 1, 2):
                results = {}
                for name in impls:
                    su.set_active_implementation(name)
                    results[name] = su.base64_to_binary_details(data, options, chunk)
                su.set_active_implementation("fallback")
                vals = list(results.values())
                for name, v in results.items():
                    assert v == vals[0], (
                        f"deviation in {name} on {data!r} opt={options} chunk={chunk}"
                    )
                assert vals[0][0] == oracle.base64_to_binary(data, options, chunk)[0]


@pytest.mark.parametrize("seed", range(2))
def test_base64_roundtrip(seed):
    impls = _impls()
    for i in range(15):
        data = helpers.random_bytes(seed * 31 + i, i * 13 + 1)
        for name in impls:
            su.set_active_implementation(name)
            for opt in (0, 1, 2, 3):
                enc = su.binary_to_base64(data, opt)
                res, dec = su.base64_to_binary(enc, opt & 1)
                assert res.is_ok and dec == data
        su.set_active_implementation("fallback")
