"""Replay the reference's base64 adversarial corpus on every tier.

Inputs are extracted as data by tools/extract_ref_vectors.py from
/root/reference/tests/{base64_tests,atomic_base64_tests}.cpp (the curated
padding x whitespace x last_chunk x url found-bug reproducers) plus a
systematic lattice over the same dimensions. Expected outcomes come from
the golden scalar model — the repo's semantics oracle — so every tier
must agree with it exactly (error code, input/output counts, bytes) over
the full options matrix. This is the reference's own differential-fuzz
bar: "deviations are not tolerated" (fuzz/README.md:8-16).
"""

import base64
import functools
import json
import os

import numpy as np
import pytest

import simdutf_tpu as su
from simdutf_tpu.golden import base64_impl as gb

_HERE = os.path.dirname(__file__)
with open(os.path.join(_HERE, "data", "ref_vectors.json")) as f:
    _V = json.load(f)

VECTORS = [base64.b64decode(v["data"]) for v in _V["base64_inputs"]]
NAMES = [v["test"] for v in _V["base64_inputs"]]

OPTIONS = (
    gb.BASE64_DEFAULT,
    gb.BASE64_URL,
    gb.BASE64_DEFAULT_OR_URL,
    gb.BASE64_DEFAULT_ACCEPT_GARBAGE,
    gb.BASE64_URL_ACCEPT_GARBAGE,
    gb.BASE64_DEFAULT_OR_URL_ACCEPT_GARBAGE,
)
CHUNKS = (gb.LOOSE, gb.STRICT, gb.STOP_BEFORE_PARTIAL)
_COMBOS = [(o, c) for o in OPTIONS for c in CHUNKS]


@functools.lru_cache(maxsize=None)
def _expected(i: int, options: int, chunk: int):
    arr = np.frombuffer(VECTORS[i], np.uint8)
    full, out = gb.decode(arr, options, chunk)
    return full, bytes(out)


def _replay(i: int, options: int, chunk: int):
    data = VECTORS[i]
    want_full, want_out = _expected(i, options, chunk)
    got_full, got_out = su.base64_to_binary_details(data, options, chunk)
    assert got_full.error == want_full.error, (
        NAMES[i], options, chunk, got_full, want_full)
    assert got_full.input_count == want_full.input_count, (
        NAMES[i], options, chunk, got_full, want_full)
    assert got_full.output_count == want_full.output_count, (
        NAMES[i], options, chunk)
    assert bytes(got_out) == want_out, (NAMES[i], options, chunk)


@pytest.mark.parametrize("i", range(len(VECTORS)))
def test_base64_vectors_full_matrix_host(i):
    """Full 18-combo matrix on the auto-selected (host-routed) tier."""
    for options, chunk in _COMBOS:
        _replay(i, options, chunk)


@pytest.mark.parametrize("i", range(len(VECTORS)))
def test_base64_vectors_per_tier(impl_name, i):
    """Per-tier replay: a deterministic 3-combo spread per vector keeps
    device-tier runtime bounded while every combo is hit across the
    corpus (i-indexed rotation)."""
    for k in range(3):
        options, chunk = _COMBOS[(i * 3 + k) % len(_COMBOS)]
        _replay(i, options, chunk)


@pytest.mark.parametrize("i", range(0, len(VECTORS), 7))
def test_base64_safe_capacity_parity(impl_name, i):
    """base64_to_binary_safe with a tight capacity must honor the
    reference's OUTPUT_BUFFER_TOO_SMALL / partial-consumption contract;
    parity is pinned against the golden safe decoder on the same inputs
    (implementation.h:3090-3260 semantics)."""
    data = VECTORS[i]
    want_full, _ = _expected(i, gb.BASE64_DEFAULT, gb.LOOSE)
    for cap in (0, 1, max(0, want_full.output_count - 1),
                want_full.output_count):
        got_res, got_out = su.base64_to_binary_safe(data, cap)
        wres, wout = gb.decode_safe(np.frombuffer(data, np.uint8), cap,
                                    gb.BASE64_DEFAULT, gb.LOOSE)
        assert got_res.error == wres.error, (NAMES[i], cap, got_res, wres)
        assert got_res.count == wres.count, (NAMES[i], cap, got_res, wres)
        assert bytes(got_out) == bytes(wout), (NAMES[i], cap)
