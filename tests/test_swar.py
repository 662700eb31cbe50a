"""SWAR any-error check must agree with the exact event kernel (and hence
the oracle) on validity for every input class."""

import numpy as np
import pytest

import helpers
import oracle
from simdutf_tpu.kernels import swar as ksw
from simdutf_tpu.kernels.impl import _pad_swar


def _ok(data: bytes) -> bool:
    x32, n = _pad_swar(np.frombuffer(data, np.uint8))
    return int(ksw.utf8_swar_first_bad_word(x32)) == ksw.BIG


CASES = []
CASES += [helpers.random_utf8(s, 300, 2, 1, 1, 1) for s in range(10)]
CASES += [helpers.mutate(helpers.random_utf8(s, 300, 1, 1, 1, 1), s, 2) for s in range(20)]
CASES += [helpers.random_bytes(s, 200) for s in range(10)]
CASES += [
    b"", b"a", b"\x80", b"\xc3", b"\xc3\xa9", b"\xc0\xaf", b"\xe0\x80\x80",
    b"\xed\x9f\xbf", b"\xed\xa0\x80", b"\xf0\x8f\xbf\xbf", b"\xf0\x90\x80\x80",
    b"\xf4\x8f\xbf\xbf", b"\xf4\x90\x80\x80", b"\xf5\x80\x80\x80", b"\xf8\x88",
    b"A" * 511 + b"\xe4\xb8\xad", b"A" * 32767 + b"\xc3\xa9",
    b"A" * 32765 + b"\xf0\x9f\x98\x80",   # 4-byte across the tile boundary
    b"A" * 32767 + b"\xf0\x9f\x98",       # truncated at tile boundary
]
# every 2-byte combination class
for b0 in range(0xC0, 0xE0, 3):
    for b1 in (0x7F, 0x80, 0xBF, 0xC0):
        CASES.append(bytes([b0, b1]))


@pytest.mark.parametrize("i", range(len(CASES)))
def test_swar_matches_oracle_validity(i):
    data = CASES[i]
    assert _ok(data) == oracle.validate_utf8(data), data[:24].hex()


def test_no_pool_collision_between_layouts():
    """Review regression: _pad2d (data at offset 0) and _pad_swar (data
    after a leading zero tile) must never share a pool buffer — stale lead
    bytes in the SWAR halo flipped validity both ways."""
    import simdutf_tpu as su

    su.set_active_implementation("pallas")
    try:
        # same bucket shape for both layouts: n=40000 -> (192, 512)-ish
        b1 = b"A" * 32767 + b"\xe4\xb8\xad" + b"B" * 7000  # lead at 32767 area
        assert su.count_utf8(b1) == oracle.count_utf8(b1)  # uses _pad2d
        good = b"plain ascii " * 80
        assert su.validate_utf8(good)  # uses _pad_swar; halo must be clean
        bad = b"\x80" + b"x" * 998
        assert not su.validate_utf8(bad)  # stray continuation must stay bad
    finally:
        su.set_active_implementation("fallback")


def _swar_flags_numpy(s: bytes) -> bool:
    """Byte-level NumPy mirror of the SWAR predicate set (same derivation
    as kernels/swar.py, without the int32 packing): returns whether any
    error predicate fires for the zero-padded string."""
    b = np.frombuffer(s, np.uint8).astype(np.int32)
    b = np.concatenate([b, np.zeros(4, np.int32)])  # zero tail
    n = b.shape[0]

    def sh(k):  # b[i+k], zero-filled
        out = np.zeros(n, np.int32)
        out[: n - k] = b[k:]
        return out

    def ph(k):  # b[i-k], zero-filled (zero lead tile)
        out = np.zeros(n, np.int32)
        out[k:] = b[: n - k]
        return out

    cont = (b & 0xC0) == 0x80
    def lead234(x):
        return (
            ((x & 0xE0) == 0xC0) | ((x & 0xF0) == 0xE0) | ((x & 0xF8) == 0xF0)
        )
    must = (
        lead234(ph(1))
        | (((ph(2) & 0xF0) == 0xE0) | ((ph(2) & 0xF8) == 0xF0))
        | ((ph(3) & 0xF8) == 0xF0)
    )
    err = must ^ cont
    b1 = sh(1)
    err |= (b & 0xFE) == 0xC0
    err |= (b == 0xE0) & ((b1 & 0xE0) == 0x80)
    err |= (b == 0xED) & ((b1 & 0xE0) == 0xA0)
    err |= (b == 0xF0) & ((b1 & 0xF0) == 0x80)
    err |= (b == 0xF4) & ~((b1 & 0xF0) == 0x80)
    err |= ((b & 0xFC) == 0xF4) & (b != 0xF4)
    err |= (b & 0xF8) == 0xF8
    return bool(err.any())


def test_swar_formulas_exhaustive_2byte():
    for b0 in range(256):
        for b1 in range(256):
            s = bytes([b0, b1])
            assert _swar_flags_numpy(s) == (not oracle.validate_utf8(s)), s.hex()


def test_swar_formulas_3byte_sampled():
    probes = (0x00, 0x41, 0x7F, 0x80, 0x8F, 0x90, 0x9F, 0xA0, 0xBF,
              0xC0, 0xC2, 0xE0, 0xED, 0xF0, 0xF4, 0xFF)
    for b0 in range(256):
        for b1 in probes:
            for b2 in probes:
                s = bytes([b0, b1, b2])
                assert _swar_flags_numpy(s) == (
                    not oracle.validate_utf8(s)
                ), s.hex()


def test_swar_formulas_4byte_leads():
    probes = (0x7F, 0x80, 0x8F, 0x90, 0xBF, 0xC0)
    for b0 in (0xF0, 0xF1, 0xF3, 0xF4, 0xF5, 0xF7, 0xF8):
        for b1 in probes:
            for b2 in probes:
                for b3 in probes:
                    s = bytes([b0, b1, b2, b3])
                    assert _swar_flags_numpy(s) == (
                        not oracle.validate_utf8(s)
                    ), s.hex()
