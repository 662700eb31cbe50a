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
