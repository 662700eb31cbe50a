"""Random input generators with controlled byte-class mixes.

Same role as the reference's tests/helpers/random_utf8.h:13-32 (probability
weights per sequence length) and random_utf16/random_int.
"""

from __future__ import annotations

import random

import numpy as np


def random_utf8(seed: int, n_codepoints: int, p1=1, p2=0, p3=0, p4=0) -> bytes:
    """Valid UTF-8 with the given per-length weights."""
    rng = random.Random(seed)
    weights = [p1, p2, p3, p4]
    out = []
    for _ in range(n_codepoints):
        k = rng.choices([1, 2, 3, 4], weights=weights)[0]
        if k == 1:
            cp = rng.randrange(0x00, 0x80)
        elif k == 2:
            cp = rng.randrange(0x80, 0x800)
        elif k == 3:
            cp = rng.randrange(0x800, 0x10000)
            while 0xD800 <= cp <= 0xDFFF:
                cp = rng.randrange(0x800, 0x10000)
        else:
            cp = rng.randrange(0x10000, 0x110000)
        out.append(chr(cp))
    return "".join(out).encode("utf-8")


def random_utf16(seed: int, n_codepoints: int, p_bmp=1, p_astral=0,
                 big_endian=False) -> bytes:
    rng = random.Random(seed)
    units: list[int] = []
    for _ in range(n_codepoints):
        if rng.random() < p_astral / max(p_bmp + p_astral, 1e-9):
            cp = rng.randrange(0x10000, 0x110000)
            cp -= 0x10000
            units.append(0xD800 + (cp >> 10))
            units.append(0xDC00 + (cp & 0x3FF))
        else:
            cp = rng.randrange(0x0000, 0x10000)
            while 0xD800 <= cp <= 0xDFFF:
                cp = rng.randrange(0x0000, 0x10000)
            units.append(cp)
    arr = np.array(units, dtype=np.uint16)
    if big_endian:
        arr = arr.byteswap()
    return arr.tobytes()


def random_utf32(seed: int, n_codepoints: int, p_astral=0.2) -> bytes:
    rng = random.Random(seed)
    out = []
    for _ in range(n_codepoints):
        if rng.random() < p_astral:
            cp = rng.randrange(0x10000, 0x110000)
        else:
            cp = rng.randrange(0, 0x10000)
            while 0xD800 <= cp <= 0xDFFF:
                cp = rng.randrange(0, 0x10000)
        out.append(cp)
    return np.array(out, dtype=np.uint32).tobytes()


def random_bytes(seed: int, n: int) -> bytes:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()


def mutate(data: bytes, seed: int, n_mutations: int = 1) -> bytes:
    """Random byte flips — the brute-force corruption strategy of
    validate_utf8_brute_force_tests.cpp."""
    rng = random.Random(seed)
    buf = bytearray(data)
    for _ in range(n_mutations):
        if not buf:
            break
        i = rng.randrange(len(buf))
        buf[i] = rng.randrange(256)
    return bytes(buf)
