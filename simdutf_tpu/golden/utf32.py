"""Vectorized NumPy UTF-32 machinery (scalar refs: src/scalar/utf32.h,
src/scalar/utf32_to_utf8/utf32_to_utf8.h, utf32_to_utf16, utf32_to_latin1).
UTF-32 checks are purely elementwise, so there is no event subtlety."""

from __future__ import annotations

import numpy as np

from ..errors import Result, error_code as ec
from .utf16 import _emit_utf8

_NO_ERROR = np.iinfo(np.int32).max


def first_error(w: np.ndarray) -> tuple[int, int]:
    """w: int64 view of uint32 words. TOO_LARGE dominates at a given word
    (scalar/utf32.h:26-33 checks TOO_LARGE first)."""
    too_large = w > 0x10FFFF
    surrogate = (w >= 0xD800) & (w <= 0xDFFF)
    bad = too_large | surrogate
    if not bad.any():
        return _NO_ERROR, 0
    pos = int(np.argmax(bad))
    return pos, int(ec.TOO_LARGE if too_large[pos] else ec.SURROGATE)


def _i64(words: np.ndarray) -> np.ndarray:
    return words.astype(np.int64)


def validate(words: np.ndarray) -> bool:
    return first_error(_i64(words))[0] == _NO_ERROR


def validate_with_errors(words: np.ndarray) -> Result:
    w = _i64(words)
    pos, code = first_error(w)
    if pos == _NO_ERROR:
        return Result(ec.SUCCESS, int(w.shape[0]))
    return Result(ec(code), pos)


def utf8_length(words: np.ndarray) -> int:
    w = _i64(words)
    n = int(w.shape[0])
    n += int(np.count_nonzero(w > 0x7F))
    n += int(np.count_nonzero(w > 0x7FF))
    n += int(np.count_nonzero(w > 0xFFFF))
    return n


def utf16_length(words: np.ndarray) -> int:
    w = _i64(words)
    return int(w.shape[0]) + int(np.count_nonzero(w > 0xFFFF))


def latin1_length(words: np.ndarray) -> int:
    return int(words.shape[0])


def convert_to_utf8_with_errors(words: np.ndarray):
    """Error lattice differs from validation: surrogates are only detected in
    the 3-byte range branch; large values in the 4-byte branch
    (scalar/utf32_to_utf8/utf32_to_utf8.h:131-178) — same outcome as
    validation order, TOO_LARGE for >0x10FFFF, SURROGATE in BMP."""
    w = _i64(words)
    pos, code = first_error(w)
    upto = int(w.shape[0]) if pos == _NO_ERROR else pos
    wv = w[:upto]
    width = np.ones(upto, dtype=np.int32)
    width += (wv > 0x7F).astype(np.int32)
    width += (wv > 0x7FF).astype(np.int32)
    width += (wv > 0xFFFF).astype(np.int32)
    out = _emit_utf8(wv, width)
    if pos == _NO_ERROR:
        return Result(ec.SUCCESS, int(out.shape[0])), out
    return Result(ec(code), pos), out


def convert_to_utf16_with_errors(words: np.ndarray, big_endian: bool):
    # scalar/utf32_to_utf16/utf32_to_utf16.h:228-268: BMP surrogate ->
    # SURROGATE; >0x10FFFF -> TOO_LARGE.
    w = _i64(words)
    pos, code = first_error(w)
    upto = int(w.shape[0]) if pos == _NO_ERROR else pos
    wv = w[:upto]
    is4 = wv > 0xFFFF
    units = 1 + is4.astype(np.int32)
    total = int(units.sum())
    off = np.cumsum(units) - units
    out = np.zeros(total, dtype=np.uint32)
    out[off] = np.where(is4, 0xD800 + ((wv - 0x10000) >> 10), wv)
    out[off[is4] + 1] = 0xDC00 + ((wv[is4] - 0x10000) & 0x3FF)
    out16 = out.astype(np.uint16)
    if big_endian:
        out16 = out16.byteswap()
    if pos == _NO_ERROR:
        return Result(ec.SUCCESS, total), out16
    return Result(ec(code), pos), out16


def convert_to_latin1_with_errors(words: np.ndarray):
    # scalar/utf32_to_latin1/utf32_to_latin1.h:292-315: any word >0xFF is
    # TOO_LARGE (surrogates included).
    w = _i64(words)
    big = w > 0xFF
    if big.any():
        pos = int(np.argmax(big))
        return Result(ec.TOO_LARGE, pos), w[:pos].astype(np.uint8)
    return Result(ec.SUCCESS, int(w.shape[0])), w.astype(np.uint8)
