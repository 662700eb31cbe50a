"""Latin1 source conversions — always valid input, pure widen/expand
(scalar refs: src/scalar/latin1_to_utf8/latin1_to_utf8.h,
latin1_to_utf16, latin1_to_utf32, src/scalar/latin1.h)."""

from __future__ import annotations

import numpy as np


def utf8_length(b: np.ndarray) -> int:
    # scalar/latin1.h:9-19
    return int(b.shape[0]) + int(np.count_nonzero(b >= 0x80))


def utf16_length(b: np.ndarray) -> int:
    return int(b.shape[0])


def utf32_length(b: np.ndarray) -> int:
    return int(b.shape[0])


def convert_to_utf8(b: np.ndarray) -> np.ndarray:
    w = b.astype(np.int32)
    hi = w >= 0x80
    width = 1 + hi.astype(np.int32)
    total = int(width.sum())
    off = np.cumsum(width) - width
    out = np.zeros(total, dtype=np.int32)
    out[off] = np.where(hi, (w >> 6) | 0xC0, w)
    out[off[hi] + 1] = (w[hi] & 0x3F) | 0x80
    return out.astype(np.uint8)


def convert_to_utf16(b: np.ndarray, big_endian: bool) -> np.ndarray:
    out = b.astype(np.uint16)
    if big_endian:
        out = out.byteswap()
    return out


def convert_to_utf32(b: np.ndarray) -> np.ndarray:
    return b.astype(np.uint32)
