"""UTF-32 ops, XLA tier (elementwise checks; scatter expansions).
Refs: src/scalar/utf32.h, utf32_to_utf8/utf16/latin1 scalar kernels."""

from __future__ import annotations

import jax.numpy as jnp

from ..errors import error_code as ec
from .common import BIG, bswap16, excl_scan, positions, scatter_writes, zero_tail

_SURROGATE = int(ec.SURROGATE)
_TOO_LARGE = int(ec.TOO_LARGE)


def _native(words: jnp.ndarray, length):
    # stay in uint32: unsigned compares are exact for values >= 2^31
    # (int64 would silently truncate to int32 without jax_enable_x64)
    return zero_tail(words.astype(jnp.uint32), length)


def first_error(w, length):
    idx = positions(w.shape[0])
    in_r = idx < length
    too_large = (w > 0x10FFFF) & in_r
    surrogate = (w >= 0xD800) & (w <= 0xDFFF) & in_r
    bad = too_large | surrogate
    # one reduction: the key equals idx wherever bad, so argmin alone
    # locates the first bad word; bad[k] distinguishes "none bad"
    k = jnp.argmin(jnp.where(bad, idx, BIG))
    pos = jnp.where(bad[k], k.astype(jnp.int32), BIG)
    code = jnp.where(too_large[k], _TOO_LARGE, _SURROGATE)
    return pos, code


def validate_with_errors(words: jnp.ndarray, length):
    w = _native(words, length)
    pos, code = first_error(w, length)
    ok = pos == BIG
    return jnp.where(ok, 0, code), jnp.where(ok, length, pos)


def utf8_length(words: jnp.ndarray, length):
    w = _native(words, length)
    idx = positions(w.shape[0])
    in_r = idx < length
    n = jnp.sum(in_r)
    n += jnp.sum((w > 0x7F) & in_r)
    n += jnp.sum((w > 0x7FF) & in_r)
    n += jnp.sum((w > 0xFFFF) & in_r)
    return n


def utf16_length(words: jnp.ndarray, length):
    w = _native(words, length)
    idx = positions(w.shape[0])
    in_r = idx < length
    return jnp.sum(in_r) + jnp.sum((w > 0xFFFF) & in_r)


def _emit_utf8(w64, length, n):
    """Shared UTF-8 emission from clamped codepoints: (out u8[4N], off,
    total)."""
    idx = positions(n)
    in_r = idx < length
    # clamp garbage (>0x10FFFF) so bit ops stay sane; truncated away anyway
    cp = jnp.where(w64 > 0x10FFFF, 0, w64).astype(jnp.int32)
    width = jnp.where(in_r, 1, 0)
    width += jnp.where(in_r & (cp > 0x7F), 1, 0)
    width += jnp.where(in_r & (cp > 0x7FF), 1, 0)
    width += jnp.where(in_r & (cp > 0xFFFF), 1, 0)
    off, off_inc = excl_scan(width, n)
    total = off_inc[n - 1]
    cap = 4 * n
    w1, w2, w3, w4 = width == 1, width == 2, width == 3, width == 4
    b0 = jnp.where(w1, cp, 0)
    b0 = jnp.where(w2, (cp >> 6) | 0xC0, b0)
    b0 = jnp.where(w3, (cp >> 12) | 0xE0, b0)
    b0 = jnp.where(w4, (cp >> 18) | 0xF0, b0)
    b1 = jnp.where(w2, (cp & 0x3F) | 0x80, 0)
    b1 = jnp.where(w3, ((cp >> 6) & 0x3F) | 0x80, b1)
    b1 = jnp.where(w4, ((cp >> 12) & 0x3F) | 0x80, b1)
    b2 = jnp.where(w3, (cp & 0x3F) | 0x80, 0)
    b2 = jnp.where(w4, ((cp >> 6) & 0x3F) | 0x80, b2)
    b3 = (cp & 0x3F) | 0x80
    out = scatter_writes(cap, jnp.uint8, [
        (in_r, off, b0),
        (in_r & (width >= 2), off + 1, b1),
        (in_r & (width >= 3), off + 2, b2),
        (in_r & (width >= 4), off + 3, b3),
    ])
    return out, off, total


def _emit_utf16(w64, length, n, big_endian):
    """Shared UTF-16 emission: (out u16[2N], off, total)."""
    idx = positions(n)
    in_r = idx < length
    cp = jnp.where(w64 > 0x10FFFF, 0, w64).astype(jnp.int32)
    is4 = (cp > 0xFFFF) & in_r
    width = jnp.where(in_r, 1, 0) + is4.astype(jnp.int32)
    off, off_inc = excl_scan(width, n)
    total = off_inc[n - 1]
    cap = 2 * n
    cpx = cp - 0x10000
    unit0 = jnp.where(is4, 0xD800 + (cpx >> 10), cp)
    unit1 = 0xDC00 + (cpx & 0x3FF)
    if big_endian:
        unit0 = bswap16(unit0)
        unit1 = bswap16(unit1)
    out = scatter_writes(cap, jnp.uint16, [
        (in_r, off, unit0),
        (is4, off + 1, unit1),
    ])
    return out, off, total


def to_utf8(words: jnp.ndarray, length):
    """Returns (err_code, err_pos, out u8[4N], out_len)."""
    n = words.shape[0]
    w64 = _native(words, length)
    err_pos, err_code = first_error(w64, length)
    ok = err_pos == BIG
    out, off, total = _emit_utf8(w64, length, n)
    clamped = jnp.minimum(err_pos, n - 1)
    # off[0] == 0 for an exclusive scan, so err_pos == 0 needs no special case
    out_len = jnp.where(ok, total, off[clamped])
    return (
        jnp.where(ok, 0, err_code),
        jnp.where(ok, length, err_pos),
        out,
        out_len,
    )


def to_utf8_valid(words: jnp.ndarray, length):
    """convert_valid_utf32_to_utf8: skips the range/surrogate checks
    (reference: per-arch convert_valid kernels). Returns (out, total)."""
    n = words.shape[0]
    w64 = _native(words, length)
    out, _, total = _emit_utf8(w64, length, n)
    return out, total


def to_utf16(words: jnp.ndarray, length, big_endian: bool):
    """Returns (err_code, err_pos, out u16[2N], out_len)."""
    n = words.shape[0]
    w64 = _native(words, length)
    err_pos, err_code = first_error(w64, length)
    ok = err_pos == BIG
    out, off, total = _emit_utf16(w64, length, n, big_endian)
    clamped = jnp.minimum(err_pos, n - 1)
    # off[0] == 0 for an exclusive scan, so err_pos == 0 needs no special case
    out_len = jnp.where(ok, total, off[clamped])
    return (
        jnp.where(ok, 0, err_code),
        jnp.where(ok, length, err_pos),
        out,
        out_len,
    )


def to_utf16_valid(words: jnp.ndarray, length, big_endian: bool):
    """convert_valid_utf32_to_utf16: no validation pass. (out, total)."""
    n = words.shape[0]
    w64 = _native(words, length)
    out, _, total = _emit_utf16(w64, length, n, big_endian)
    return out, total


def to_latin1(words: jnp.ndarray, length):
    n = words.shape[0]
    w = _native(words, length)
    idx = positions(n)
    bad = (w > 0xFF) & (idx < length)
    err_pos = jnp.min(jnp.where(bad, idx, BIG))
    ok = err_pos == BIG
    out = (w & 0xFF).astype(jnp.uint8)
    out_len = jnp.where(ok, length, err_pos)
    return (
        jnp.where(ok, 0, _TOO_LARGE),
        jnp.where(ok, length, err_pos),
        out,
        out_len,
    )


def to_latin1_valid(words: jnp.ndarray, length):
    """convert_valid_utf32_to_latin1: a pure narrowing store. (out, total)."""
    w = _native(words, length)
    return (w & 0xFF).astype(jnp.uint8), length
