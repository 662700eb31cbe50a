"""UTF-16 ops, XLA tier.

Surrogate mask algebra per generic/validate_utf16.h:48-126; exact first
error by event minimum (see golden/utf16.py). ``words`` is a padded uint16
buffer (raw storage order) + dynamic ``length`` in code units.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..errors import error_code as ec
from .common import (
    BIG,
    bswap16,
    excl_scan,
    positions,
    scatter_writes,
    shift_left,
    zero_tail,
)

_SURROGATE = int(ec.SURROGATE)
_TOO_LARGE = int(ec.TOO_LARGE)


def native(words: jnp.ndarray, length, big_endian: bool) -> jnp.ndarray:
    w = words.astype(jnp.int32)
    if big_endian:
        w = bswap16(w)
    return zero_tail(w, length)


def first_error(w: jnp.ndarray, length):
    """(err_pos, code); BIG when valid. w: native int32, tail zeroed."""
    n = w.shape[0]
    idx = positions(n)
    in_r = idx < length
    is_high = ((w & 0xFC00) == 0xD800) & in_r
    is_low = ((w & 0xFC00) == 0xDC00) & in_r
    next_low = shift_left(is_low.astype(jnp.int32), 1).astype(bool)
    prev_high = jnp.pad(is_high[:-1], (1, 0))
    bad = (is_high & ~next_low) | (is_low & ~prev_high)
    pos = jnp.min(jnp.where(bad, idx, BIG))
    return pos, _SURROGATE


def validate_with_errors(words: jnp.ndarray, length, big_endian: bool):
    w = native(words, length, big_endian)
    pos, code = first_error(w, length)
    ok = pos == BIG
    return jnp.where(ok, 0, code), jnp.where(ok, length, pos)


def count_code_points(words: jnp.ndarray, length, big_endian: bool):
    w = native(words, length, big_endian)
    idx = positions(w.shape[0])
    return jnp.sum(((w & 0xFC00) != 0xDC00) & (idx < length))


def utf8_length(words: jnp.ndarray, length, big_endian: bool):
    # scalar/utf16.h:80-94
    w = native(words, length, big_endian)
    idx = positions(w.shape[0])
    in_r = idx < length
    n = jnp.sum(in_r)
    n += jnp.sum((w > 0x7F) & in_r)
    n += jnp.sum((((w > 0x7FF) & (w <= 0xD7FF)) | (w >= 0xE000)) & in_r)
    return n


def change_endianness(words: jnp.ndarray):
    w = words.astype(jnp.int32)
    return bswap16(w).astype(jnp.uint16)


def to_well_formed(words: jnp.ndarray, length, big_endian: bool):
    """U+FFFD substitution (scalar/utf16.h:141-166), elementwise with a
    one-unit lookback — the reference's utf16fix (arXiv:2601.06349)."""
    w = native(words, length, big_endian)
    idx = positions(w.shape[0])
    in_r = idx < length
    is_high = ((w & 0xFC00) == 0xD800) & in_r
    is_low = ((w & 0xFC00) == 0xDC00) & in_r
    next_low = shift_left(is_low.astype(jnp.int32), 1).astype(bool)
    prev_high = jnp.pad(is_high[:-1], (1, 0))
    bad = (is_high & ~next_low) | (is_low & ~prev_high)
    out = jnp.where(bad & in_r, 0xFFFD, w)
    if big_endian:
        out = bswap16(out)
    # restore original (unswapped) payload outside range for cleanliness
    out = jnp.where(in_r, out, words.astype(jnp.int32))
    return out.astype(jnp.uint16)


def _codepoints(w: jnp.ndarray, length):
    """Per-unit codepoints: highs carry the astral codepoint, lows width 0.
    Only meaningful on the valid prefix."""
    idx = positions(w.shape[0])
    in_r = idx < length
    is_high = ((w & 0xFC00) == 0xD800) & in_r
    is_low = ((w & 0xFC00) == 0xDC00) & in_r
    nxt = shift_left(w, 1)
    cp = jnp.where(is_high, ((w - 0xD800) << 10) + (nxt - 0xDC00) + 0x10000, w)
    start = ~is_low & in_r
    return cp, start




def _emit_utf8(cp, start, width, n):
    """Scatter UTF-8 bytes for per-unit codepoints: shared by the
    validating and valid-only converters. Returns (out u8[3n], total)."""
    off, off_inc = excl_scan(width, n)
    total = off_inc[n - 1]
    cap = 3 * n
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
        (start, off, b0),
        (start & (width >= 2), off + 1, b1),
        (start & (width >= 3), off + 2, b2),
        (start & (width >= 4), off + 3, b3),
    ])
    return out, off, total


def _utf8_widths(cp, start):
    width = jnp.where(start, 1, 0)
    width += jnp.where(start & (cp > 0x7F), 1, 0)
    width += jnp.where(start & (cp > 0x7FF), 1, 0)
    width += jnp.where(start & (cp > 0xFFFF), 1, 0)
    return width

def to_utf8(words: jnp.ndarray, length, big_endian: bool):
    """Returns (err_code, err_pos, out u8[3N], out_len)."""
    n = words.shape[0]
    w = native(words, length, big_endian)
    err_pos, err_code = first_error(w, length)
    ok = err_pos == BIG

    cp, start = _codepoints(w, length)
    width = _utf8_widths(cp, start)
    out, off, total = _emit_utf8(cp, start, width, n)
    clamped = jnp.minimum(err_pos, n - 1)
    # off[0] == 0 for an exclusive scan, so err_pos == 0 needs no special case
    out_len = jnp.where(ok, total, off[clamped])
    return (
        jnp.where(ok, 0, err_code),
        jnp.where(ok, length, err_pos),
        out,
        out_len,
    )


def _emit_utf32(cp, start, n):
    """Shared UTF-32 emission: scan the start mask, scatter codepoints.
    Returns (out u32[n], off, total)."""
    width = start.astype(jnp.int32)
    off, off_inc = excl_scan(width, n)
    total = off_inc[n - 1]
    out = scatter_writes(n, jnp.uint32, [(start, off, cp)])
    return out, off, total


def to_utf32(words: jnp.ndarray, length, big_endian: bool):
    """Returns (err_code, err_pos, out u32[N], out_len)."""
    n = words.shape[0]
    w = native(words, length, big_endian)
    err_pos, err_code = first_error(w, length)
    ok = err_pos == BIG
    cp, start = _codepoints(w, length)
    out, off, total = _emit_utf32(cp, start, n)
    clamped = jnp.minimum(err_pos, n - 1)
    # off[0] == 0 for an exclusive scan, so err_pos == 0 needs no special case
    out_len = jnp.where(ok, total, off[clamped])
    return (
        jnp.where(ok, 0, err_code),
        jnp.where(ok, length, err_pos),
        out,
        out_len,
    )


def to_latin1(words: jnp.ndarray, length, big_endian: bool):
    """Returns (err_code, err_pos, out u8[N], out_len).
    scalar/utf16_to_latin1/utf16_to_latin1.h:35-91: first word > 0xFF is
    TOO_LARGE; surrogates are irrelevant."""
    n = words.shape[0]
    w = native(words, length, big_endian)
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


def to_latin1_valid(words: jnp.ndarray, length, big_endian: bool):
    """convert_valid_utf16_to_latin1: pure narrowing store. (out, total)."""
    w = native(words, length, big_endian)
    return (w & 0xFF).astype(jnp.uint8), length


def to_utf8_valid(words: jnp.ndarray, length, big_endian: bool):
    """convert_valid_utf16_to_utf8: skips surrogate validation entirely
    (reference: per-arch convert_valid kernels). Returns (out u8[3N], total)."""
    n = words.shape[0]
    w = native(words, length, big_endian)
    cp, start = _codepoints(w, length)
    width = _utf8_widths(cp, start)
    out, _, total = _emit_utf8(cp, start, width, n)
    return out, total


def to_utf32_valid(words: jnp.ndarray, length, big_endian: bool):
    n = words.shape[0]
    w = native(words, length, big_endian)
    cp, start = _codepoints(w, length)
    out, _, total = _emit_utf32(cp, start, n)
    return out, total
