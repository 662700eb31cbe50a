"""Vectorized NumPy UTF-8 machinery (the "fallback" tier's core).

Instead of the reference's sequential scalar machine
(src/scalar/utf8.h:102-199) we compute, in one vectorized pass, the set of
*error events* the machine would encounter and take the event with the
minimum position.  Derivation:

Before its first error the scalar machine always parses from lead byte to
lead byte.  Hence every error is one of:
  * a lead byte whose own sequence check fails (TOO_SHORT / OVERLONG /
    SURROGATE / TOO_LARGE / HEADER_BITS), at the lead's position;
  * a continuation byte the previous (valid) sequence did not consume,
    i.e. position ``i + seqlen(i)`` is a continuation byte -> TOO_LONG;
  * the input starting with a continuation byte -> TOO_LONG at 0.
All events from leads at/after the first error occur at positions >= it, so
the minimum-position event is exactly the scalar machine's first error.

This same formulation is reused by the XLA tier (ops/utf8.py), so exact
first-error reporting runs fully on device as well.
"""

from __future__ import annotations

import numpy as np

from ..errors import Result, error_code as ec

_NO_ERROR = np.iinfo(np.int32).max


def _shift(b: np.ndarray, k: int) -> np.ndarray:
    """b[i+k] with zero fill past the end (zero = non-continuation ASCII,
    which reproduces the reference's TOO_SHORT-at-EOF behavior)."""
    out = np.zeros_like(b)
    if k < len(b):
        out[: len(b) - k] = b[k:]
    return out


class Utf8Analysis:
    __slots__ = (
        "n",
        "is_cont",
        "lead",
        "seqlen",
        "cp",
        "err_pos",
        "err_code",
    )

    def __init__(self, n, is_cont, lead, seqlen, cp, err_pos, err_code):
        self.n = n
        self.is_cont = is_cont
        self.lead = lead
        self.seqlen = seqlen
        self.cp = cp
        self.err_pos = err_pos
        self.err_code = err_code

    @property
    def ok(self) -> bool:
        return self.err_pos == _NO_ERROR

    def result(self) -> Result:
        """validate_utf8_with_errors-shaped result (count=len on success)."""
        if self.ok:
            return Result(ec.SUCCESS, self.n)
        return Result(ec(self.err_code), int(self.err_pos))


def _first_event(lead, err, seqlen, is_cont, n):
    """Merge the three error-event families into the global first
    (err_pos, err_code); (_NO_ERROR, 0) when clean.

    Events: (1) an invalid lead sequence at the lead's own position;
    (2) an unconsumed continuation byte right after a valid sequence,
    registered at the continuation's position as TOO_LONG; (3) the input
    starting with a continuation byte (TOO_LONG at 0). (1) and (2) live at
    disjoint positions (lead vs continuation bytes), so a plain min-merge
    is exact.
    """
    pos = np.arange(n, dtype=np.int32)
    event_pos = np.where(lead & (err != 0), pos, _NO_ERROR)
    event_code = err
    good_lead = lead & (err == 0)
    nxt = pos + seqlen
    nxt_in = good_lead & (nxt < n)
    nxt_cont = np.zeros(n, dtype=bool)
    nxt_cont[nxt_in] = is_cont[nxt[nxt_in]]
    tl_pos = np.where(nxt_in & nxt_cont, nxt, _NO_ERROR)
    event_pos = np.minimum(event_pos, tl_pos)
    event_code = np.where(event_pos == tl_pos, int(ec.TOO_LONG), event_code)

    err_pos, err_code = _NO_ERROR, 0
    if event_pos.min(initial=_NO_ERROR) != _NO_ERROR:
        k = int(np.argmin(event_pos))
        err_pos, err_code = int(event_pos[k]), int(event_code[k])
    if n and is_cont[0] and 0 < err_pos:
        err_pos, err_code = 0, int(ec.TOO_LONG)
    return err_pos, err_code


def analyze(b: np.ndarray) -> Utf8Analysis:
    """Full structural analysis of a uint8 buffer."""
    n = int(b.shape[0])
    if n == 0:
        return Utf8Analysis(0, None, None, None, None, _NO_ERROR, 0)
    b = b.astype(np.int32)
    b1, b2, b3 = _shift(b, 1), _shift(b, 2), _shift(b, 3)

    is_cont = (b & 0xC0) == 0x80
    c1 = (b1 & 0xC0) == 0x80
    c2 = (b2 & 0xC0) == 0x80
    c3 = (b3 & 0xC0) == 0x80

    ascii_ = b < 0x80
    lead2 = (b & 0xE0) == 0xC0
    lead3 = (b & 0xF0) == 0xE0
    lead4 = (b & 0xF8) == 0xF0
    badlead = b >= 0xF8

    cp2 = ((b & 0x1F) << 6) | (b1 & 0x3F)
    cp3 = ((b & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F)
    cp4 = ((b & 0x07) << 18) | ((b1 & 0x3F) << 12) | ((b2 & 0x3F) << 6) | (b3 & 0x3F)

    # Per-lead error code; 0 == valid sequence. Priority mirrors the scalar
    # machine: continuation/bounds checks (TOO_SHORT) before range checks.
    err = np.zeros(n, dtype=np.int32)
    err = np.where(lead2 & ~c1, int(ec.TOO_SHORT), err)
    err = np.where(lead2 & c1 & (cp2 < 0x80), int(ec.OVERLONG), err)
    ok3 = c1 & c2
    err = np.where(lead3 & ~ok3, int(ec.TOO_SHORT), err)
    err = np.where(lead3 & ok3 & (cp3 < 0x800), int(ec.OVERLONG), err)
    err = np.where(
        lead3 & ok3 & (cp3 >= 0xD800) & (cp3 <= 0xDFFF), int(ec.SURROGATE), err
    )
    ok4 = c1 & c2 & c3
    err = np.where(lead4 & ~ok4, int(ec.TOO_SHORT), err)
    err = np.where(lead4 & ok4 & (cp4 <= 0xFFFF), int(ec.OVERLONG), err)
    err = np.where(lead4 & ok4 & (cp4 > 0x10FFFF), int(ec.TOO_LARGE), err)
    err = np.where(badlead, int(ec.HEADER_BITS), err)

    lead = ~is_cont
    seqlen = np.where(ascii_, 1, 0)
    seqlen = np.where(lead2, 2, seqlen)
    seqlen = np.where(lead3, 3, seqlen)
    seqlen = np.where(lead4, 4, seqlen)

    cp = np.where(ascii_, b, 0)
    cp = np.where(lead2, cp2, cp)
    cp = np.where(lead3, cp3, cp)
    cp = np.where(lead4, cp4, cp)

    # --- error events (shared merge) ---
    err_pos, err_code_v = _first_event(lead, err, seqlen, is_cont, n)
    return Utf8Analysis(n, is_cont, lead, seqlen, cp, err_pos, err_code_v)


# ---------------------------------------------------------------------------
# public golden ops (operate on numpy arrays)


def validate(b: np.ndarray) -> bool:
    return analyze(b).ok


def validate_with_errors(b: np.ndarray) -> Result:
    return analyze(b).result()


def count_code_points(b: np.ndarray) -> int:
    # scalar/utf8.h:230-241: bytes that are not continuations
    return int(np.count_nonzero((b & 0xC0) != 0x80))


def utf16_length(b: np.ndarray) -> int:
    # scalar/utf8.h:243-255
    return int(
        np.count_nonzero((b & 0xC0) != 0x80) + np.count_nonzero(b >= 0xF0)
    )


def utf32_length(b: np.ndarray) -> int:
    return count_code_points(b)


def latin1_length(b: np.ndarray) -> int:
    return count_code_points(b)


def trim_partial(b: np.ndarray) -> int:
    # scalar/utf8.h:257-288
    length = int(b.shape[0])
    if length < 3:
        if length == 2:
            if b[1] >= 0xC0:
                return 1
            if b[0] >= 0xE0:
                return 0
            return 2
        if length == 1:
            return 0 if b[0] >= 0xC0 else 1
        return 0
    if b[length - 1] >= 0xC0:
        return length - 1
    if b[length - 2] >= 0xE0:
        return length - 2
    if b[length - 3] >= 0xF0:
        return length - 3
    return length


def _emit_utf16(cps: np.ndarray, big_endian: bool) -> np.ndarray:
    """codepoints -> uint16 units (surrogate expansion via cumsum offsets)."""
    is4 = cps > 0xFFFF
    units = 1 + is4.astype(np.int32)
    total = int(units.sum())
    off = np.cumsum(units) - units
    out = np.zeros(total, dtype=np.uint32)
    hi = np.where(is4, 0xD800 + ((cps - 0x10000) >> 10), cps)
    out[off] = hi
    out[off[is4] + 1] = 0xDC00 + ((cps[is4] - 0x10000) & 0x3FF)
    out16 = out.astype(np.uint16)
    if big_endian:
        out16 = out16.byteswap()
    return out16


def _valid_prefix_cps(a: Utf8Analysis, upto: int) -> np.ndarray:
    """Codepoints of leads strictly before ``upto`` (partial-output rule:
    everything before the first error converts exactly)."""
    lead_idx = np.flatnonzero(a.lead[:upto])
    return a.cp[lead_idx]


def convert_to_utf16_with_errors(b: np.ndarray, big_endian: bool):
    a = analyze(b)
    if a.n == 0:
        return Result(ec.SUCCESS, 0), np.zeros(0, dtype=np.uint16)
    upto = a.n if a.ok else a.err_pos
    out = _emit_utf16(_valid_prefix_cps(a, upto), big_endian)
    if a.ok:
        return Result(ec.SUCCESS, int(out.shape[0])), out
    return Result(ec(a.err_code), int(a.err_pos)), out


def convert_to_utf32_with_errors(b: np.ndarray):
    a = analyze(b)
    if a.n == 0:
        return Result(ec.SUCCESS, 0), np.zeros(0, dtype=np.uint32)
    upto = a.n if a.ok else a.err_pos
    out = _valid_prefix_cps(a, upto).astype(np.uint32)
    if a.ok:
        return Result(ec.SUCCESS, int(out.shape[0])), out
    return Result(ec(a.err_code), int(a.err_pos)), out


def convert_to_latin1_with_errors(b: np.ndarray):
    """utf8 -> latin1 has its own error lattice
    (scalar/utf8_to_latin1/utf8_to_latin1.h:174-252): 3/4-byte leads are
    TOO_LARGE at the lead; 2-byte leads decoding >0xFF are TOO_LARGE."""
    n = int(b.shape[0])
    if n == 0:
        return Result(ec.SUCCESS, 0), np.zeros(0, dtype=np.uint8)
    b32 = b.astype(np.int32)
    b1 = _shift(b32, 1)
    is_cont = (b32 & 0xC0) == 0x80
    ascii_ = b32 < 0x80
    lead2 = (b32 & 0xE0) == 0xC0
    lead34 = ((b32 & 0xF0) == 0xE0) | ((b32 & 0xF8) == 0xF0)
    badlead = b32 >= 0xF8
    c1 = (b1 & 0xC0) == 0x80
    cp2 = ((b32 & 0x1F) << 6) | (b1 & 0x3F)

    err = np.zeros(n, dtype=np.int32)
    err = np.where(lead2 & ~c1, int(ec.TOO_SHORT), err)
    err = np.where(lead2 & c1 & (cp2 < 0x80), int(ec.OVERLONG), err)
    err = np.where(lead2 & c1 & (cp2 > 0xFF), int(ec.TOO_LARGE), err)
    err = np.where(lead34, int(ec.TOO_LARGE), err)
    err = np.where(badlead, int(ec.HEADER_BITS), err)

    lead = ~is_cont
    seqlen = np.where(ascii_, 1, 2)
    err_pos, err_code = _first_event(lead, err, seqlen, is_cont, n)

    upto = n if err_pos == _NO_ERROR else err_pos
    lead_idx = np.flatnonzero(lead[:upto])
    cps = np.where(ascii_[lead_idx], b32[lead_idx], cp2[lead_idx])
    out = cps.astype(np.uint8)
    if err_pos == _NO_ERROR:
        return Result(ec.SUCCESS, int(out.shape[0])), out
    return Result(ec(err_code), err_pos), out
