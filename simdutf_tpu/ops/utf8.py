"""UTF-8 ops, XLA tier.

Validation uses the event-minimum formulation (see golden/utf8.py for the
derivation): fully vectorized, no sequential scan, exact first-error parity
with the reference scalar machine (src/scalar/utf8.h:102-199). Transcoding
is classify -> exclusive prefix scan -> scatter, replacing the reference's
209-entry shuffle tables (src/tables/utf8_to_utf16_tables.h).

All functions take a padded uint8 buffer plus a dynamic scalar ``length``;
bytes at/after ``length`` are ignored (they are zeroed on entry, which is
semantically safe: generic/utf8_validation/utf8_validator.h:18-22).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..errors import error_code as ec
from .common import (
    BIG,
    DEVICE_ROUTING,
    bswap16,
    excl_scan,
    positions,
    route,
    vlike,
    scatter_writes,
    shift_left,
    shift_right,
    zero_tail,
)

# plain ints (not jnp scalars): device constants at import time would pin
# the default backend and slow every lowering
_TOO_SHORT = int(ec.TOO_SHORT)
_TOO_LONG = int(ec.TOO_LONG)
_OVERLONG = int(ec.OVERLONG)
_TOO_LARGE = int(ec.TOO_LARGE)
_SURROGATE = int(ec.SURROGATE)
_HEADER_BITS = int(ec.HEADER_BITS)


def classify(b_u8: jnp.ndarray, length):
    """Structural classification of a UTF-8 buffer.

    Returns dict of per-byte arrays:
      lead     bool  — non-continuation byte (sequence start in a valid parse)
      seqlen   i32   — declared sequence length at leads (1..4)
      cp       i32   — decoded codepoint at leads
      err      i32   — per-lead error code (0 = valid sequence)
      is_cont  bool
      c1..c3   bool  — is_cont at i+1..i+3 (zero-fill: False past the end)
    """
    b = zero_tail(b_u8.astype(jnp.int32), length)
    b1, b2, b3 = shift_left(b, 1), shift_left(b, 2), shift_left(b, 3)

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

    zero = jnp.zeros_like(b)
    err = zero
    err = jnp.where(lead2 & ~c1, _TOO_SHORT, err)
    err = jnp.where(lead2 & c1 & (cp2 < 0x80), _OVERLONG, err)
    ok3 = c1 & c2
    err = jnp.where(lead3 & ~ok3, _TOO_SHORT, err)
    err = jnp.where(lead3 & ok3 & (cp3 < 0x800), _OVERLONG, err)
    err = jnp.where(lead3 & ok3 & (cp3 >= 0xD800) & (cp3 <= 0xDFFF), _SURROGATE, err)
    ok4 = c1 & c2 & c3
    err = jnp.where(lead4 & ~ok4, _TOO_SHORT, err)
    err = jnp.where(lead4 & ok4 & (cp4 <= 0xFFFF), _OVERLONG, err)
    err = jnp.where(lead4 & ok4 & (cp4 > 0x10FFFF), _TOO_LARGE, err)
    err = jnp.where(badlead, _HEADER_BITS, err)

    seqlen = jnp.where(ascii_, 1, 0)
    seqlen = jnp.where(lead2, 2, seqlen)
    seqlen = jnp.where(lead3, 3, seqlen)
    seqlen = jnp.where(lead4, 4, seqlen)

    cp = jnp.where(ascii_, b, 0)
    cp = jnp.where(lead2, cp2, cp)
    cp = jnp.where(lead3, cp3, cp)
    cp = jnp.where(lead4, cp4, cp)

    return dict(
        b=b,
        lead=~is_cont,
        is_cont=is_cont,
        c1=c1,
        c2=c2,
        c3=c3,
        seqlen=seqlen,
        cp=cp,
        err=err,
        badlead=badlead,
        lead4=lead4,
    )


def _first_error_from(cls, length):
    """(err_pos, err_code); err_pos == BIG when valid."""
    n = cls["b"].shape[0]
    idx = positions(n)
    in_range = idx < length
    lead = cls["lead"] & in_range
    err = cls["err"]

    # (1) invalid lead sequences
    bad_lead = lead & (err != 0)
    pos1 = jnp.min(jnp.where(bad_lead, idx, BIG))
    k1 = jnp.argmin(jnp.where(bad_lead, idx, BIG))
    code1 = err[k1]
    # (2) unconsumed continuation after a valid sequence: is_cont at i+seqlen.
    # c1/c2/c3 are is_cont at i+1..3; c4 needed for 4-byte leads.
    seqlen = cls["seqlen"]
    gap = (
        ((seqlen == 1) & cls["c1"])
        | ((seqlen == 2) & cls["c2"])
        | ((seqlen == 3) & cls["c3"])
        | ((seqlen == 4) & shift_left(cls["is_cont"].astype(jnp.int32), 4).astype(bool))
    )
    good_lead = lead & (err == 0)
    pos2 = jnp.min(jnp.where(good_lead & gap, idx + seqlen, BIG))
    # (zero-tail makes bytes past length non-continuations, so pos2 < length
    # automatically)
    # (3) buffer starts with a continuation byte
    pos3 = jnp.where(cls["is_cont"][0] & (length > 0), 0, BIG)

    err_pos = jnp.minimum(jnp.minimum(pos1, pos2), pos3)
    err_code = jnp.where(
        err_pos == pos1, code1, _TOO_LONG
    )  # pos2/pos3 are both TOO_LONG
    err_code = jnp.where(err_pos == BIG, 0, err_code)
    return err_pos, err_code


def validate_with_errors(b: jnp.ndarray, length):
    """-> (err_code i32, err_pos i32); (0, length) on success.

    Big tile-aligned buffers route to the pallas event kernel
    (kernels/validate.utf8_first_event_len) when it is the measured
    winner (ops/engine_probe.validate_engine): the dispatched surface
    must serve the best backend, the reference's implementation.cpp:
    1274-1309 discipline (VERDICT r04 #4 — the official validate row
    shipped the XLA classify tier at 14% of ceiling while the event
    kernel ran at ~79% in the same battery)."""
    from ..kernels import validate as kv

    n = b.shape[0]
    if (b.dtype == jnp.uint8 and n % (kv.BR * kv.W) == 0
            and n >= (1 << 20)):
        from .engine_probe import validate_engine

        if validate_engine() == "event":
            x2d = jnp.concatenate(
                [b.reshape(-1, kv.W), jnp.zeros((kv.BR, kv.W), b.dtype)])
            pos, code = kv.utf8_first_event_len(x2d, length)
            ok = pos == kv.BIG
            return (jnp.where(ok, 0, code).astype(jnp.int32),
                    jnp.where(ok, length, pos).astype(jnp.int32))
    return _validate_with_errors_xla(b, length)


def _validate_with_errors_xla(b: jnp.ndarray, length):
    """The XLA classify tier (engine-probe A/B reference)."""
    cls = classify(b, length)
    pos, code = _first_error_from(cls, length)
    ok = pos == BIG
    return jnp.where(ok, 0, code), jnp.where(ok, length, pos)


def validate(b: jnp.ndarray, length):
    code, _ = validate_with_errors(b, length)
    return code == 0


def validate_ascii_with_errors(b: jnp.ndarray, length):
    idx = positions(b.shape[0])
    bad = (b >= 0x80) & (idx < length)
    pos = jnp.min(jnp.where(bad, idx, BIG))
    ok = pos == BIG
    return (
        jnp.where(ok, 0, _TOO_LARGE),
        jnp.where(ok, length, pos),
    )


def count_code_points(b: jnp.ndarray, length):
    idx = positions(b.shape[0])
    return jnp.sum(((b & 0xC0) != 0x80) & (idx < length))


def utf16_length(b: jnp.ndarray, length):
    idx = positions(b.shape[0])
    in_r = idx < length
    return jnp.sum(((b & 0xC0) != 0x80) & in_r) + jnp.sum((b >= 0xF0) & in_r)




def _census_kernel_facts(b: jnp.ndarray, length):
    """(ascii, u2, u3, u4, has2, has4) via the pallas census kernel
    (kernels/census.py): one read at stream rate vs the jnp form's
    multiple u8-lane passes (3.2 ms vs ~one-pass at 64 MiB, measured
    2026-08-20). census() and presence() both derive from the same
    ``census_bits`` call, so jit CSE shares the single device pass."""
    from ..kernels import census as kcen

    bits = kcen.census_bits(b, length)
    pos = length > 0
    ascii_ = (bits & kcen.BIT_NONASCII) == 0
    u2 = ((bits & kcen.BIT_V2) == 0) & (length % 2 == 0) & pos
    u3 = ((bits & kcen.BIT_V3) == 0) & (length % 3 == 0) & pos
    u4 = ((bits & kcen.BIT_V4) == 0) & (length % 4 == 0) & pos
    has2 = (bits & kcen.BIT_HAS2) != 0
    has4 = (bits & kcen.BIT_HAS4) != 0
    return ascii_, u2, u3, u4, has2, has4


def _census_kernel_ok(n: int) -> bool:
    from ..kernels import census as kcen

    return kcen.census_supported(n)


def census(b: jnp.ndarray, length):
    """One-pass structural census for device-tier routing (the reference's
    per-block is_ascii short-circuit, utf8_to_utf16.h:237-240, lifted to
    corpus scale). Returns scalar bools (ascii, u2, u3, u4): each is an
    EXACT validity proof for its class — a True means the whole in-range
    buffer is valid UTF-8 consisting solely of that sequence width — so a
    fast branch taken on it may skip the error lattice entirely.

    On TPU with tile-aligned buffers the facts come from the pallas
    census kernel (kernels/census.py, one read at stream rate); the jnp
    form below is the portable fallback. Both are exact.

    All predicates are elementwise masks + reductions over one read of the
    buffer, in uint8 arithmetic throughout — no widened (4N-byte)
    temporaries; range checks on the decoded value are re-expressed as
    byte-wise compares (E0 needs b1>=A0, ED needs b1<=9F, F0 needs b1>=90,
    F4 needs b1<=8F — the scalar machine's own boundary cases). XLA fuses
    everything into a single pass.
    """
    n = b.shape[0]
    if _census_kernel_ok(n):
        return _census_kernel_facts(b, length)[:4]
    b = b.astype(jnp.uint8)
    idx = positions(n)
    in_r = idx < length
    b1 = shift_left(b, 1)
    cont = (b & 0xC0) == 0x80
    c1 = (b1 & 0xC0) == 0x80

    ascii_ = ~jnp.any((b >= 0x80) & in_r)

    # uniform 2-byte: even positions are C2..DF leads, odd are
    # continuations — exactly the valid encodings of U+0080..U+07FF
    ok2 = jnp.where((idx & 1) == 0, (b >= 0xC2) & (b <= 0xDF), cont)
    u2 = jnp.all(ok2 | ~in_r) & (length % 2 == 0) & (length > 0)

    # uniform 3-byte: stride-3 E0..EF leads with cp in [0x800, 0xFFFF]
    # minus surrogates: overlong (E0 80-9F) and surrogate (ED A0-BF)
    # encodings are excluded by first-continuation bounds
    lead3ok = (
        ((b & 0xF0) == 0xE0)
        & c1
        & ~((b == 0xE0) & (b1 < 0xA0))
        & ~((b == 0xED) & (b1 >= 0xA0))
    )
    ok3 = jnp.where(idx % 3 == 0, lead3ok, cont)
    u3 = jnp.all(ok3 | ~in_r) & (length % 3 == 0) & (length > 0)

    # uniform 4-byte (astral-only: emoji streams): stride-4 F0..F4 leads
    # with cp in [0x10000, 0x10FFFF]: F0 90-BF.., F1-F3 80-BF.., F4 80-8F..
    lead4ok = (
        (b >= 0xF0) & (b <= 0xF4)
        & c1
        & ~((b == 0xF0) & (b1 < 0x90))
        & ~((b == 0xF4) & (b1 >= 0x90))
    )
    ok4 = jnp.where((idx & 3) == 0, lead4ok, cont)
    u4 = jnp.all(ok4 | ~in_r) & (length % 4 == 0) & (length > 0)
    return ascii_, u2, u3, u4


def presence(b: jnp.ndarray, length):
    """(has2, has4): whether any in-range byte is a 2-byte lead /
    a byte >= 0xF0 (4-byte lead or bad lead). Their NEGATIONS license
    the census-pruned butterfly kernel variants (kernels/butterfly
    no_l2/no_l4): a class the census proves absent can be compiled out
    of the lattice exactly. Fused into the same single read as census()
    under jit (both are reductions over the same elementwise masks)."""
    n = b.shape[0]
    if _census_kernel_ok(n):
        return _census_kernel_facts(b, length)[4:]
    b = b.astype(jnp.uint8)
    in_r = positions(n) < length
    has2 = jnp.any(((b & 0xE0) == 0xC0) & in_r)
    has4 = jnp.any((b >= 0xF0) & in_r)
    return has2, has4


def census_full(b: jnp.ndarray, length):
    """census() + presence() from ONE device pass: the kernel facts are a
    single pallas call (two separate census()/presence() calls do not CSE
    across pallas_call boundaries — measured 4.4 ms vs 2.7 for one pass
    at 64 MiB, 2026-08-20)."""
    if _census_kernel_ok(b.shape[0]):
        return _census_kernel_facts(b, length)
    return (*census(b, length), *presence(b, length))


def _mask_units(units, count):
    """Zero units at/after ``count`` so fast-branch buffers match the
    general engine's zeros-past-out_len exactly."""
    idx = positions(units.shape[0])
    return jnp.where(idx < count, units, 0)


def _swp16(u, big_endian: bool):
    if not big_endian:
        return u
    u = u.astype(jnp.uint16)
    return (u << 8) | (u >> 8)


def _pair_u16_stream(lo, hi):
    """Interleave two u16-value int32 planes into a flat u16 stream
    (lo unit first) through ONE int32 word plane — never a minor-2
    stack, whose last dim TPU pads to 128 lanes when it materializes
    (the round-3 'elementwise floor' of these branches was exactly that
    padding, ~35 ms/branch at 64 MiB)."""
    from jax import lax

    w = (lo & 0xFFFF) | (hi << 16)
    return lax.bitcast_convert_type(
        w.reshape(-1, 1), jnp.uint16).reshape(-1)


def _u16_fast_branches(b, length, n, big_endian: bool):
    """The four fixed-rate utf8->utf16 branches; each returns
    (out u16[n], out_len) bit-identical to the general engine on its
    class. Lane-major throughout (kernels/validate.u8_words + strided
    lane slices): no scan, no scatter, and no minor-dim-2/3/4 arrays —
    those pad to 128 lanes whenever XLA materializes them (measured as
    the branches' ~35 ms floor in round 3)."""
    from ..kernels.validate import u8_words

    def br_ascii():
        u = jnp.where(positions(n) < length, b, 0).astype(jnp.uint16)
        return _swp16(u, big_endian), length

    def br_u2():
        cnt = length // 2
        if n % 512:
            pr = b.astype(jnp.uint16).reshape(-1, 2)
            u = ((pr[:, 0] & 0x1F) << 6) | (pr[:, 1] & 0x3F)
            u = _mask_units(_swp16(u, big_endian), cnt)
            return jnp.pad(u, (0, n - u.shape[0])), cnt
        w = u8_words(b)  # (n/512, 128) i32: 2 units per word
        u_lo = ((w & 0x1F) << 6) | ((w >> 8) & 0x3F)
        u_hi = (((w >> 16) & 0x1F) << 6) | ((w >> 24) & 0x3F)
        u = _pair_u16_stream(
            _swp16(u_lo, big_endian).astype(jnp.int32),
            _swp16(u_hi, big_endian).astype(jnp.int32))
        u = _mask_units(u, cnt)
        return jnp.pad(u, (0, n - u.shape[0])), cnt

    def br_u3():
        cnt = length // 3

        def triples(tb):
            # (R, 384) u8 rows; strided lane slices keep minors at 128
            x2 = tb.reshape(-1, 384)
            t0 = x2[:, 0::3].astype(jnp.int32)
            t1 = x2[:, 1::3].astype(jnp.int32)
            t2 = x2[:, 2::3].astype(jnp.int32)
            return (((t0 & 0x0F) << 12) | ((t1 & 0x3F) << 6)
                    | (t2 & 0x3F)).reshape(-1)

        n384 = n // 1536 * 1536
        n3 = n // 3 * 3
        if n384 == 0:
            tr = b[:n3].astype(jnp.uint16).reshape(-1, 3)
            u = (((tr[:, 0] & 0x0F) << 12) | ((tr[:, 1] & 0x3F) << 6)
                 | (tr[:, 2] & 0x3F))
        else:
            head = triples(b[:n384]).astype(jnp.uint16)
            tail = b[n384:n3].astype(jnp.uint16).reshape(-1, 3)
            ut = (((tail[:, 0] & 0x0F) << 12)
                  | ((tail[:, 1] & 0x3F) << 6) | (tail[:, 2] & 0x3F))
            u = jnp.concatenate([head, ut])
        u = _mask_units(_swp16(u, big_endian), cnt)
        return jnp.pad(u, (0, n - u.shape[0])), cnt

    def br_u4():
        cnt = length // 2
        if n % 512:
            q = b.astype(jnp.uint16).reshape(-1, 4)
            hi = (0xD7C0 + (((q[:, 0] & 0x07) << 8)
                            | ((q[:, 1] & 0x3F) << 2)
                            | ((q[:, 2] >> 4) & 0x03)))
            lo = 0xDC00 + (((q[:, 2] & 0x0F) << 6) | (q[:, 3] & 0x3F))
            u = jnp.stack(
                [_swp16(hi, big_endian), _swp16(lo, big_endian)], axis=1
            ).reshape(-1)
            u = _mask_units(u, cnt)
            return jnp.pad(u, (0, n - u.shape[0])), cnt
        w = u8_words(b)  # one astral codepoint per word
        b0, b1 = w & 0xFF, (w >> 8) & 0xFF
        b2, b3 = (w >> 16) & 0xFF, (w >> 24) & 0xFF
        # surrogates from bytes without materializing the 21-bit cp:
        #   hi = D800 + (cp-0x10000)>>10, cp>>10 = ((b0&7)<<8)|((b1&3F)<<2)
        #        |((b2>>4)&3), so hi = D7C0 + that (the -0x10000 folds in)
        hi = 0xD7C0 + (((b0 & 0x07) << 8) | ((b1 & 0x3F) << 2)
                       | ((b2 >> 4) & 0x03))
        lo = 0xDC00 + (((b2 & 0x0F) << 6) | (b3 & 0x3F))
        u = _pair_u16_stream(
            _swp16(hi, big_endian).astype(jnp.int32),
            _swp16(lo, big_endian).astype(jnp.int32))
        u = _mask_units(u, cnt)
        return jnp.pad(u, (0, n - u.shape[0])), cnt

    return br_ascii, br_u2, br_u3, br_u4


def _emit_utf16_units(cp, lead, lead4, n, big_endian: bool):
    """Emit UTF-16 units with the unit-per-byte reformulation: unit0 is
    carried by the lead byte, unit1 (astral chars only) by the byte right
    after the lead, so per-byte widths are 0/1 and ONE scatter suffices
    (vs the reference's shuffle-table packing,
    src/haswell/avx2_convert_utf8_to_utf16.cpp:7-130; halves scatter cost
    vs the round-1 two-scatter form). Returns (out u16[n], off, total)
    where off[i] = units written before byte i (the partial-output count
    at an error position)."""
    cpx = cp - 0x10000
    unit0 = jnp.where(cp > 0xFFFF, 0xD800 + (cpx >> 10), cp)
    unit1 = 0xDC00 + (cpx & 0x3FF)
    if big_endian:
        unit0 = bswap16(unit0)
        unit1 = bswap16(unit1)
    after_lead4 = shift_right((lead & lead4).astype(jnp.int32), 1).astype(bool)
    keep = lead | after_lead4
    val = jnp.where(after_lead4, shift_right(unit1, 1), unit0)
    k32 = keep.astype(jnp.int32)
    off, off_inc = excl_scan(k32, n)
    total = off_inc[n - 1]
    out = scatter_writes(n, jnp.uint16, [(keep, off, val)])
    return out, off, total

def _to_utf16_general(b: jnp.ndarray, length, big_endian: bool):
    """The general mixed-script engine: classify -> scan -> scatter.
    Units at/after out_len are zeroed (on error the raw scatter leaves
    mechanically-decoded units past the valid prefix; the zero convention
    makes every engine's full buffer bit-identical, not just the
    prefix)."""
    n = b.shape[0]
    idx = positions(n)
    cls = classify(b, length)
    err_pos, err_code = _first_error_from(cls, length)
    ok = err_pos == BIG

    lead = cls["lead"] & (idx < length)
    out, off, total = _emit_utf16_units(
        cls["cp"], lead, cls["lead4"], n, big_endian
    )
    # on error, units written = offset at the error position
    clamped = jnp.minimum(err_pos, n - 1)
    # off[0] == 0 for an exclusive scan, so err_pos == 0 needs no special case
    out_len = jnp.where(ok, total, off[clamped])
    out = jnp.where(idx < out_len, out, 0)
    return jnp.where(ok, 0, err_code), jnp.where(ok, length, err_pos), out, out_len


def _general_utf16(b: jnp.ndarray, length, big_endian: bool,
                   no_l2: bool = False, no_l4: bool = False):
    """The mixed-script general path, engine-selected at trace time by a
    one-time measurement (ops/engine_probe): the scatter engine, or the
    butterfly concentration pipeline. ``no_l2``/``no_l4`` select the
    census-pruned butterfly variants (kernels/butterfly._tile_core_full);
    they are only passed when the caller's census proved the class
    absent, and the scatter engine ignores them (its lattice is one
    fused pass — pruning buys nothing there).

    Butterfly structure (tuned on the degraded-runtime findings,
    PERF.md round 3): the compose pipeline runs UNCONDITIONALLY and
    contains no lax.cond at all — exact first-error events (codes and
    positions value-for-value with the scatter engine's lattice) and the
    valid-prefix unit count are computed inside phase B, and phase C
    clamps the output by the prefix end, so even invalid input needs no
    second engine and costs the same as valid input. Both engines zero
    units at/after out_len."""
    from jax import lax

    n = b.shape[0]
    from .engine_probe import general_engine
    from ..kernels import butterfly as kb

    if n % kb.TILE or n < kb.TILE or general_engine() != "butterfly":
        return _to_utf16_general(b, length, big_endian)
    out, total, err_any, err_pos, err_code, err_len = kb.to_utf16_compose(
        b, length, big_endian, no_l2, no_l4)
    ok = ~err_any
    # out is already zeroed at/after the valid-prefix end (phase C clamps
    # every segment by it), so no tail-mask pass is needed here
    return (
        jnp.where(ok, 0, err_code),
        jnp.where(ok, length, err_pos),
        out,
        jnp.where(ok, total, err_len),
    )


def to_utf16(b: jnp.ndarray, length, big_endian: bool):
    """Validating transcode. Routes on a one-pass device census:
    whole-buffer structured classes (ASCII / uniform 2/3/4-byte) take
    fixed-rate elementwise branches (their census predicate IS the
    validity proof); mixed input pays the general engine — scatter or
    butterfly, measured (ops/engine_probe) — as the switch's default
    branch. (Round 4: the round-3 "switch costs a 25 ms conditional
    copy" lore was the bench's dynamic-index artifact, not the switch;
    census-routed ascii measured 24.9 GB/s vs 4.9 through the butterfly,
    PERF.md.)

    Returns (err_code, err_pos, out u16[N], out_len). On error out_len is
    the number of units for the valid prefix (scalar-machine partial
    output); units at/after out_len are zero. Output capacity N is exact
    worst case (1 unit/byte).
    """
    n = b.shape[0]
    if not DEVICE_ROUTING:
        return _general_utf16(b, length, big_endian)
    ascii_, u2, u3, u4, has2, has4 = census_full(b, length)
    br_ascii, br_u2, br_u3, br_u4 = _u16_fast_branches(b, length, n, big_endian)

    def wrap(br):
        def f():
            out, cnt = br()
            z = vlike(jnp.int32(0), out)
            return z, z + length, out, z + cnt
        return f

    branches = [(ascii_, wrap(br_ascii)), (u2, wrap(br_u2)),
                (u3, wrap(br_u3)), (u4, wrap(br_u4))]
    from .engine_probe import general_engine
    from ..kernels import butterfly as _kb

    if (general_engine() == "butterfly" and n % _kb.TILE == 0
            and n >= _kb.TILE):
        # census-pruned butterfly variants for mixed input missing whole
        # width classes (zh-class corpora: ASCII + 3-byte only). Ordered
        # most- to least-pruned; route() takes the first true predicate,
        # and the structured classes above win over these.
        branches += [
            (~has2 & ~has4,
             lambda: _general_utf16(b, length, big_endian, True, True)),
            (~has4,
             lambda: _general_utf16(b, length, big_endian, False, True)),
        ]
    return route(
        branches,
        lambda: _general_utf16(b, length, big_endian),
    )


def _u32_fast_branches(b, length, n):
    """Fixed-rate utf8->utf32 branches (see :func:`_u16_fast_branches`);
    per-branch narrow temporaries only (uint16 until the final widen where
    the codepoint fits, uint32 reshapes for the astral class)."""

    def br_ascii():
        u = jnp.where(positions(n) < length, b, 0)
        return u.astype(jnp.uint32), length

    def br_u2():
        pr = b.astype(jnp.uint16).reshape(-1, 2)
        u = ((pr[:, 0] & 0x1F) << 6) | (pr[:, 1] & 0x3F)
        cnt = length // 2
        out = jnp.pad(_mask_units(u, cnt), (0, n - u.shape[0]))
        return out.astype(jnp.uint32), cnt

    def br_u3():
        n3 = n // 3 * 3
        tr = b[:n3].astype(jnp.uint16).reshape(-1, 3)
        u = (
            ((tr[:, 0] & 0x0F) << 12) | ((tr[:, 1] & 0x3F) << 6)
            | (tr[:, 2] & 0x3F)
        )
        cnt = length // 3
        out = jnp.pad(_mask_units(u, cnt), (0, n - u.shape[0]))
        return out.astype(jnp.uint32), cnt

    def br_u4():
        q = b.astype(jnp.uint32).reshape(-1, 4)
        cp = (
            ((q[:, 0] & 0x07) << 18) | ((q[:, 1] & 0x3F) << 12)
            | ((q[:, 2] & 0x3F) << 6) | (q[:, 3] & 0x3F)
        )
        cnt = length // 4
        out = jnp.pad(_mask_units(cp, cnt), (0, n - cp.shape[0]))
        return out.astype(jnp.uint32), cnt

    return br_ascii, br_u2, br_u3, br_u4


def _to_utf32_general(b: jnp.ndarray, length):
    n = b.shape[0]
    idx = positions(n)
    cls = classify(b, length)
    err_pos, err_code = _first_error_from(cls, length)
    ok = err_pos == BIG

    lead = cls["lead"] & (idx < length)
    width = lead.astype(jnp.int32)
    off, off_inc = excl_scan(width, n)
    total = off_inc[n - 1]
    out = scatter_writes(n, jnp.uint32, [(lead, off, cls["cp"])])
    clamped = jnp.minimum(err_pos, n - 1)
    # off[0] == 0 for an exclusive scan, so err_pos == 0 needs no special case
    out_len = jnp.where(ok, total, off[clamped])
    return (
        jnp.where(ok, 0, err_code),
        jnp.where(ok, length, err_pos),
        out,
        out_len,
    )


def _general_utf32(b: jnp.ndarray, length):
    """Mixed-script utf8->utf32, engine-selected at trace time by a
    one-time measurement (ops/engine_probe.general_engine32): scatter or
    the butterfly concentration pipeline with an any-error fallback to the
    scatter engine (exact first-error/partial-output contracts preserved:
    the butterfly only returns its own output for fully-valid input)."""
    from jax import lax

    from .engine_probe import general_engine32
    from ..kernels import butterfly32 as kb32

    n = b.shape[0]
    if (n % kb32.TILE_B or n < kb32.TILE_B
            or general_engine32() != "butterfly"):
        return _to_utf32_general(b, length)
    out, total, err_any = kb32.to_utf32_compose(b, length)
    return lax.cond(
        err_any,
        lambda: _to_utf32_general(b, length),
        lambda: (
            vlike(jnp.int32(0), out),
            vlike(jnp.int32(0), out) + length,
            out,
            jnp.int32(total),
        ),
    )


def to_utf32(b: jnp.ndarray, length):
    """Returns (err_code, err_pos, out u32[N], out_len); census-routed
    like :func:`to_utf16`; mixed input pays the general engine (scatter
    or butterfly, measured — ops/engine_probe)."""
    if not DEVICE_ROUTING:
        return _general_utf32(b, length)
    n = b.shape[0]
    ascii_, u2, u3, u4 = census(b, length)
    br_ascii, br_u2, br_u3, br_u4 = _u32_fast_branches(b, length, n)

    def wrap(br):
        def f():
            out, cnt = br()
            z = vlike(jnp.int32(0), out)
            return z, z + length, out, z + cnt
        return f

    return route(
        [(ascii_, wrap(br_ascii)), (u2, wrap(br_u2)),
         (u3, wrap(br_u3)), (u4, wrap(br_u4))],
        lambda: _general_utf32(b, length),
    )


def to_latin1(b: jnp.ndarray, length):
    """utf8 -> latin1 with its own error lattice
    (scalar/utf8_to_latin1/utf8_to_latin1.h:174-252)."""
    n = b.shape[0]
    idx = positions(n)
    bb = zero_tail(b.astype(jnp.int32), length)
    b1 = shift_left(bb, 1)
    is_cont = (bb & 0xC0) == 0x80
    ascii_ = bb < 0x80
    lead2 = (bb & 0xE0) == 0xC0
    lead34 = ((bb & 0xF0) == 0xE0) | ((bb & 0xF8) == 0xF0)
    badlead = bb >= 0xF8
    c1 = (b1 & 0xC0) == 0x80
    cp2 = ((bb & 0x1F) << 6) | (b1 & 0x3F)

    err = jnp.zeros(n, dtype=jnp.int32)
    err = jnp.where(lead2 & ~c1, _TOO_SHORT, err)
    err = jnp.where(lead2 & c1 & (cp2 < 0x80), _OVERLONG, err)
    err = jnp.where(lead2 & c1 & (cp2 > 0xFF), _TOO_LARGE, err)
    err = jnp.where(lead34, _TOO_LARGE, err)
    err = jnp.where(badlead, _HEADER_BITS, err)

    in_r = idx < length
    lead = ~is_cont & in_r
    bad_lead = lead & (err != 0)
    pos1 = jnp.min(jnp.where(bad_lead, idx, BIG))
    code1 = err[jnp.argmin(jnp.where(bad_lead, idx, BIG))]
    seqlen = jnp.where(ascii_, 1, 2)
    c2 = (shift_left(bb, 2) & 0xC0) == 0x80
    gap = ((seqlen == 1) & c1) | ((seqlen == 2) & c2)
    good_lead = lead & (err == 0)
    pos2 = jnp.min(jnp.where(good_lead & gap, idx + seqlen, BIG))
    pos3 = jnp.where(is_cont[0] & (length > 0), 0, BIG)
    err_pos = jnp.minimum(jnp.minimum(pos1, pos2), pos3)
    err_code = jnp.where(err_pos == pos1, code1, _TOO_LONG)
    ok = err_pos == BIG

    width = lead.astype(jnp.int32)
    off, off_inc = excl_scan(width, n)
    total = off_inc[n - 1]
    vals = jnp.where(ascii_, bb, cp2)
    out = scatter_writes(n, jnp.uint8, [(lead, off, vals)])
    clamped = jnp.minimum(err_pos, n - 1)
    # off[0] == 0 for an exclusive scan, so err_pos == 0 needs no special case
    out_len = jnp.where(ok, total, off[clamped])
    return (
        jnp.where(ok, 0, err_code),
        jnp.where(ok, length, err_pos),
        out,
        out_len,
    )


def to_latin1_valid(b: jnp.ndarray, length):
    """convert_valid_utf8_to_latin1: valid Latin1-range UTF-8 has only
    ASCII + 2-byte sequences, so this skips the whole error lattice
    (reference: valid_utf8_to_latin1.h). Returns (out u8[N], total)."""
    n = b.shape[0]
    idx = positions(n)
    bb = zero_tail(b.astype(jnp.int32), length)
    b1 = shift_left(bb, 1)
    lead = ((bb & 0xC0) != 0x80) & (idx < length)
    vals = jnp.where(bb < 0x80, bb, ((bb & 0x1F) << 6) | (b1 & 0x3F))
    k32 = lead.astype(jnp.int32)
    off, off_inc = excl_scan(k32, n)
    total = off_inc[n - 1]
    out = scatter_writes(n, jnp.uint8, [(lead, off, vals)])
    return out, total


def to_utf16_valid(b: jnp.ndarray, length, big_endian: bool):
    """convert_valid_utf8_to_utf16*: assumes valid input, skips the error
    events entirely (reference: generic/utf8_to_utf16/valid_utf8_to_utf16.h).
    Returns (out u16[N], out_len); census-routed like :func:`to_utf16`."""
    n = b.shape[0]

    def general():
        idx = positions(n)
        cls = classify(b, length)
        lead = cls["lead"] & (idx < length)
        out, _, total = _emit_utf16_units(
            cls["cp"], lead, cls["lead4"], n, big_endian
        )
        return out, jnp.int32(total)

    if not DEVICE_ROUTING:
        return general()
    ascii_, u2, u3, u4 = census(b, length)
    br_ascii, br_u2, br_u3, br_u4 = _u16_fast_branches(b, length, n, big_endian)

    def wrap(br):
        def f():
            out, cnt = br()
            return out, vlike(jnp.int32(cnt), out)
        return f

    return route(
        [(ascii_, wrap(br_ascii)), (u2, wrap(br_u2)),
         (u3, wrap(br_u3)), (u4, wrap(br_u4))],
        general,
    )


def to_utf32_valid(b: jnp.ndarray, length):
    n = b.shape[0]

    def general():
        idx = positions(n)
        cls = classify(b, length)
        lead = cls["lead"] & (idx < length)
        width = lead.astype(jnp.int32)
        off, off_inc = excl_scan(width, n)
        total = off_inc[n - 1]
        out = scatter_writes(n, jnp.uint32, [(lead, off, cls["cp"])])
        return out, jnp.int32(total)

    if not DEVICE_ROUTING:
        return general()
    ascii_, u2, u3, u4 = census(b, length)
    br_ascii, br_u2, br_u3, br_u4 = _u32_fast_branches(b, length, n)

    def wrap(br):
        def f():
            out, cnt = br()
            return out, vlike(jnp.int32(cnt), out)
        return f

    return route(
        [(ascii_, wrap(br_ascii)), (u2, wrap(br_u2)),
         (u3, wrap(br_u3)), (u4, wrap(br_u4))],
        general,
    )
