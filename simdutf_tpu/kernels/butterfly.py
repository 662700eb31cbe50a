"""General-path (mixed-script) UTF-8 -> UTF-16 transcode with NO scatter
and NO gather: per-tile butterfly (log-shift) concentration in VMEM plus a
roll-composed output — DESIGN-compaction.md Design B built end to end
(round 3). Reference counterpart: the shuffle-table inner loop of
src/haswell/avx2_convert_utf8_to_utf16.cpp:7-130, re-derived for a VPU
whose only cheap data movement is uniform rotation.

Why it exists: the XLA scatter engine is the fastest general path on a
healthy chip, but this environment's chip recurrently enters a state where
every scatter/gather serializes to ~7-13 ns/element (PERF.md) while
VPU/elementwise traffic stays fast. The butterfly path's primitives are
rolls, selects and integer ops only, so it rides out that state. Selection
between the two engines is measurement-driven (registry probe), mirroring
the reference's runtime best-pick dispatch (src/implementation.cpp:1274).

Algorithm per 32 KiB input tile (int32 (64,128) lanes = 4 bytes/lane):

  1. classify bytes on 4 mod-4 phase planes (no lane interleave is ever
     materialized; plane m of group g holds byte q = 4*g + m); neighbor
     bytes come from statically-permuted planes with +-1 group rolls and
     an 8-row halo from the adjacent tiles.
  2. unit-per-byte emission (ops/utf8._emit_utf16_units reformulation):
     keep = lead | after-lead4, val = unit0 | unit1.
  3. tile-exclusive scan of keep (lane Hillis-Steele + row carry) gives
     each kept byte its displacement d = q - off(q), monotone
     non-decreasing over kept bytes.
  4. 15 LSB-first rounds of "conditionally move left by 2^k": the packed
     word (unit | d<<16) rolls toward the front congestion-free (monotone
     displacements; verified exhaustively in tests). Circular rolls are
     safe: a wrapped element always has displacement < its shift, so its
     round bit is clear.
  5. pack compacted units in true byte order into (64,256) int32 pairs
     (one interleave2 of roll+select stages) -> scratch tile + per-tile
     (count, error-flag).

Composition (phase C) places each tile's compacted units at its exclusive
offset with dynamic unit-granularity rolls of <=4 candidate scratch tiles
per output tile (scalar-prefetch-driven index maps), masked at u16
granularity and clamped by the valid-prefix end.

Errors need NO fallback engine and NO conditionals: phase B computes
exact first-error events in-kernel (key = local position << 8 | code,
the ops/utf8.classify lattice value-for-value, with lattice pos2/pos3
reformulated as orphan-continuation events so every event lands in the
tile containing it) plus the unit count of the valid prefix. Every unit
before the first error is bit-correct by construction (its offset
depends only on preceding bytes), so out[:err_len] IS the exact
scalar-machine partial output. (The round-3 "conditional-output copy"
that originally forced the no-conditional shape was later root-caused to
minor-dim-k arrays materializing padded at branch boundaries — PERF.md
round 4; the no-fallback design stays because it is strictly cheaper and
simpler either way.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .validate import _interpret, sds, u8_words, vany
from ..errors import error_code as _ec

PR = 64  # rows per tile
PW = 128  # int32 lanes per row
HR = 8  # halo rows (int32 block granularity; only 1 group is consumed)
TILE = PR * PW * 4  # 32768 bytes per tile
UNITS = TILE  # u16 output capacity per tile in units (1 unit/byte max)
STAGES = 15  # log2(TILE) rounds
BIG = 2**31 - 1

# error codes as plain ints (device constants at import time would pin a
# backend); the in-kernel event codes must match ops/utf8.classify's
# lattice value-for-value so engines agree bit-exactly
_TOO_SHORT = int(_ec.TOO_SHORT)
_TOO_LONG = int(_ec.TOO_LONG)
_OVERLONG = int(_ec.OVERLONG)
_TOO_LARGE = int(_ec.TOO_LARGE)
_SURROGATE = int(_ec.SURROGATE)
_HEADER_BITS = int(_ec.HEADER_BITS)
# event key = local byte position << 8 | code; no event = BIGKEY
BIGKEY = (TILE + 8) << 8


# --- roll primitives (jnp for the model/driver, pltpu inside kernels) ----

def _jroll(a, shift, axis):
    return jnp.roll(a, shift, axis=axis)


def _proll(a, shift, axis):
    # pltpu.roll(x, s, axis)[j] = x[j - s] (roll right by s); shifts must
    # be non-negative (dynamic shifts are supported on this toolchain)
    return pltpu.roll(a, shift, axis)


def _iotas(shape):
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return row, lane


def _groll_left(a, k: int, roll):
    """Flat group-roll left by static k (read group g+k), circular over
    the whole (R, PW) plane in row-major order. k < PW."""
    if k == 0:
        return a
    R = a.shape[0]
    z1 = roll(a, PW - k, 1)  # lane l reads lane l+k (same row, wrapped)
    z2 = roll(z1, R - 1, 0)  # wrapped lanes read the next row
    _, lane = _iotas(a.shape)
    return jnp.where(lane < PW - k, z1, z2)


def _groll_right(a, k: int, roll):
    """Flat group-roll right by static k (read group g-k)."""
    if k == 0:
        return a
    R = a.shape[0]
    z1 = roll(a, k, 1)
    z2 = roll(z1, 1, 0)  # wrapped lanes read the previous row
    _, lane = _iotas(a.shape)
    return jnp.where(lane >= k, z1, z2)


def _staged_moves(words, dmax, stages: int, dshift: int, roll):
    """The LSB-first conditional-move-left rounds shared by every
    butterfly engine. ``words`` = P phase planes packed as
    payload | displacement << dshift. Stage s moves elements whose
    displacement bit s is set. All stages run UNCONDITIONALLY: the
    round-4 per-stage lax.cond skipping (stages with s > dmax are
    provable no-ops) cost ~1.9 ms per tile-sweep in Mosaic branch
    overhead on the mixed flagship — where nothing skips — and even a
    2-cond grouped form paid ~1.8 ms (any in-kernel branch spills the
    live plane set; measured 2026-08-20: phase B 11.7 conds / 11.6
    grouped / 9.9 uncond). What skipping could save is small by
    construction: the top stages (s >= 4P*128) move by whole rows —
    row rolls run at ~8x lane-roll throughput — and fully-ordered
    tiles take the per-tile ASCII shortcut before reaching here, so the
    suffix a realistic tile could skip is the cheap suffix. ``dmax`` is
    retained for the callers' stats but no longer drives control flow.
    The per-stage update subtracts the MASKED bit (arr - (arr & (s <<
    dshift))) instead of recomputing the shifted constant — one fewer
    vector op per plane per stage."""
    del dmax  # no longer drives control flow (see docstring)
    P = len(words)
    for st in range(stages):
        s = 1 << st
        if s % P == 0:
            arr = [_flat_roll_left(words[m], s // P, roll)
                   for m in range(P)]
        else:
            arr = []
            for m in range(P):
                mm, gg = (m + s) % P, (m + s) // P
                a = words[mm]
                if gg:
                    a = _groll_left(a, gg, roll)
                arr.append(a)
        out = []
        for m in range(P):
            bit = arr[m] & (s << dshift)
            out.append(jnp.where(bit != 0, arr[m] - bit, words[m]))
        words = out
    return words


def _flat_roll_left(a, s: int, roll):
    """Butterfly-stage roll: read flat element e+s on an (R, PW) plane
    (elements = groups here). s may exceed PW (pure row roll)."""
    R = a.shape[0]
    lane_k, row_k = s % PW, s // PW
    z = a
    if lane_k:
        z = _groll_left(z, lane_k, roll)
    if row_k:
        z = roll(z, R - (row_k % R), 0)
    return z


# --- the per-tile core (shared by the Pallas kernel and the jnp model) ---

def _tile_core(prv, x, nxt, base, length, big_endian: bool, roll,
               no_l2: bool = False, no_l4: bool = False):
    """prv/nxt: (HR, PW) int32 halo rows; x: (PR, PW) int32 tile.
    base: global byte index of x[0,0]; length: global valid length.
    Returns (scratch (PR, 2*PW) int32 pair-packed units, count, err).

    Per-tile ASCII short-circuit (the reference's per-block is_ascii
    fast path, generic/utf8_to_utf16/utf8_to_utf16.h:235-240, at tile
    granularity): a tile whose raw bytes — and the previous tile's last
    group, so no multi-byte sequence can straddle in — are all < 0x80
    takes a ~100-op identity emission (keep = in-range, unit = byte,
    displacement = 0, no classification / scan / orphan logic) under an
    in-kernel lax.cond. Conservative by construction: garbage bytes
    beyond ``length`` that happen to be non-ASCII merely route the tile
    to the full path. Realistic corpora (twitter.json-class: ASCII with
    occasional multi-byte spans) pay the full classification only on the
    tiles that actually contain multi-byte sequences."""
    MASK80 = jnp.int32(-2139062144)  # 0x80808080 as signed int32
    simple = ~(
        vany((x & MASK80) != 0)
        # conservative straddle guard: any non-ASCII in the previous
        # tile's trailing 512 bytes routes to the full path (vector-wide
        # reduce; Mosaic has no cheap scalar extract from a vreg)
        | vany((prv[HR - 1 :, :] & MASK80) != 0)
    )

    def cheap():
        row_c, lane_c = _iotas((PR, PW))
        gpos_c = row_c * PW + lane_c
        vals_c = []
        for m in range(4):
            q = base + 4 * gpos_c + m
            v = jnp.where((q >= 0) & (q < length), (x >> (8 * m)) & 0xFF, 0)
            if big_endian:
                v = (v << 8) & 0xFFFF
            vals_c.append(v)
        q01 = vals_c[0] | (vals_c[1] << 16)
        q23 = vals_c[2] | (vals_c[3] << 16)
        scratch_c = _interleave2(q01, q23, roll)
        count = jnp.clip(length - base, 0, TILE)
        count_row = jnp.broadcast_to(
            count.astype(jnp.int32).reshape(1, 1), (1, PW))
        return scratch_c, count_row, jnp.int32(BIGKEY), count

    return jax.lax.cond(
        simple, cheap,
        lambda: _tile_core_full(prv, x, nxt, base, length, big_endian,
                                roll, no_l2, no_l4))


def _tile_core_full(prv, x, nxt, base, length, big_endian: bool, roll,
                    no_l2: bool = False, no_l4: bool = False):
    """``no_l2``/``no_l4`` are census-proven ABSENCE guarantees: the
    caller's one-pass census (ops/utf8.census presence bits) showed no
    in-range byte with (b & 0xE0) == 0xC0 / no byte >= 0xF0, so the
    lead2 / lead4+badlead lattice arms, their neighbor reads, the astral
    emission (surrogate-pair unit1, cp_prev rolls) and the j=3 orphan
    round are statically dead and compiled out — the reference's
    per-block dispatch (utf8_to_utf16.h:237-240) done as census-selected
    kernel variants. Exact by construction: every pruned term is
    all-false under the census predicate."""
    ext = jnp.concatenate([prv, x, nxt], axis=0)  # (HR+PR+HR, PW)
    RE = ext.shape[0]

    # phase planes of the extended tile, tail-zeroed by global position
    row_e, lane_e = _iotas((RE, PW))
    g_e = (row_e - HR) * PW + lane_e  # group index relative to tile start
    planes = []
    for m in range(4):
        p = (ext >> (8 * m)) & 0xFF
        q = base + 4 * g_e + m  # global byte position
        planes.append(jnp.where((q >= 0) & (q < length), p, 0))

    # classification runs on a one-halo-row-extended region EXTM (ext rows
    # [HR-HB, HR+PR)) so the backward after-lead4 shift below can see the
    # PREVIOUS tile's trailing lead — a lead in the last bytes of tile t-1
    # whose continuation units belong to tile t (cross-tile straddle)
    HB = 8
    EXTM0 = HR - HB

    def nb(m, j):
        # neighbor byte at +j: plane (m+j)%4, group +(m+j)//4, EXTM rows
        mm, gg = (m + j) % 4, (m + j) // 4
        return _g_ext(planes[mm], gg)[EXTM0 : HR + PR]

    def _g_ext(a, gg):
        # group-shift-left on the extended plane; the circular wrap only
        # contaminates ext's very last group, which EXTM slices away
        if gg == 0:
            return a
        z1 = roll(a, PW - gg, 1)
        z2 = roll(z1, RE - 1, 0)
        _, lane = _iotas(a.shape)
        return jnp.where(lane < PW - gg, z1, z2)

    def _sl_main(a):
        # EXTM -> main region
        return a[HB : HB + PR]

    row, lane = _iotas((PR, PW))
    gpos = row * PW + lane  # tile-local group index
    row_x, lane_x = _iotas((HB + PR, PW))
    gpos_x = (row_x - HB) * PW + lane_x  # EXTM group index (tile-local)
    # per-plane classification on EXTM; error events carry the exact code
    # and TILE-LOCAL byte position as key = pos<<8 | code, matching
    # ops/utf8.classify's lattice value-for-value
    cp_m, lead_m, lead4_m = [], [], []
    cont_m, seql_m = [], []
    err_events = []  # (PR, PW) int32 keys on the MAIN region
    for m in range(4):
        b = planes[m][EXTM0 : HR + PR]
        b1, b2 = nb(m, 1), nb(m, 2)
        is_cont = (b & 0xC0) == 0x80
        c1 = (b1 & 0xC0) == 0x80
        c2 = (b2 & 0xC0) == 0x80
        ascii_ = b < 0x80
        lead3 = (b & 0xF0) == 0xE0
        cp3 = ((b & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F)
        err = jnp.zeros_like(b)
        if not no_l2:
            lead2 = (b & 0xE0) == 0xC0
            cp2 = ((b & 0x1F) << 6) | (b1 & 0x3F)
            err = jnp.where(lead2 & ~c1, _TOO_SHORT, err)
            err = jnp.where(lead2 & c1 & (cp2 < 0x80), _OVERLONG, err)
        ok3 = c1 & c2
        err = jnp.where(lead3 & ~ok3, _TOO_SHORT, err)
        err = jnp.where(lead3 & ok3 & (cp3 < 0x800), _OVERLONG, err)
        err = jnp.where(
            lead3 & ok3 & (cp3 >= 0xD800) & (cp3 <= 0xDFFF), _SURROGATE, err
        )
        if not no_l4:
            b3 = nb(m, 3)
            c3 = (b3 & 0xC0) == 0x80
            lead4 = (b & 0xF8) == 0xF0
            badlead = b >= 0xF8
            cp4 = (
                ((b & 0x07) << 18) | ((b1 & 0x3F) << 12)
                | ((b2 & 0x3F) << 6) | (b3 & 0x3F)
            )
            ok4 = c1 & c2 & c3
            err = jnp.where(lead4 & ~ok4, _TOO_SHORT, err)
            err = jnp.where(lead4 & ok4 & (cp4 <= 0xFFFF), _OVERLONG, err)
            err = jnp.where(lead4 & ok4 & (cp4 > 0x10FFFF), _TOO_LARGE, err)
            err = jnp.where(badlead, _HEADER_BITS, err)
        seqlen = jnp.where(ascii_, 1, 0)
        if not no_l2:
            seqlen = jnp.where(lead2, 2, seqlen)
        seqlen = jnp.where(lead3, 3, seqlen)
        cp = jnp.where(ascii_, b, 0)
        if not no_l2:
            cp = jnp.where(lead2, cp2, cp)
        cp = jnp.where(lead3, cp3, cp)
        if not no_l4:
            seqlen = jnp.where(lead4, 4, seqlen)
            cp = jnp.where(lead4, cp4, cp)
        in_r = (base + 4 * gpos_x + m >= 0) & (base + 4 * gpos_x + m < length)
        lead = ~is_cont & in_r
        # bad-lead events (MAIN region only: EXTM halo events belong to
        # the previous tile, which reports them itself)
        lpos = 4 * gpos + m
        err_events.append(jnp.where(
            _sl_main(lead) & (_sl_main(err) != 0),
            (lpos << 8) | _sl_main(err), BIGKEY))
        cp_m.append(cp)
        lead_m.append(lead)
        if not no_l4:
            lead4_m.append(lead & lead4)
        cont_m.append(is_cont & in_r)
        seql_m.append(seqlen)

    # orphan-continuation events (lattice pos2/pos3 reformulated so every
    # event lands in the tile CONTAINING it): a continuation byte not
    # covered by any preceding lead's declared length is the first
    # ill-placed byte — TOO_LONG at its own position. Backward neighbors
    # come from the EXTM planes (byte q-j = plane (m-j)%4, group -1 iff
    # m < j), so leads in the previous tile's tail are visible.
    def _g_back1(a):
        z1 = roll(a, 1, 1)
        z2 = roll(z1, 1, 0)
        _, lane_b = _iotas(a.shape)
        return jnp.where(lane_b >= 1, z1, z2)

    def back(arrs, m, j):
        a = arrs[(m - j) % 4]
        if m < j:
            a = _g_back1(a)
        return _sl_main(a)

    # Mosaic cannot rotate i1 vectors ("Rotate with non-32-bit data"):
    # fold lead into the seqlen plane (0 where not a lead) so the
    # backward rolls move one int32 array per (m, j)
    seql_lead = [jnp.where(lead_m[m], seql_m[m], 0) for m in range(4)]
    for m in range(4):
        covered = None
        # with no 4-byte leads anywhere, no lead can cover the byte 3
        # positions after it — the j=3 backward round is statically dead
        for j in ((1, 2) if no_l4 else (1, 2, 3)):
            c = back(seql_lead, m, j) > j
            covered = c if covered is None else (covered | c)
        orph = _sl_main(cont_m[m]) & ~covered
        lpos = 4 * gpos + m
        err_events.append(
            jnp.where(orph, (lpos << 8) | _TOO_LONG, BIGKEY))

    ek = jnp.int32(BIGKEY)
    for e in err_events:
        ek = jnp.minimum(ek, jnp.min(e))

    # unit emission: unit0 at leads, unit1 at the byte after a lead4.
    # The backward shift for plane 0 runs on EXTM so the first byte of the
    # tile sees the previous tile's trailing lead4 (sliced to main after).
    def bswap(u):
        return ((u << 8) | (u >> 8)) & 0xFFFF if big_endian else u

    vals, keeps = [], []
    for m in range(4):
        if no_l4:
            # no astral codepoints anywhere: every unit is unit0 = cp
            # (cp <= 0xFFFF by construction), no surrogate-pair lane and
            # no cp_prev backward rolls
            keep = _sl_main(lead_m[m])
            val = bswap(_sl_main(cp_m[m])) & 0xFFFF
            keeps.append(keep)
            vals.append(val)
            continue
        pm = (m - 1) % 4
        if m == 0:
            al4 = _sl_main(
                _groll_right(lead4_m[pm].astype(jnp.int32), 1, roll)
            ) > 0
            cp_prev = _sl_main(_groll_right(cp_m[pm], 1, roll))
        else:
            al4 = _sl_main(lead4_m[pm])
            cp_prev = _sl_main(cp_m[pm])
        cp = _sl_main(cp_m[m])
        cpx = cp - 0x10000
        unit0 = jnp.where(cp > 0xFFFF, 0xD800 + (cpx >> 10), cp)
        unit1 = 0xDC00 + ((cp_prev - 0x10000) & 0x3FF)
        keep = _sl_main(lead_m[m]) | al4
        val = bswap(jnp.where(al4, unit1, unit0)) & 0xFFFF
        keeps.append(keep)
        vals.append(val)

    # units emitted for bytes strictly before the tile's first event (the
    # exact partial-output count: a kept byte's offset depends only on
    # preceding bytes, so every unit before the first error is correct)
    epos = ek >> 8
    prefix = jnp.int32(0)
    for m in range(4):
        prefix = prefix + jnp.sum(
            (keeps[m] & ((4 * gpos + m) < epos)).astype(jnp.int32))

    # tile-exclusive scan of keep over flat byte order via group totals
    k32 = [k.astype(jnp.int32) for k in keeps]
    kg = k32[0] + k32[1] + k32[2] + k32[3]
    inc = kg
    shift = 1
    while shift < PW:  # lane scan within rows
        moved = roll(inc, shift, 1)
        inc = inc + jnp.where(lane >= shift, moved, 0)
        shift *= 2
    row_tot = jnp.broadcast_to(inc[:, PW - 1 :], (PR, PW))
    rinc = row_tot
    shift = 1
    while shift < PR:  # row scan of totals
        moved = roll(rinc, shift, 0)
        rinc = rinc + jnp.where(row >= shift, moved, 0)
        shift *= 2
    count_row = rinc[PR - 1 :, :]  # (1, PW); all lanes = total
    off_g = (rinc - row_tot) + (inc - kg)  # exclusive, per group
    offs = [off_g]
    for m in range(3):
        offs.append(offs[-1] + k32[m])

    # packed words: unit | displacement<<16; non-kept pinned at disp 0
    words = []
    dmax = jnp.int32(0)
    for m in range(4):
        q = 4 * gpos + m
        disp = jnp.where(keeps[m], q - offs[m], 0)
        dmax = jnp.maximum(dmax, jnp.max(disp))
        words.append(jnp.where(keeps[m], vals[m], 0) | (disp << 16))

    # butterfly: LSB-first conditional move-left by s. A stage whose
    # shift exceeds the tile's max displacement is provably a no-op
    # (after stages < k every remaining displacement is its original
    # value with the low k bits cleared, so dmax < 2^k implies zero) —
    # lax.cond skips it, which prices the butterfly by the tile's actual
    # disorder: all-kept (ASCII) tiles skip all 15 stages, ~3%-dropped
    # MIME-class tiles skip 5, only adversarial tiles pay every round.
    words = _staged_moves(words, dmax, STAGES, 16, roll)

    # pack compacted units (plane q%4, group q//4 holds flat unit q) into
    # true-order int32 pairs: pair p = units (2p, 2p+1); even pairs live
    # in planes (0,1), odd pairs in planes (2,3) of group p//2
    u = [w & 0xFFFF for w in words]
    q01 = u[0] | (u[1] << 16)
    q23 = u[2] | (u[3] << 16)
    scratch = _interleave2(q01, q23, roll)
    return scratch, count_row, ek, prefix


def _interleave2(a, b, roll):
    """(R, L) x (R, L) -> (R, 2L) perfect shuffle from roll+select stages
    (kernels/shuffle.py construction, parameterized on the roll fn)."""
    z = jnp.concatenate([a, b], axis=1)
    g = z.shape[1]
    while g >= 4:
        qq = g // 4
        pos = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1) & (g - 1)
        from_right = roll(z, z.shape[1] - qq, 1)
        from_left = roll(z, qq, 1)
        take_c = (pos >= qq) & (pos < 2 * qq)
        take_b = (pos >= 2 * qq) & (pos < 3 * qq)
        z = jnp.where(take_c, from_right, jnp.where(take_b, from_left, z))
        g //= 2
    return z


# --- phase B pallas_call -------------------------------------------------

def _phase_b_kernel(len_ref, prv_ref, x_ref, nxt_ref, scr_ref, st_ref,
                    *, big_endian, no_l2=False, no_l4=False):
    t = pl.program_id(0)
    base = t * TILE
    scratch, count_row, ek, prefix = _tile_core(
        prv_ref[...], x_ref[...], nxt_ref[...], base, len_ref[0],
        big_endian, _proll, no_l2, no_l4,
    )
    scr_ref[...] = scratch
    # stats lanes: 0 = unit count, 2 = min event key (BIGKEY when the
    # tile is valid), 3 = units before the event; others = has-event flag
    _, lane = _iotas((8, PW))
    has = (ek < BIGKEY).astype(jnp.int32)
    st = jnp.full((8, PW), has, jnp.int32)
    st = jnp.where(lane == 0, jnp.broadcast_to(count_row, (8, PW)), st)
    st = jnp.where(lane == 2, ek, st)
    st = jnp.where(lane == 3, prefix, st)
    st_ref[...] = st


def _phase_b(x32, length, nt: int, big_endian: bool,
             no_l2: bool = False, no_l4: bool = False):
    """x32: (nt*64, 128) int32 view of the UNPADDED byte buffer.
    Returns (scratch (nt*64, 256) i32, stats (nt, 128) i32).

    Halo blocks at the buffer edges read CLAMPED indices instead of a
    zero-padded copy: the kernel already masks every byte by its global
    position (q >= 0 and q < length), so edge-halo contents are never
    consumed — and the jnp.pad the old form needed was a full extra
    read+write pass over the corpus (~2.2 ms at 64 MiB, tools/
    probe_butterfly 'prep')."""
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(
                (HR, PW), lambda t, L: (jnp.maximum(8 * t - 1, 0), 0)),
            pl.BlockSpec((PR, PW), lambda t, L: (t, 0)),
            pl.BlockSpec(
                (HR, PW),
                lambda t, L: (jnp.minimum(8 * (t + 1), 8 * nt - 1), 0)),
        ],
        out_specs=(
            pl.BlockSpec((PR, 2 * PW), lambda t, L: (t, 0)),
            pl.BlockSpec((8, PW), lambda t, L: (t, 0)),
        ),
    )
    return pl.pallas_call(
        functools.partial(_phase_b_kernel, big_endian=big_endian,
                          no_l2=no_l2, no_l4=no_l4),
        grid_spec=grid,
        out_shape=(
            sds(x32, (nt * PR, 2 * PW), jnp.int32),
            sds(x32, (nt * 8, PW), jnp.int32),
        ),
        interpret=_interpret(),
    )(jnp.asarray(length, jnp.int32).reshape(1), x32, x32, x32)


# --- phase C pallas_call -------------------------------------------------

CAND = 5  # an output tile can intersect 5 segments: >= 1 unit per 3
# bytes means middle segments hold >= 10921 units, and
# 3 * 10921 + 1 < 32768 admits a 5th


def _dyn_pair_roll_right(w, k, roll):
    """Flat roll right by dynamic k pairs on (PR, 2*PW) int32."""
    R, L = w.shape
    lk = k % L
    rk = (k // L) % R
    z1 = roll(w, lk, 1)
    z2 = roll(z1, rk, 0)
    z3 = roll(z1, (rk + 1) % R, 0)
    _, lane = _iotas(w.shape)
    return jnp.where(lane >= lk, z2, z3)


def _phase_c_kernel(t0_ref, thi_ref, off_ref, elen_ref, s_ref, out_ref):
    """Grid (j, m): candidate m of out tile j. The out block is revisited
    across m (the pallas accumulation idiom — it stays VMEM-resident
    because the out index map ignores m), so scratch is ONE input whose
    block index varies per (j, m) instead of CAND aliased arguments: the
    aliased form made XLA materialize CAND copies of the whole scratch
    whenever phase C sat inside a conditional branch (the round-3 "25 ms
    conditional-output copy"; re-measured 2026-08-20 as ~30 ms inside the
    census switch).

    Candidates past the tile's ACTUAL span (t0..thi, typically 2-3 of the
    static worst-case CAND=5) clamp their block index to thi: consecutive
    equal indices skip the HBM fetch under Mosaic's pipelining, and the
    merge compute is gated off. The unclamped form re-read the whole
    scratch CAND times — the dominant phase-C cost whenever stream
    bandwidth is the binding resource (measured 2026-08-20: 6.4 -> ~3 ms
    at 64 MiB in a 140 GB/s device state)."""
    j, m = pl.program_id(0), pl.program_id(1)
    base_u = j * UNITS
    row, lane = _iotas((PR, 2 * PW))
    p = row * (2 * PW) + lane  # pair index within the out tile
    u_lo = base_u + 2 * p
    nt = off_ref.shape[0] - 1
    t = jnp.minimum(jnp.minimum(t0_ref[j] + m, thi_ref[j]), nt - 1)
    live = (m == 0) | (t0_ref[j] + m <= thi_ref[j])
    # DEAD output tiles (entirely at/past the valid output end — 37% of
    # the capacity grid on the mixed flagship, 65% on CJK corpora, since
    # actual units/byte < 1): store zeros at m=0 and skip every merge;
    # the in_spec clamps their scratch index to block 0 so consecutive
    # dead steps skip the HBM fetch under Mosaic's pipelining (the same
    # idiom as the candidate clamp). Bit-exact: the masks produced all
    # zeros for these tiles anyway.
    alive = base_u < elen_ref[0]

    def _merge(init: bool):
        # the whole merge — roll, mask AND store — lives inside the
        # pl.when bodies: computed unconditionally, the dead candidates'
        # ~60 vector ops dominated phase C (~0.7 ms per clamped
        # candidate at 64 MiB, measured 2026-08-20)
        o_start = off_ref[t]
        # elen clamps every segment: units at/after the valid-prefix end
        # stay zero (the error-path tail mask folded into the masking the
        # kernel already does — a separate XLA pass over the 2N-byte
        # output costs ~29 ms in the degraded elementwise class)
        o_end = jnp.minimum(off_ref[t + 1], elen_ref[0])
        sh_units = (o_start - base_u) % UNITS  # circular
        w = s_ref[...]
        # units-granularity roll right: odd part first (unit lane swap
        # across int32 pairs), then a dynamic pair roll
        wprev = _dyn_pair_roll_right(w, jnp.int32(1), _proll)
        w_odd = ((w << 16) | ((wprev >> 16) & 0xFFFF))
        wbase = jnp.where((sh_units & 1) != 0, w_odd, w)
        rolled = _dyn_pair_roll_right(wbase, sh_units // 2, _proll)
        in_lo = (u_lo >= o_start) & (u_lo < o_end)
        in_hi = (u_lo + 1 >= o_start) & (u_lo + 1 < o_end)
        mask = (jnp.where(in_lo, 0xFFFF, 0)
                | jnp.where(in_hi, jnp.int32(-65536), 0))  # 0xFFFF0000
        if init:
            out_ref[...] = rolled & mask
        else:
            out_ref[...] = (out_ref[...] & ~mask) | (rolled & mask)

    @pl.when((m == 0) & alive)
    def _init():
        _merge(True)

    @pl.when((m == 0) & ~alive)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when((m > 0) & live & alive)
    def _acc():
        _merge(False)


def _span_hi(off, nt: int, unit_cap: int):
    """t_hi[j] = last segment whose start offset lies before out tile
    j's end — with t0, the tile's actual candidate span. Clamped into
    [0, nt); the kernel additionally clamps to >= the index map's m=0
    block so degenerate tiles stay consistent."""
    bases = jnp.arange(nt, dtype=jnp.int32) * unit_cap
    return jnp.clip(
        jnp.sum(off[None, :nt] < (bases[:, None] + unit_cap), axis=1)
        .astype(jnp.int32) - 1,
        0, nt - 1)


def _phase_c(scratch, t0, thi, off, nt: int, elen):
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nt, CAND),
        in_specs=[
            pl.BlockSpec(
                (PR, 2 * PW),
                lambda j, m, t0r, thir, offr, elr: (
                    jnp.where(
                        j * UNITS < elr[0],
                        jnp.minimum(jnp.minimum(t0r[j] + m, thir[j]),
                                    nt - 1),
                        0),
                    0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (PR, 2 * PW), lambda j, m, t0r, thir, offr, elr: (j, 0)),
    )
    return pl.pallas_call(
        _phase_c_kernel,
        grid_spec=grid,
        out_shape=sds(scratch, (nt * PR, 2 * PW), jnp.int32),
        interpret=_interpret(),
    )(t0, thi, off, jnp.asarray(elen, jnp.int32).reshape(1), scratch)


# --- driver ----------------------------------------------------------------

def to_utf16_compose(b_u8: jnp.ndarray, length, big_endian: bool,
                     no_l2: bool = False, no_l4: bool = False):
    """Butterfly transcode of a 1-D padded uint8 buffer whose size is a
    multiple of TILE. Returns (out u16[N], total, err_any, err_pos,
    err_code, err_len): on invalid input err_pos/err_code are the exact
    first-error position and code (ops/utf8.classify's lattice,
    value-for-value) and err_len is the unit count of the valid prefix —
    everything the caller's contract needs, with NO fallback engine and
    NO conditionals (exact partial output = out[:err_len], which is
    bit-correct by construction; the caller masks the tail)."""
    n = b_u8.shape[0]
    assert n % TILE == 0, n
    nt = n // TILE
    x32 = u8_words(b_u8)  # (nt*64, 128); no minor-4 array (validate.py)
    scratch, stats = _phase_b(x32, length, nt, big_endian, no_l2, no_l4)
    counts = stats[::8, 0]
    eks = stats[::8, 2]
    prefs = stats[::8, 3]
    off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )
    total = off[nt]
    # exact first error across tiles: tile event positions are disjoint
    # and increasing, so the min global position is THE first error; the
    # reporting tile's prefix + its exclusive offset = units before it
    has = eks < BIGKEY
    bases_b = jnp.arange(nt, dtype=jnp.int32) * TILE
    gpos_t = bases_b + (eks >> 8)
    err_pos = jnp.min(jnp.where(has, gpos_t, BIG))
    first = has & (gpos_t == err_pos)
    err_code = jnp.max(jnp.where(first, eks & 0xFF, 0))
    err_len = jnp.sum(jnp.where(first, off[:nt] + prefs, 0))
    err_any = err_pos < BIG
    bases = jnp.arange(nt, dtype=jnp.int32) * UNITS
    # t0[j] = last tile whose offset <= j*UNITS
    t0 = (
        jnp.sum(off[None, :nt] <= bases[:, None], axis=1).astype(jnp.int32)
        - 1
    )
    out_len = jnp.where(err_any, err_len, total)
    thi = _span_hi(off, nt, UNITS)
    out32 = _phase_c(scratch, t0, thi, off, nt, out_len)
    u16 = jax.lax.bitcast_convert_type(
        out32.reshape(-1), jnp.uint16
    ).reshape(-1)
    return u16, total, err_any, err_pos, err_code, err_len
