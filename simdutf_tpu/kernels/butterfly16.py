"""General-path (mixed-width) UTF-16 -> UTF-8 transcode with NO scatter
and NO gather: the butterfly (log-shift) concentration of
kernels/butterfly.py applied in the expansion direction. Reference
counterpart: the shuffle-table utf16->utf8 kernels
(src/haswell/avx2_convert_utf16_to_utf8.cpp, arm64 arm_convert_utf16_to_utf8
.cpp), re-derived for a VPU whose only cheap data movement is uniform
rotation; engine selection vs the XLA scatter engine is measurement-driven
(ops/engine_probe), mirroring src/implementation.cpp:1274's best-pick.

Layout per tile: one u16 unit per int32 lane ((PR, PW) = 8192 units =
16 KiB of UTF-16 input). Each unit owns FOUR candidate output-byte slots
(planes m = 0..3; slot 3 is never kept — a unit emits at most 3 bytes:
1-3 for scalars, 2+2 split across a surrogate pair, the astral bytes
(b0,b1) at the high surrogate and (b2,b3) at the low). Keeps are
prefix-closed per unit, so every kept byte's displacement is
d = 4*g - off(g), monotone over the candidate stream — the LSB-first
butterfly of kernels/butterfly.py compacts it congestion-free. Because the
candidate planes number exactly 4, the compacted stream packs into
byte-order int32 words with three shifts and two ors, and composition
(phase C) runs at byte granularity with dynamic word rolls + sub-word
byte-shift selects.

Any error (lone surrogate) anywhere falls back to the whole-buffer XLA
engine, preserving exact first-error/partial-output contracts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .validate import _interpret, sds
from .butterfly import (
    PR, PW, HR, BIG, _iotas, _groll_left, _groll_right, _flat_roll_left,
    _jroll, _proll, _staged_moves,
)
from ..errors import error_code as _ec

_SURROGATE = int(_ec.SURROGATE)
# event key = local unit position << 8 | code; no event = BIGKEY16
BIGKEY16 = (PR * PW + 8) << 8

TILE_U = PR * PW  # 8192 u16 units per tile
SLOTS = 4  # candidate output-byte slots per unit (slot 3 never kept)
CAND_POS = SLOTS * TILE_U  # 32768 candidate positions
STAGES = 15  # log2(CAND_POS)
CAPB = CAND_POS  # output scratch capacity per tile, bytes (= 4 B/unit)
CAND = 5  # segments intersecting one out tile: middles hold >= TILE_U
# bytes (>= 1 B/unit), and 3 * TILE_U + 2 <= CAPB admits no 6th


# --- per-tile core (shared by the Pallas kernel and the jnp model) --------

def _tile_core16(prv, x, nxt, base, length, roll):
    """prv/nxt: (HR, PW) int32 halo rows (one u16 unit per lane); x:
    (PR, PW) int32 tile. base: global unit index of x[0,0]; length: global
    valid unit count. Returns (scratch (PR, PW) int32 byte-packed output,
    count_row (1, PW), err_any)."""
    ext = jnp.concatenate([prv, x, nxt], axis=0)  # (HR+PR+HR, PW)
    RE = ext.shape[0]
    row_e, lane_e = _iotas((RE, PW))
    g_e = (row_e - HR) * PW + lane_e
    q_e = base + g_e
    in_r_e = (q_e >= 0) & (q_e < length)
    w_e = jnp.where(in_r_e, ext & 0xFFFF, 0)

    def sl_main(a):
        return a[HR : HR + PR]

    # neighbors at unit granularity (flat group +-1 on the extended plane)
    def g_shift_left(a):  # read unit g+1
        z1 = roll(a, PW - 1, 1)
        z2 = roll(z1, RE - 1, 0)
        _, lane = _iotas(a.shape)
        return jnp.where(lane < PW - 1, z1, z2)

    def g_shift_right(a):  # read unit g-1
        z1 = roll(a, 1, 1)
        z2 = roll(z1, 1, 0)
        _, lane = _iotas(a.shape)
        return jnp.where(lane >= 1, z1, z2)

    w = sl_main(w_e)
    in_r = sl_main(in_r_e)
    nxt_w = sl_main(g_shift_left(w_e))
    nxt_in = sl_main(g_shift_left(in_r_e.astype(jnp.int32))) > 0
    prv_w = sl_main(g_shift_right(w_e))
    prv_in = sl_main(g_shift_right(in_r_e.astype(jnp.int32))) > 0

    is_hi = ((w & 0xFC00) == 0xD800) & in_r
    is_lo = ((w & 0xFC00) == 0xDC00) & in_r
    nxt_lo = ((nxt_w & 0xFC00) == 0xDC00) & nxt_in
    prv_hi = ((prv_w & 0xFC00) == 0xD800) & prv_in
    # exact first-error events in-kernel (ops/utf16.first_error
    # value-for-value): a lone surrogate at its own unit position —
    # every event lands in the tile containing it, no fallback engine
    row0, lane0 = _iotas((PR, PW))
    upos = row0 * PW + lane0
    lone = (is_hi & ~nxt_lo) | (is_lo & ~prv_hi)
    ek = jnp.min(jnp.where(lone, (upos << 8) | _SURROGATE, BIGKEY16))

    e1 = in_r & (w < 0x80)
    e2 = in_r & (w >= 0x80) & (w < 0x800)
    e3 = in_r & (w >= 0x800) & ~is_hi & ~is_lo
    hb = w - 0xD7C0  # (cp >> 10) for astral, 11 bits
    hb_prev = prv_w - 0xD7C0

    v0 = jnp.where(e1, w, 0)
    v0 = jnp.where(e2, 0xC0 | (w >> 6), v0)
    v0 = jnp.where(e3, 0xE0 | (w >> 12), v0)
    v0 = jnp.where(is_hi, 0xF0 | (hb >> 8), v0)
    v0 = jnp.where(is_lo, 0x80 | ((hb_prev & 0x3) << 4) | ((w >> 6) & 0xF),
                   v0)
    v1 = jnp.where(e2, 0x80 | (w & 0x3F), 0)
    v1 = jnp.where(e3, 0x80 | ((w >> 6) & 0x3F), v1)
    v1 = jnp.where(is_hi, 0x80 | ((hb >> 2) & 0x3F), v1)
    v1 = jnp.where(is_lo, 0x80 | (w & 0x3F), v1)
    v2 = jnp.where(e3, 0x80 | (w & 0x3F), 0)

    k0 = in_r
    k1 = in_r & ~e1
    k2 = e3
    keeps = [k0, k1, k2]
    vals = [v0, v1, v2]

    # exclusive scan of per-unit emission counts over flat unit order
    row, lane = _iotas((PR, PW))
    gpos = row * PW + lane
    eg = k0.astype(jnp.int32) + k1.astype(jnp.int32) + k2.astype(jnp.int32)
    # bytes emitted for units strictly before the tile's first event
    prefix = jnp.sum(jnp.where(gpos < (ek >> 8), eg, 0))
    inc = eg
    shift = 1
    while shift < PW:
        moved = roll(inc, shift, 1)
        inc = inc + jnp.where(lane >= shift, moved, 0)
        shift *= 2
    row_tot = jnp.broadcast_to(inc[:, PW - 1 :], (PR, PW))
    rinc = row_tot
    shift = 1
    while shift < PR:
        moved = roll(rinc, shift, 0)
        rinc = rinc + jnp.where(row >= shift, moved, 0)
        shift *= 2
    count_row = rinc[PR - 1 :, :]  # (1, PW): total bytes emitted
    off = (rinc - row_tot) + (inc - eg)  # exclusive, per unit

    # packed words: byte | displacement<<8 (disp < 2^15, val 8 bits)
    disp_u = 4 * gpos - off  # same for every slot of the unit
    words = []
    for m in range(SLOTS):
        if m < 3:
            keep = keeps[m]
            wv = jnp.where(keep, vals[m], 0) | jnp.where(
                keep, disp_u << 8, 0)
        else:
            wv = jnp.zeros((PR, PW), jnp.int32)
        words.append(wv)
    dmax = jnp.max(jnp.where(keeps[0], disp_u, 0))

    # butterfly: LSB-first conditional move-left by s over candidate
    # stream c = 4*g + m (kernels/butterfly._staged_moves: shared rounds,
    # stages above the tile's max displacement skipped)
    words = _staged_moves(words, dmax, STAGES, 8, roll)

    # compacted candidate c sits at plane c%4, group c//4: output word k
    # = bytes (4k..4k+3) = planes 0..3 of group k
    b = [wv & 0xFF for wv in words]
    scratch = b[0] | (b[1] << 8) | (b[2] << 16) | (b[3] << 24)
    return scratch, count_row, ek, prefix


# --- phase B pallas_call ---------------------------------------------------

def _phase_b16_kernel(len_ref, prv_ref, x_ref, nxt_ref, scr_ref, st_ref):
    t = pl.program_id(0)
    base = t * TILE_U
    scratch, count_row, ek, prefix = _tile_core16(
        prv_ref[...], x_ref[...], nxt_ref[...], base, len_ref[0], _proll,
    )
    scr_ref[...] = scratch
    # stats lanes: 0 = byte count, 2 = min event key, 3 = bytes before
    # the event; others = has-event flag
    _, lane = _iotas((8, PW))
    has = (ek < BIGKEY16).astype(jnp.int32)
    st = jnp.full((8, PW), has, jnp.int32)
    st = jnp.where(lane == 0, jnp.broadcast_to(count_row, (8, PW)), st)
    st = jnp.where(lane == 2, ek, st)
    st = jnp.where(lane == 3, prefix, st)
    st_ref[...] = st


def _phase_b16(x32, length, nt: int):
    """x32: (nt*64, 128) int32 units (unpadded; clamped edge halos).
    Returns (scratch (nt*64, 128) i32, stats (nt*8, 128) i32)."""
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            # clamped edge halos on the UNPADDED buffer: out-of-range
            # halo contents are masked by global position in the core
            # (q >= 0 / q < length), so the old zero-pad copy — a full
            # extra pass over the corpus — is unnecessary
            pl.BlockSpec(
                (HR, PW), lambda t, L: (jnp.maximum(8 * t - 1, 0), 0)),
            pl.BlockSpec((PR, PW), lambda t, L: (t, 0)),
            pl.BlockSpec(
                (HR, PW),
                lambda t, L: (jnp.minimum(8 * (t + 1), 8 * nt - 1), 0)),
        ],
        out_specs=(
            pl.BlockSpec((PR, PW), lambda t, L: (t, 0)),
            pl.BlockSpec((8, PW), lambda t, L: (t, 0)),
        ),
    )
    return pl.pallas_call(
        _phase_b16_kernel,
        grid_spec=grid,
        out_shape=(
            sds(x32, (nt * PR, PW), jnp.int32),
            sds(x32, (nt * 8, PW), jnp.int32),
        ),
        interpret=_interpret(),
    )(jnp.asarray(length, jnp.int32).reshape(1), x32, x32, x32)


# --- phase C pallas_call ---------------------------------------------------

def _dyn_word_roll_right(w, k, roll):
    """Flat roll right by dynamic k int32 words on (PR, PW)."""
    R, L = w.shape
    lk = k % L
    rk = (k // L) % R
    z1 = roll(w, lk, 1)
    z2 = roll(z1, rk, 0)
    z3 = roll(z1, (rk + 1) % R, 0)
    _, lane = _iotas(w.shape)
    return jnp.where(lane >= lk, z2, z3)


def _phase_c16_kernel(t0_ref, thi_ref, off_ref, elen_ref, s_ref, out_ref):
    # grid (j, m): out block revisited across m (VMEM-resident), scratch
    # is ONE input — the CAND-aliased form made XLA materialize CAND
    # copies of scratch whenever phase C sat inside a conditional branch
    # (kernels/butterfly._phase_c_kernel). Candidates past the tile's
    # actual span clamp to thi: equal consecutive block indices skip the
    # HBM fetch, the merge is gated off (butterfly._phase_c_kernel's
    # span clamp — phase C traffic was CAND x scratch otherwise).
    j, m = pl.program_id(0), pl.program_id(1)
    base_b = j * CAPB  # global byte index of this out tile's first byte
    row, lane = _iotas((PR, PW))
    p = row * PW + lane  # word index within the out tile
    b_lo = base_b + 4 * p
    nt = off_ref.shape[0] - 1
    t = jnp.minimum(jnp.minimum(t0_ref[j] + m, thi_ref[j]), nt - 1)
    live = (m == 0) | (t0_ref[j] + m <= thi_ref[j])
    # dead out tiles (entirely past the valid output end — the capacity
    # is 4 B/unit vs 1-3 actual, so 25-75% of the grid): zero-store at
    # m=0, merges skipped, scratch index pinned (butterfly._phase_c_kernel)
    alive = base_b < elen_ref[0]

    def _merge(init: bool):
        # roll + mask + store all live inside the pl.when bodies so
        # clamped candidates cost nothing (butterfly._phase_c_kernel)
        o_start = off_ref[t]
        # elen clamps every segment: bytes at/after the valid-prefix end
        # stay zero (error-path tail mask folded into existing masking)
        o_end = jnp.minimum(off_ref[t + 1], elen_ref[0])
        sh_bytes = (o_start - base_b) % CAPB  # circular
        wv = s_ref[...]
        kw = sh_bytes // 4
        kr = sh_bytes % 4
        w1 = _dyn_word_roll_right(wv, kw, _proll)
        wp = _dyn_word_roll_right(wv, kw + 1, _proll)
        # byte-granularity roll: out word = low (4-kr) bytes shifted up
        # from w1, top kr bytes of wp shifted down
        rolled = w1
        for r in (1, 2, 3):
            cand = (w1 << (8 * r)) | ((wp >> (32 - 8 * r))
                                      & ((1 << (8 * r)) - 1))
            rolled = jnp.where(kr == r, cand, rolled)
        # per-byte in-segment masks (byte-3 constant wraps negative)
        mask = jnp.zeros((PR, PW), jnp.int32)
        for l in range(4):
            in_l = (b_lo + l >= o_start) & (b_lo + l < o_end)
            bmask = jnp.int32(int.from_bytes(
                (0xFF << (8 * l)).to_bytes(4, "little"), "little",
                signed=True))
            mask = mask | jnp.where(in_l, bmask, 0)
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


def _phase_c16(scratch, t0, off, nt: int, elen):
    from .butterfly import _span_hi

    thi = _span_hi(off, nt, CAPB)
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nt, CAND),
        in_specs=[
            pl.BlockSpec(
                (PR, PW),
                lambda j, m, t0r, thir, offr, elr: (
                    jnp.where(
                        j * CAPB < elr[0],
                        jnp.minimum(jnp.minimum(t0r[j] + m, thir[j]),
                                    nt - 1),
                        0),
                    0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (PR, PW), lambda j, m, t0r, thir, offr, elr: (j, 0)),
    )
    return pl.pallas_call(
        _phase_c16_kernel,
        grid_spec=grid,
        out_shape=sds(scratch, (nt * PR, PW), jnp.int32),
        interpret=_interpret(),
    )(t0, thi, off, jnp.asarray(elen, jnp.int32).reshape(1), scratch)


# --- driver ----------------------------------------------------------------

def to_utf8_compose(w_u16: jnp.ndarray, length):
    """Butterfly transcode of a 1-D padded native-order uint16 buffer
    whose unit count is a multiple of TILE_U. Returns (out u8[3N], total,
    err_any, err_pos, err_code, err_len): exact first-error position/code
    (ops/utf16.first_error value-for-value) and the byte count of the
    valid prefix come from in-kernel events — no fallback engine, no
    conditionals; out is zeroed at/after the prefix end by phase C."""
    n = w_u16.shape[0]
    assert n % TILE_U == 0, n
    nt = n // TILE_U
    x32 = w_u16.astype(jnp.int32).reshape(-1, PW)
    scratch, stats = _phase_b16(x32, length, nt)
    counts = stats[::8, 0]
    eks = stats[::8, 2]
    prefs = stats[::8, 3]
    off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )
    total = off[nt]
    has = eks < BIGKEY16
    bases_u = jnp.arange(nt, dtype=jnp.int32) * TILE_U
    gpos_t = bases_u + (eks >> 8)
    err_pos = jnp.min(jnp.where(has, gpos_t, BIG))
    first = has & (gpos_t == err_pos)
    err_code = jnp.max(jnp.where(first, eks & 0xFF, 0))
    err_len = jnp.sum(jnp.where(first, off[:nt] + prefs, 0))
    err_any = err_pos < BIG
    bases = jnp.arange(nt, dtype=jnp.int32) * CAPB
    t0 = (
        jnp.sum(off[None, :nt] <= bases[:, None], axis=1).astype(jnp.int32)
        - 1
    )
    out_len = jnp.where(err_any, err_len, total)
    out32 = _phase_c16(scratch, t0, off, nt, out_len)
    u8 = lax.bitcast_convert_type(
        out32.reshape(-1, 1), jnp.uint8
    ).reshape(-1)[: 3 * n]
    return u8, total, err_any, err_pos, err_code, err_len
