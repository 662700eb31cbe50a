"""General-path (mixed-script) UTF-8 -> UTF-32 transcode with NO scatter
and NO gather: butterfly (log-shift) concentration, the kernels/butterfly
machinery at byte-per-lane layout. Reference counterpart: the utf8->utf32
validating transcode (generic/utf8_to_utf32/utf8_to_utf32.h driving
per-arch masked kernels), re-derived for a VPU whose only cheap data
movement is uniform rotation.

Layout per tile: one input byte per int32 lane ((PR, PW) = 8192 bytes).
Each LEAD byte emits one codepoint as TWO candidate half-words (planes
m = 0: cp & 0xFFFF, m = 1: cp >> 16), both kept together, so the packed
word (half | disp<<16) stays within int32 (disp < 16384, 14 stages) and
the compacted stream u32-packs as P0 | P1<<16 — composition (phase C)
then runs at pure int32-word granularity (dynamic word rolls only, no
sub-word phases). Any error falls back to the caller's exact engine."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .validate import _interpret, sds
from .butterfly import (
    PR, PW, HR, _iotas, _groll_left, _flat_roll_left, _jroll, _proll, _staged_moves,
)
from .butterfly16 import _dyn_word_roll_right

TILE_B = PR * PW  # 8192 input bytes per tile
CAND_POS = 2 * TILE_B  # two half-word candidates per byte
STAGES = 14  # log2(CAND_POS)
CAPW = TILE_B  # output capacity per tile, u32 words (1 cp/byte max)
CAND = 5  # segments per out tile: middles hold >= TILE_B/4 codepoints,
# and 3 * (TILE_B // 4) + 2 <= CAPW admits no 6th


def _tile_core32(prv, x, nxt, base, length, roll):
    """prv/nxt: (HR, PW) int32 halo rows (one byte per lane); x: (PR, PW)
    int32 tile. Returns (scratch (PR, PW) int32 = packed u32 codepoints,
    count_row (1, PW), err_any)."""
    ext = jnp.concatenate([prv, x, nxt], axis=0)
    RE = ext.shape[0]
    row_e, lane_e = _iotas((RE, PW))
    q_e = base + (row_e - HR) * PW + lane_e
    in_r_e = (q_e >= 0) & (q_e < length)
    b_e = jnp.where(in_r_e, ext & 0xFF, 0)

    def sl_main(a):
        return a[HR : HR + PR]

    def fwd(a, j):
        """Read flat byte q+j on the extended plane (j <= HR*PW)."""
        z = a
        lane_k, row_k = j % PW, j // PW
        if lane_k:
            z1 = roll(z, PW - lane_k, 1)
            z2 = roll(z1, RE - 1, 0)
            _, lane = _iotas(z.shape)
            z = jnp.where(lane < PW - lane_k, z1, z2)
        if row_k:
            z = roll(z, RE - row_k, 0)
        return z

    b = sl_main(b_e)
    in_r = sl_main(in_r_e)
    b1 = sl_main(fwd(b_e, 1))
    b2 = sl_main(fwd(b_e, 2))
    b3 = sl_main(fwd(b_e, 3))
    b4 = sl_main(fwd(b_e, 4))

    is_cont = (b & 0xC0) == 0x80
    c1 = (b1 & 0xC0) == 0x80
    c2 = (b2 & 0xC0) == 0x80
    c3 = (b3 & 0xC0) == 0x80
    c4 = (b4 & 0xC0) == 0x80
    ascii_ = b < 0x80
    lead2 = (b & 0xE0) == 0xC0
    lead3 = (b & 0xF0) == 0xE0
    lead4 = (b & 0xF8) == 0xF0
    badlead = b >= 0xF8
    cp2 = ((b & 0x1F) << 6) | (b1 & 0x3F)
    cp3 = ((b & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F)
    cp4 = (((b & 0x07) << 18) | ((b1 & 0x3F) << 12) | ((b2 & 0x3F) << 6)
           | (b3 & 0x3F))
    err = jnp.zeros_like(b)
    err = jnp.where(lead2 & ~c1, 1, err)
    err = jnp.where(lead2 & c1 & (cp2 < 0x80), 1, err)
    ok3 = c1 & c2
    err = jnp.where(lead3 & ~ok3, 1, err)
    err = jnp.where(lead3 & ok3 & (cp3 < 0x800), 1, err)
    err = jnp.where(lead3 & ok3 & (cp3 >= 0xD800) & (cp3 <= 0xDFFF), 1, err)
    ok4 = c1 & c2 & c3
    err = jnp.where(lead4 & ~ok4, 1, err)
    err = jnp.where(lead4 & ok4 & (cp4 <= 0xFFFF), 1, err)
    err = jnp.where(lead4 & ok4 & (cp4 > 0x10FFFF), 1, err)
    err = jnp.where(badlead, 1, err)
    seqlen = jnp.where(ascii_, 1, 0)
    seqlen = jnp.where(lead2, 2, seqlen)
    seqlen = jnp.where(lead3, 3, seqlen)
    seqlen = jnp.where(lead4, 4, seqlen)
    cp = jnp.where(ascii_, b, 0)
    cp = jnp.where(lead2, cp2, cp)
    cp = jnp.where(lead3, cp3, cp)
    cp = jnp.where(lead4, cp4, cp)
    gap = (((seqlen == 1) & c1) | ((seqlen == 2) & c2)
           | ((seqlen == 3) & c3) | ((seqlen == 4) & c4))
    lead = ~is_cont & in_r
    err_any = jnp.max(
        ((lead & (err != 0)) | (lead & (err == 0) & gap)).astype(jnp.int32)
    )

    # exclusive scan of leads over flat byte order
    row, lane = _iotas((PR, PW))
    gpos = row * PW + lane
    kg = lead.astype(jnp.int32)
    inc = kg
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
    count_row = rinc[PR - 1 :, :]  # total codepoints
    ci = (rinc - row_tot) + (inc - kg)  # exclusive codepoint index

    # packed candidate words: half | disp<<16; disp = 2*(q - ci) is even
    # and < 2^14, identical for both halves of a codepoint
    disp = jnp.where(lead, 2 * (gpos - ci), 0)
    words = [
        jnp.where(lead, cp & 0xFFFF, 0) | (disp << 16),
        jnp.where(lead, (cp >> 16) & 0x1F, 0) | (disp << 16),
    ]

    # butterfly: LSB-first conditional move-left by s over candidate
    # stream c = 2*g + m (shared rounds; no-op stages skipped)
    words = _staged_moves(words, jnp.max(disp), STAGES, 16, roll)

    # compacted candidate c at plane c%2, group c//2: u32 word k = lo from
    # plane 0, hi from plane 1
    scratch = (words[0] & 0xFFFF) | ((words[1] & 0xFFFF) << 16)
    return scratch, count_row, err_any


# --- phase B pallas_call ---------------------------------------------------

def _phase_b32_kernel(len_ref, prv_ref, x_ref, nxt_ref, scr_ref, st_ref):
    t = pl.program_id(0)
    base = t * TILE_B
    scratch, count_row, err = _tile_core32(
        prv_ref[...], x_ref[...], nxt_ref[...], base, len_ref[0], _proll,
    )
    scr_ref[...] = scratch
    _, lane = _iotas((8, PW))
    st_ref[...] = jnp.where(
        lane == 0, jnp.broadcast_to(count_row, (8, PW)), err
    )


def _phase_b32(x32, length, nt: int):
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
        _phase_b32_kernel,
        grid_spec=grid,
        out_shape=(
            sds(x32, (nt * PR, PW), jnp.int32),
            sds(x32, (nt * 8, PW), jnp.int32),
        ),
        interpret=_interpret(),
    )(jnp.asarray(length, jnp.int32).reshape(1), x32, x32, x32)


# --- phase C pallas_call (word granularity) --------------------------------

def _phase_c32_kernel(t0_ref, thi_ref, off_ref, s_ref, out_ref):
    # grid (j, m): out block revisited across m (VMEM-resident), scratch
    # is ONE input — the CAND-aliased form made XLA materialize CAND
    # copies of scratch whenever phase C sat inside a conditional branch
    # (kernels/butterfly._phase_c_kernel). Candidates past the tile's
    # actual span clamp to thi (fetch skipped, merge gated —
    # butterfly._phase_c_kernel's span clamp).
    j, m = pl.program_id(0), pl.program_id(1)
    base_w = j * CAPW
    row, lane = _iotas((PR, PW))
    p = base_w + row * PW + lane  # global output word index
    nt = off_ref.shape[0] - 1
    t = jnp.minimum(jnp.minimum(t0_ref[j] + m, thi_ref[j]), nt - 1)
    live = (m == 0) | (t0_ref[j] + m <= thi_ref[j])
    # dead out tiles (entirely past the total output) zero-store and
    # skip merges; index map pins their scratch fetch (butterfly.
    # _phase_c_kernel's dead-tile clamp, keyed on off[nt] = total)
    alive = base_w < off_ref[nt]

    def _merge(init: bool):
        # roll + mask + store inside the pl.when bodies so clamped
        # candidates cost nothing (butterfly._phase_c_kernel)
        o_start = off_ref[t]
        o_end = off_ref[t + 1]
        sh = (o_start - base_w) % CAPW
        rolled = _dyn_word_roll_right(s_ref[...], sh, _proll)
        in_w = (p >= o_start) & (p < o_end)
        if init:
            out_ref[...] = jnp.where(in_w, rolled, 0)
        else:
            out_ref[...] = jnp.where(in_w, rolled, out_ref[...])

    @pl.when((m == 0) & alive)
    def _init():
        _merge(True)

    @pl.when((m == 0) & ~alive)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when((m > 0) & live & alive)
    def _acc():
        _merge(False)


def _phase_c32(scratch, t0, off, nt: int):
    from .butterfly import _span_hi

    thi = _span_hi(off, nt, CAPW)
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nt, CAND),
        in_specs=[
            pl.BlockSpec(
                (PR, PW),
                lambda j, m, t0r, thir, offr: (
                    jnp.where(
                        j * CAPW < offr[offr.shape[0] - 1],
                        jnp.minimum(jnp.minimum(t0r[j] + m, thir[j]),
                                    nt - 1),
                        0),
                    0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (PR, PW), lambda j, m, t0r, thir, offr: (j, 0)),
    )
    return pl.pallas_call(
        _phase_c32_kernel,
        grid_spec=grid,
        out_shape=sds(scratch, (nt * PR, PW), jnp.int32),
        interpret=_interpret(),
    )(t0, thi, off, scratch)


# --- driver ----------------------------------------------------------------

def to_utf32_compose(b_u8: jnp.ndarray, length):
    """Valid-path butterfly transcode of a 1-D padded uint8 buffer whose
    size is a multiple of TILE_B. Returns (out u32[N], out_len, err_any):
    err_any=True means the caller must run its exact general engine."""
    n = b_u8.shape[0]
    assert n % TILE_B == 0, n
    nt = n // TILE_B
    x32 = b_u8.astype(jnp.int32).reshape(-1, PW)
    scratch, stats = _phase_b32(x32, length, nt)
    counts = stats[::8, 0]
    err_any = jnp.max(stats[::8, 1]) > 0
    err_any = err_any | (
        ((x32[0, 0] & 0xC0) == 0x80) & (jnp.asarray(length) > 0)
    )
    off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )
    total = off[nt]
    bases = jnp.arange(nt, dtype=jnp.int32) * CAPW
    t0 = (
        jnp.sum(off[None, :nt] <= bases[:, None], axis=1).astype(jnp.int32)
        - 1
    )
    out32 = _phase_c32(scratch, t0, off, nt)
    u32 = lax.bitcast_convert_type(
        out32.reshape(-1, 1), jnp.uint32
    ).reshape(-1)
    return u32, total, err_any
