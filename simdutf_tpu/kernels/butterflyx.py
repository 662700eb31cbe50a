"""The remaining variable-rate directions as butterfly (scatter/gather-
free) engines: UTF-32 -> UTF-8, UTF-32 -> UTF-16, UTF-16 -> UTF-32 and
Latin-1 -> UTF-8. Each is the kernels/butterfly machinery with a
direction-specific emission table; composition reuses the byte-granularity
phase C of kernels/butterfly16 and the word-granularity phase C of
kernels/butterfly32 (identical geometry). Reference counterparts: the
per-arch utf32/latin1 convert kernels (e.g.
src/westmere/sse_convert_utf32_to_utf8.cpp, scalar/latin1_to_utf8) —
re-derived for a VPU whose only cheap data movement is uniform rotation.

Shared layout: one input element per int32 lane, (PR, PW) = 8192 elements
per tile, SLOTS candidate output slots per element with prefix-closed
keeps, so every kept candidate's displacement d = SLOTS*g - off(g) is
monotone and the LSB-first butterfly compacts congestion-free. Any
invalid input flags err_any and the caller re-runs its exact scatter
engine (first-error positions, partial output)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .validate import _interpret, sds
from .butterfly import (PR, PW, HR, _iotas, _groll_left,
                        _flat_roll_left, _proll, _staged_moves)
from .butterfly16 import _phase_c16, _dyn_word_roll_right
from .butterfly32 import _phase_c32

TILE_E = PR * PW  # 8192 input elements per tile


# --- shared machinery -------------------------------------------------------

def _scan_keeps(keeps, roll):
    """Exclusive scan of per-element emission counts over flat element
    order. Returns (count_row (1, PW), off (PR, PW))."""
    row, lane = _iotas((PR, PW))
    eg = keeps[0].astype(jnp.int32)
    for k in keeps[1:]:
        eg = eg + k.astype(jnp.int32)
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
    return rinc[PR - 1 :, :], (rinc - row_tot) + (inc - eg)


def _compact(keeps, vals, off, val_bits: int, slots: int, roll):
    """LSB-first butterfly over the candidate stream c = slots*g + m.
    keeps/vals: per-slot (PR, PW) planes (keeps prefix-closed per
    element); off: per-element exclusive output offset. Returns the
    compacted plane words (val | residual-disp<<val_bits, disp == 0)."""
    row, lane = _iotas((PR, PW))
    gpos = row * PW + lane
    stages = (slots * TILE_E - 1).bit_length()
    words = []
    dmax = jnp.int32(0)
    for m in range(slots):
        if m < len(keeps):
            disp = jnp.where(keeps[m], slots * gpos - off, 0)
            dmax = jnp.maximum(dmax, jnp.max(disp))
            words.append(
                jnp.where(keeps[m], vals[m], 0) | (disp << val_bits))
        else:
            words.append(jnp.zeros((PR, PW), jnp.int32))
    # shared rounds (kernels/butterfly._staged_moves; no-op stages skip)
    return _staged_moves(words, dmax, stages, val_bits, roll)


def _pack_bytes4(words):
    b = [wv & 0xFF for wv in words]
    return b[0] | (b[1] << 8) | (b[2] << 16) | (b[3] << 24)


def _stats_block(count_row, err):
    _, lane = _iotas((8, PW))
    return jnp.where(lane == 0, jnp.broadcast_to(count_row, (8, PW)), err)


def _run_phase_b(kernel, x32, length, nt: int, halo: bool):
    """pallas_call driver shared by all phase Bs. halo=True passes ±1-tile
    8-row halos as CLAMPED edge blocks of the unpadded buffer (their
    out-of-range contents are masked by global position in every core,
    so no zero-pad copy is needed)."""
    if halo:
        in_specs = [
            pl.BlockSpec(
                (HR, PW), lambda t, L: (jnp.maximum(8 * t - 1, 0), 0)),
            pl.BlockSpec((PR, PW), lambda t, L: (t, 0)),
            pl.BlockSpec(
                (HR, PW),
                lambda t, L: (jnp.minimum(8 * (t + 1), 8 * nt - 1), 0)),
        ]
    else:
        in_specs = [pl.BlockSpec((PR, PW), lambda t, L: (t, 0))]
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((PR, PW), lambda t, L: (t, 0)),
            pl.BlockSpec((8, PW), lambda t, L: (t, 0)),
        ),
    )
    args = (jnp.asarray(length, jnp.int32).reshape(1), x32)
    if halo:
        args = args + (x32, x32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid,
        out_shape=(
            sds(x32, (nt * PR, PW), jnp.int32),
            sds(x32, (nt * 8, PW), jnp.int32),
        ),
        interpret=_interpret(),
    )(*args)


def _offsets(stats, nt: int, cap: int):
    counts = stats[::8, 0]
    err_any = jnp.max(stats[::8, 1]) > 0
    off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )
    bases = jnp.arange(nt, dtype=jnp.int32) * cap
    t0 = (
        jnp.sum(off[None, :nt] <= bases[:, None], axis=1).astype(jnp.int32)
        - 1
    )
    return off, t0, off[nt], err_any


# --- UTF-32 -> UTF-8 ---------------------------------------------------------

def _core_u32_to_u8(x, base, length, roll):
    row, lane = _iotas((PR, PW))
    q = base + row * PW + lane
    in_r = (q >= 0) & (q < length)
    # unsigned-safe range checks on int32: values >= 2^31 appear negative
    w = jnp.where(in_r, x, 0)
    neg = w < 0
    too_large = (neg | (w > 0x10FFFF)) & in_r
    sur = (w >= 0xD800) & (w <= 0xDFFF) & in_r
    err_any = jnp.max((too_large | sur).astype(jnp.int32))
    cp = jnp.where(too_large, 0, w)

    e1 = in_r & (cp < 0x80)
    e2 = in_r & (cp >= 0x80) & (cp < 0x800)
    e3 = in_r & (cp >= 0x800) & (cp <= 0xFFFF)
    e4 = in_r & (cp > 0xFFFF)
    v0 = jnp.where(e1, cp, 0)
    v0 = jnp.where(e2, 0xC0 | (cp >> 6), v0)
    v0 = jnp.where(e3, 0xE0 | (cp >> 12), v0)
    v0 = jnp.where(e4, 0xF0 | (cp >> 18), v0)
    v1 = jnp.where(e2, 0x80 | (cp & 0x3F), 0)
    v1 = jnp.where(e3, 0x80 | ((cp >> 6) & 0x3F), v1)
    v1 = jnp.where(e4, 0x80 | ((cp >> 12) & 0x3F), v1)
    v2 = jnp.where(e3, 0x80 | (cp & 0x3F), 0)
    v2 = jnp.where(e4, 0x80 | ((cp >> 6) & 0x3F), v2)
    v3 = 0x80 | (cp & 0x3F)
    keeps = [in_r, in_r & ~e1, e3 | e4, e4]
    vals = [v0, v1, v2, v3]
    count_row, off = _scan_keeps(keeps, roll)
    words = _compact(keeps, vals, off, 8, 4, roll)
    return _pack_bytes4(words), count_row, err_any


def _kernel_u32_to_u8(len_ref, x_ref, scr_ref, st_ref):
    t = pl.program_id(0)
    scratch, count_row, err = _core_u32_to_u8(
        x_ref[...], t * TILE_E, len_ref[0], _proll)
    scr_ref[...] = scratch
    st_ref[...] = _stats_block(count_row, err)


def u32_to_utf8_compose(w_u32: jnp.ndarray, length):
    """(out u8[4N], out_len, err_any) for a padded native-order uint32
    buffer with N % TILE_E == 0."""
    n = w_u32.shape[0]
    assert n % TILE_E == 0, n
    nt = n // TILE_E
    x32 = lax.bitcast_convert_type(
        w_u32.astype(jnp.uint32).reshape(-1, 1), jnp.int32
    ).reshape(-1, PW)
    scratch, stats = _run_phase_b(_kernel_u32_to_u8, x32, length, nt, False)
    off, t0, total, err_any = _offsets(stats, nt, 4 * TILE_E)
    out32 = _phase_c16(scratch, t0, off, nt, total)
    u8 = lax.bitcast_convert_type(
        out32.reshape(-1, 1), jnp.uint8).reshape(-1)
    return u8, total, err_any


# --- UTF-32 -> UTF-16 --------------------------------------------------------

def _core_u32_to_u16(x, base, length, big_endian, roll):
    row, lane = _iotas((PR, PW))
    q = base + row * PW + lane
    in_r = (q >= 0) & (q < length)
    w = jnp.where(in_r, x, 0)
    neg = w < 0
    too_large = (neg | (w > 0x10FFFF)) & in_r
    sur = (w >= 0xD800) & (w <= 0xDFFF) & in_r
    err_any = jnp.max((too_large | sur).astype(jnp.int32))
    cp = jnp.where(too_large, 0, w)
    is4 = in_r & (cp > 0xFFFF)
    cpx = cp - 0x10000
    unit0 = jnp.where(is4, 0xD800 + (cpx >> 10), cp)
    unit1 = 0xDC00 + (cpx & 0x3FF)

    def bswap(u):
        return ((u << 8) | (u >> 8)) & 0xFFFF if big_endian else u

    keeps = [in_r, is4]
    vals = [bswap(unit0) & 0xFFFF, bswap(unit1) & 0xFFFF]
    count_row, off = _scan_keeps(keeps, roll)
    words = _compact(keeps, vals, off, 16, 2, roll)
    scratch = (words[0] & 0xFFFF) | ((words[1] & 0xFFFF) << 16)
    return scratch, count_row, err_any


def _kernel_u32_to_u16(len_ref, x_ref, scr_ref, st_ref, *, big_endian):
    t = pl.program_id(0)
    scratch, count_row, err = _core_u32_to_u16(
        x_ref[...], t * TILE_E, len_ref[0], big_endian, _proll)
    scr_ref[...] = scratch
    st_ref[...] = _stats_block(count_row, err)


def _phase_c_u16(scratch, t0, off, nt: int):
    """Composition at u16-unit granularity on (PR, PW) int32 pair tiles
    (unit 2p | 2p+1 per word), CAP = 2 * TILE_E units per tile."""
    CAPU = 2 * TILE_E
    CANDS = 5
    from .butterfly import _span_hi

    thi = _span_hi(off, nt, CAPU)

    def kernel(t0_ref, thi_ref, off_ref, s_ref, out_ref):
        # grid (j, m): out block revisited across m; scratch is ONE input
        # (kernels/butterfly._phase_c_kernel's accumulation idiom, incl.
        # its span clamp: candidates past thi skip fetch and merge)
        j, m = pl.program_id(0), pl.program_id(1)
        base_u = j * CAPU
        row, lane = _iotas((PR, PW))
        p = row * PW + lane
        u_lo = base_u + 2 * p
        ntt = off_ref.shape[0] - 1
        t = jnp.minimum(jnp.minimum(t0_ref[j] + m, thi_ref[j]), ntt - 1)
        live = (m == 0) | (t0_ref[j] + m <= thi_ref[j])
        # dead out tiles zero-store and skip merges (butterfly.
        # _phase_c_kernel's dead-tile clamp, keyed on off[nt] = total)
        alive = base_u < off_ref[ntt]

        def _merge(init: bool):
            # roll + mask + store inside the pl.when bodies so clamped
            # candidates cost nothing (butterfly._phase_c_kernel)
            o_start = off_ref[t]
            o_end = off_ref[t + 1]
            sh_units = (o_start - base_u) % CAPU
            w = s_ref[...]
            wprev = _dyn_word_roll_right(w, jnp.int32(1), _proll)
            w_odd = (w << 16) | ((wprev >> 16) & 0xFFFF)
            wbase = jnp.where((sh_units & 1) != 0, w_odd, w)
            rolled = _dyn_word_roll_right(wbase, sh_units // 2, _proll)
            in_lo = (u_lo >= o_start) & (u_lo < o_end)
            in_hi = (u_lo + 1 >= o_start) & (u_lo + 1 < o_end)
            mask = (jnp.where(in_lo, 0xFFFF, 0)
                    | jnp.where(in_hi, jnp.int32(-65536), 0))
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

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nt, CANDS),
        in_specs=[
            pl.BlockSpec(
                (PR, PW),
                lambda j, m, t0r, thir, offr: (
                    jnp.where(
                        j * CAPU < offr[offr.shape[0] - 1],
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
        kernel,
        grid_spec=grid,
        out_shape=sds(scratch, (nt * PR, PW), jnp.int32),
        interpret=_interpret(),
    )(t0, thi, off, scratch)


def u32_to_utf16_compose(w_u32: jnp.ndarray, length, big_endian: bool):
    """(out u16[2N], out_len, err_any) for a padded native-order uint32
    buffer with N % TILE_E == 0."""
    n = w_u32.shape[0]
    assert n % TILE_E == 0, n
    nt = n // TILE_E
    x32 = lax.bitcast_convert_type(
        w_u32.astype(jnp.uint32).reshape(-1, 1), jnp.int32
    ).reshape(-1, PW)
    scratch, stats = _run_phase_b(
        functools.partial(_kernel_u32_to_u16, big_endian=big_endian),
        x32, length, nt, False)
    off, t0, total, err_any = _offsets(stats, nt, 2 * TILE_E)
    out32 = _phase_c_u16(scratch, t0, off, nt)
    u16 = lax.bitcast_convert_type(
        out32.reshape(-1, 1), jnp.uint16).reshape(-1)
    return u16, total, err_any


# --- UTF-16 -> UTF-32 --------------------------------------------------------

def _core_u16_to_u32(prv, x, nxt, base, length, roll):
    ext = jnp.concatenate([prv, x, nxt], axis=0)
    RE = ext.shape[0]
    row_e, lane_e = _iotas((RE, PW))
    q_e = base + (row_e - HR) * PW + lane_e
    in_r_e = (q_e >= 0) & (q_e < length)
    w_e = jnp.where(in_r_e, ext & 0xFFFF, 0)

    def sl_main(a):
        return a[HR : HR + PR]

    def g_shift_left(a):
        z1 = roll(a, PW - 1, 1)
        z2 = roll(z1, RE - 1, 0)
        _, lane = _iotas(a.shape)
        return jnp.where(lane < PW - 1, z1, z2)

    def g_shift_right(a):
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
    err_any = jnp.max(
        ((is_hi & ~nxt_lo) | (is_lo & ~prv_hi)).astype(jnp.int32))

    cp = jnp.where(
        is_hi, 0x10000 + ((w & 0x3FF) << 10) + (nxt_w & 0x3FF), w)
    keep = in_r & ~is_lo
    keeps = [keep, keep]
    vals = [cp & 0xFFFF, (cp >> 16) & 0x1F]
    count_row, off2 = _scan_keeps([keep], roll)
    # off2 counts codepoints; candidate offset doubles it
    words = _compact(keeps, vals, 2 * off2, 16, 2, roll)
    scratch = (words[0] & 0xFFFF) | ((words[1] & 0xFFFF) << 16)
    return scratch, count_row, err_any


def _kernel_u16_to_u32(len_ref, prv_ref, x_ref, nxt_ref, scr_ref, st_ref):
    t = pl.program_id(0)
    scratch, count_row, err = _core_u16_to_u32(
        prv_ref[...], x_ref[...], nxt_ref[...], t * TILE_E, len_ref[0],
        _proll)
    scr_ref[...] = scratch
    st_ref[...] = _stats_block(count_row, err)


def u16_to_utf32_compose(w_u16: jnp.ndarray, length):
    """(out u32[N], out_len, err_any) for a padded native-order uint16
    buffer with N % TILE_E == 0."""
    n = w_u16.shape[0]
    assert n % TILE_E == 0, n
    nt = n // TILE_E
    x32 = w_u16.astype(jnp.int32).reshape(-1, PW)
    scratch, stats = _run_phase_b(_kernel_u16_to_u32, x32, length, nt, True)
    off, t0, total, err_any = _offsets(stats, nt, TILE_E)
    out32 = _phase_c32(scratch, t0, off, nt)
    u32 = lax.bitcast_convert_type(
        out32.reshape(-1, 1), jnp.uint32).reshape(-1)
    return u32, total, err_any


# --- Latin-1 -> UTF-8 --------------------------------------------------------

def _core_l1_to_u8(x, base, length, roll):
    row, lane = _iotas((PR, PW))
    q = base + row * PW + lane
    in_r = (q >= 0) & (q < length)
    b = jnp.where(in_r, x & 0xFF, 0)
    hi = in_r & (b >= 0x80)
    v0 = jnp.where(hi, 0xC0 | (b >> 6), b)
    v1 = 0x80 | (b & 0x3F)
    keeps = [in_r, hi]
    vals = [v0, v1]
    count_row, off = _scan_keeps(keeps, roll)
    words = _compact(keeps, vals, off, 8, 4, roll)
    return _pack_bytes4(words), count_row, jnp.int32(0)


def _kernel_l1_to_u8(len_ref, x_ref, scr_ref, st_ref):
    t = pl.program_id(0)
    scratch, count_row, err = _core_l1_to_u8(
        x_ref[...], t * TILE_E, len_ref[0], _proll)
    scr_ref[...] = scratch
    st_ref[...] = _stats_block(count_row, err)


def latin1_to_utf8_compose(b_u8: jnp.ndarray, length):
    """(out u8[2N], out_len) for a padded uint8 buffer with
    N % TILE_E == 0. Latin-1 input is always valid — no error lattice."""
    n = b_u8.shape[0]
    assert n % TILE_E == 0, n
    nt = n // TILE_E
    x32 = b_u8.astype(jnp.int32).reshape(-1, PW)
    scratch, stats = _run_phase_b(_kernel_l1_to_u8, x32, length, nt, False)
    off, t0, total, _ = _offsets(stats, nt, 4 * TILE_E)
    out32 = _phase_c16(scratch, t0, off, nt, total)
    u8 = lax.bitcast_convert_type(
        out32.reshape(-1, 1), jnp.uint8).reshape(-1)[: 2 * n]
    return u8, total
