"""Whitespace compaction for forgiving base64 decode with NO scatter and
NO gather: the butterfly (log-shift) concentration of kernels/butterfly.py
applied to the base64 char stream. Reference counterpart: compress_block +
the 6-block staging buffer of generic/base64.h:114-141, re-derived for a
VPU whose only cheap data movement is uniform rotation.

The XLA decode path (ops/base64_ops.decode_bulk) compacts valid chars with
a global cumsum + two scatters; in the recurrent scatter-serialized device
state those scatters cost ~7 ns/element. This kernel compacts the 6-bit
code stream per 32 KiB tile with 15 LSB-first butterfly rounds (4 phase
planes of an int32 lane, like kernels/butterfly.py, but with NO neighbor
logic — base64 classification is per-byte), packs the compacted codes
byte-wise into int32 words, and composes tiles with the byte-granularity
phase C of kernels/butterfly16 (identical geometry, reused directly).

Any invalid char anywhere -> err_any (the caller's exact XLA path then
produces first_bad and partial-decode semantics). All-whitespace regions
can make output segments empty, which would exceed phase C's static
candidate bound — the driver detects that (cand_ok=False) and the caller
falls back; realistic MIME wrapping (one newline per 76 chars) stays far
inside the bound."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .validate import _interpret, sds, u8_words
from .butterfly import (
    PR, PW, HR, TILE, _iotas, _groll_left, _flat_roll_left, _proll, _staged_moves,
)
from .butterfly16 import _phase_c16, CAND

STAGES = 15  # log2(TILE) candidate positions (4 planes x 8192 groups)
BIGPOS64 = TILE + 8  # no-invalid-char sentinel (tile-local positions)
BIG = 2**31 - 1


def _classify(b, url: bool, both: bool):
    """Range-compare classification (ops/base64_ops.classify_chars, the
    to_base64* tables of src/tables/base64_tables.h as compares): 0..63
    alphabet value, 64 whitespace, 255 invalid."""
    v = jnp.full_like(b, 255)
    v = jnp.where((b >= 65) & (b <= 90), b - 65, v)
    v = jnp.where((b >= 97) & (b <= 122), b - 71, v)
    v = jnp.where((b >= 48) & (b <= 57), b + 4, v)
    if both or not url:
        v = jnp.where(b == 43, 62, v)
        v = jnp.where(b == 47, 63, v)
    if both or url:
        v = jnp.where(b == 45, 62, v)
        v = jnp.where(b == 95, 63, v)
    for sp in (32, 9, 10, 13, 12):
        v = jnp.where(b == sp, 64, v)
    return v


def _tile_core64(x, base, length, url: bool, both: bool, roll):
    """x: (PR, PW) int32 tile (4 chars per lane). Returns (scratch
    (PR, PW) int32 byte-packed compacted codes, count_row, ek, prefix):
    ek = TILE-LOCAL position of the tile's first invalid char (BIGPOS64
    when none) and prefix = kept chars strictly before it — the exact
    in-kernel event discipline of kernels/butterfly.py, so the caller
    needs NO fallback engine for invalid input (the scatter fallback
    costs ~10x the fast path when taken; invalid chars must not pay it)."""
    row, lane = _iotas((PR, PW))
    gpos = row * PW + lane
    keeps, vals = [], []
    ek = jnp.int32(BIGPOS64)
    for m in range(4):
        b = (x >> (8 * m)) & 0xFF
        q = base + 4 * gpos + m
        in_r = (q >= 0) & (q < length)
        code = _classify(b, url, both)
        keeps.append((code <= 63) & in_r)
        vals.append(code)
        lpos = 4 * gpos + m
        ek = jnp.minimum(
            ek, jnp.min(jnp.where((code > 64) & in_r, lpos, BIGPOS64))
        )

    # tile-exclusive scan of keeps over flat byte order
    k32 = [k.astype(jnp.int32) for k in keeps]
    kg = k32[0] + k32[1] + k32[2] + k32[3]
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
    count_row = rinc[PR - 1 :, :]
    off_g = (rinc - row_tot) + (inc - kg)
    offs = [off_g]
    for m in range(3):
        offs.append(offs[-1] + k32[m])

    # packed words: code | displacement<<8 (disp < 2^15)
    words = []
    dmax = jnp.int32(0)
    for m in range(4):
        q = 4 * gpos + m
        disp = jnp.where(keeps[m], q - offs[m], 0)
        dmax = jnp.maximum(dmax, jnp.max(disp))
        words.append(jnp.where(keeps[m], vals[m], 0) | (disp << 8))

    # shared rounds (kernels/butterfly._staged_moves); with one \r\n per
    # 76 chars the max tile displacement is ~860, so stages 10-14 skip
    words = _staged_moves(words, dmax, STAGES, 8, roll)

    # kept chars strictly before the tile's first invalid char (exact
    # valid-prefix count, butterfly.py's discipline)
    prefix = jnp.int32(0)
    for m in range(4):
        prefix = prefix + jnp.sum(
            (keeps[m] & ((4 * gpos + m) < ek)).astype(jnp.int32))

    b = [wv & 0xFF for wv in words]
    scratch = b[0] | (b[1] << 8) | (b[2] << 16) | (b[3] << 24)
    return scratch, count_row, ek, prefix


def _phase_b64_kernel(len_ref, x_ref, scr_ref, st_ref, *, url, both):
    t = pl.program_id(0)
    scratch, count_row, ek, prefix = _tile_core64(
        x_ref[...], t * TILE, len_ref[0], url, both, _proll,
    )
    scr_ref[...] = scratch
    # stats lanes: 0 = kept count, 2 = first-invalid local pos (BIGPOS64
    # when none), 3 = kept chars before it; others = has-event flag
    _, lane = _iotas((8, PW))
    has = (ek < BIGPOS64).astype(jnp.int32)
    st = jnp.full((8, PW), has, jnp.int32)
    st = jnp.where(lane == 0, jnp.broadcast_to(count_row, (8, PW)), st)
    st = jnp.where(lane == 2, ek, st)
    st = jnp.where(lane == 3, prefix, st)
    st_ref[...] = st


def _phase_b64(x32, length, nt: int, url: bool, both: bool):
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[pl.BlockSpec((PR, PW), lambda t, L: (t, 0))],
        out_specs=(
            pl.BlockSpec((PR, PW), lambda t, L: (t, 0)),
            pl.BlockSpec((8, PW), lambda t, L: (t, 0)),
        ),
    )
    return pl.pallas_call(
        functools.partial(_phase_b64_kernel, url=url, both=both),
        grid_spec=grid,
        out_shape=(
            sds(x32, (nt * PR, PW), jnp.int32),
            sds(x32, (nt * 8, PW), jnp.int32),
        ),
        interpret=_interpret(),
    )(jnp.asarray(length, jnp.int32).reshape(1), x32)


def compact_codes(chars_u8: jnp.ndarray, length, url: bool, both: bool):
    """Compact the base64 code stream of a padded uint8 buffer whose size
    is a multiple of TILE. Returns (words (N/512, 128) int32 of dense
    byte-packed codes (code q at byte q%4 of flat word q//4; zero beyond
    nvalid), nvalid, first_bad, nvalid_at_bad, cand_ok, off):
    first_bad = global index of the first invalid char (BIG when none)
    and nvalid_at_bad = alphabet chars strictly before it — exact from
    in-kernel events, matching ops/base64_ops.decode_bulk's scatter
    semantics value-for-value. cand_ok=False = whitespace so dense that
    composition's segment bound would be exceeded (the caller's only
    remaining fallback reason); off = per-tile exclusive offsets.

    The dense stream stays in WORD form end to end: the caller feeds it
    straight to base64_kernel.pack_words — a u8 bitcast round-trip plus
    the (R,128)->(R,512) relayout it forced cost ~30 ms at the 64 MiB
    MIME corpus (perf_records/base64_probe.jsonl, VERDICT r04 #1)."""
    n = chars_u8.shape[0]
    assert n % TILE == 0, n
    nt = n // TILE
    x32 = u8_words(chars_u8)  # (nt*64, 128); no minor-4 array
    scratch, stats = _phase_b64(x32, length, nt, url, both)
    counts = stats[::8, 0]
    eks = stats[::8, 2]
    prefs = stats[::8, 3]
    off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )
    nvalid = off[nt]
    bases = jnp.arange(nt, dtype=jnp.int32) * TILE
    # exact first invalid char across tiles (tile events are disjoint and
    # increasing, butterfly.py's merge)
    has = eks < BIGPOS64
    gpos_t = bases + eks
    first_bad = jnp.min(jnp.where(has, gpos_t, BIG))
    first = has & (gpos_t == first_bad)
    nvalid_at_bad = jnp.sum(jnp.where(first, off[:nt] + prefs, 0))
    t0 = (
        jnp.sum(off[None, :nt] <= bases[:, None], axis=1).astype(jnp.int32)
        - 1
    )
    # windows must not span more than CAND segments (empty segments from
    # all-whitespace tiles could otherwise overflow the static unroll).
    # Only the window's overlap with [0, nvalid) matters: the padded tail
    # beyond ``length`` contributes a run of empty segments with
    # off == nvalid, which intersect nothing — counting them flagged
    # EVERY bench-scale MIME corpus as pathological and silently routed
    # it to the scatter fallback (0.09 GB/s shipped while the fast path
    # measured 0.91, 2026-08-20)
    hi = jnp.minimum(bases + TILE, nvalid)
    t_hi = jnp.sum(off[None, : nt + 1] < hi[:, None], axis=1)
    cand_ok = jnp.max(jnp.where(hi > bases, t_hi - t0, 0)) <= CAND
    words = _phase_c16(scratch, t0, off, nt, nvalid)
    return words, nvalid, first_bad, nvalid_at_bad, cand_ok, off
