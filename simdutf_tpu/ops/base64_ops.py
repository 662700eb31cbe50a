"""Base64 ops, XLA tier.

Decode bulk = 256-entry table gather (the to_base64 classification of
src/tables/base64_tables.h) + whitespace/garbage compaction by exclusive
prefix scan + 4->3 bit repack. The branchy tail (< 4 chars + padding
consistency, scalar/base64.h:133-216) stays on the host: it touches O(1)
data and the full options matrix.

Device outputs per call:
  first_bad   i32  — index of first invalid char (BIG when none)
  nvalid      i32  — number of alphabet chars
  nvalid_at_bad i32 — alphabet chars strictly before first_bad
  packed      u8[3*cap/4] — decoded bytes of whole 4-char groups
  tail_vals   u8[4]  — the last (nvalid % 4) sextets
  tail_start  i32  — source index of the first char of the partial chunk
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..golden import base64_impl as gb
from .common import BIG, excl_scan, positions, scatter_writes


_ALPHA_CACHE = None


def alphabet_for(options: int) -> jnp.ndarray:
    """Device-resident encode alphabet, cached (decode tables likewise)."""
    global _ALPHA_CACHE
    import numpy as np

    if _ALPHA_CACHE is None:
        _ALPHA_CACHE = {
            0: jnp.asarray(np.frombuffer(gb._STD, dtype=np.uint8)),
            1: jnp.asarray(np.frombuffer(gb._URL, dtype=np.uint8)),
        }
    return _ALPHA_CACHE[options & gb.BASE64_URL]


def classify_chars(c: jnp.ndarray, url: bool, both: bool) -> jnp.ndarray:
    """Range-compare classification (no table gather — per-element gathers
    over a 256-entry table vectorize poorly on TPU). Matches the
    to_base64* value tables (src/tables/base64_tables.h): 0..63 alphabet
    value, 64 ASCII space, 255 invalid."""
    v = jnp.full_like(c, 255)
    v = jnp.where((c >= 65) & (c <= 90), c - 65, v)  # A-Z
    v = jnp.where((c >= 97) & (c <= 122), c - 71, v)  # a-z
    v = jnp.where((c >= 48) & (c <= 57), c + 4, v)  # 0-9
    if both or not url:
        v = jnp.where(c == 43, 62, v)  # '+'
        v = jnp.where(c == 47, 63, v)  # '/'
    if both or url:
        v = jnp.where(c == 45, 62, v)  # '-'
        v = jnp.where(c == 95, 63, v)  # '_'
    for sp in (32, 9, 10, 13, 12):
        v = jnp.where(c == sp, 64, v)
    return v


def sextets_to_bytes(vals_u8: jnp.ndarray, n: int) -> jnp.ndarray:
    """u8[n] compacted sextet values (n % 4 == 0; zeros beyond the valid
    prefix) -> u8[3n/4] decoded bytes.

    Lane-major by construction: the 4 sextets of each group are bitcast
    into ONE int32 word and the 4->3 repack runs on (R, 512) word planes
    (kernels/base64_kernel.pack_sextets), so no (n/4, 4)-minor array is
    ever materialized at corpus scale. The round-3 minor-dim reshape
    padded 4-lane minors to 128 lanes — 1.00G unpadded -> 16.50G HLO
    temps, OOM on a 16G chip at a 64 MiB MIME input (VERDICT r03 #3,
    perf_records/20260819T092158Z/bench.stderr). Reference counterpart:
    the 64-char-block 4->3 bulk repack of src/generic/base64.h:43-246."""
    from jax import lax

    from ..kernels import base64_kernel as kb

    m = vals_u8.shape[0] // 4
    if m % 512 == 0:
        from ..kernels.validate import u8_words

        # (R, 512) i32 word rows without a minor-4 array (validate.py)
        w512 = u8_words(vals_u8).reshape(-1, 512)
        out32 = kb.pack_sextets(w512)
        return lax.bitcast_convert_type(
            out32.reshape(-1, 1), jnp.uint8).reshape(-1)
    # small/odd buckets (< 2 KiB of chars): the minor-dim form is fine
    # below corpus scale and keeps this helper shape-total
    q = vals_u8.astype(jnp.int32).reshape(-1, 4)
    t = (q[:, 0] << 18) | (q[:, 1] << 12) | (q[:, 2] << 6) | q[:, 3]
    packed = jnp.stack([(t >> 16) & 0xFF, (t >> 8) & 0xFF, t & 0xFF], axis=1)
    return packed.reshape(-1).astype(jnp.uint8)


def decode_bulk(chars: jnp.ndarray, length, url: bool, both: bool):
    """chars: padded uint8[N] (N % 4 == 0) or uint16 for char16 input."""
    n = chars.shape[0]
    idx = positions(n)
    in_r = idx < length
    if chars.dtype == jnp.uint16:
        c = chars.astype(jnp.int32)
        codes = jnp.where(c > 0xFF, 255, classify_chars(c & 0xFF, url, both))
    else:
        codes = classify_chars(chars.astype(jnp.int32), url, both)

    valid = (codes <= 63) & in_r
    invalid = (codes > 64) & in_r
    bad_positions = jnp.where(invalid, idx, BIG)
    first_bad = jnp.min(bad_positions)

    vmask = valid.astype(jnp.int32)
    rank, rank_inc = excl_scan(vmask, n)
    nvalid = rank_inc[n - 1]
    clamped_bad = jnp.minimum(first_bad, n - 1)
    nvalid_at_bad = jnp.where(first_bad == 0, 0, rank[clamped_bad])

    vals = scatter_writes(n, jnp.uint8, [(valid, rank, codes)])
    packed = sextets_to_bytes(vals, n)

    nfull = (nvalid // 4) * 4
    tail_vals = jnp.stack(
        [vals[jnp.minimum(nfull + i, n - 1)] for i in range(4)]
    )
    # source index of the rank-nfull kept char by masked min-reduce (the
    # round-3 form scattered a second full srcpos array just for this one
    # scalar — a whole extra serialized scatter in the degraded state)
    hit = valid & (rank == nfull)
    tail_start = jnp.where(
        nvalid > nfull, jnp.min(jnp.where(hit, idx, BIG)), length
    )
    return first_bad, nvalid, nvalid_at_bad, packed, tail_vals, tail_start


def decode_bulk_routed(chars: jnp.ndarray, length, url: bool, both: bool):
    """decode_bulk with the whitespace-compaction engine selected by a
    one-time measurement (ops/engine_probe.general_engine64): the scatter
    path, or the butterfly compaction kernel (kernels/butterfly64),
    bit-identical by construction. Invalid chars need NO fallback — the
    kernel computes exact (first_bad, nvalid_at_bad) events in-kernel
    (kernels/butterfly.py's discipline). The only lax.cond left guards
    pathologically dense whitespace (composition's segment bound,
    cand_ok); its untaken scatter branch costs nothing (measured
    const-false cond == fast path, 2026-08-20)."""
    from jax import lax

    from .engine_probe import general_engine64
    from ..kernels import butterfly64 as kb64

    n = chars.shape[0]
    if (chars.dtype == jnp.uint16 or n % kb64.TILE or n < kb64.TILE
            or general_engine64() != "butterfly"):
        return decode_bulk(chars, length, url, both)

    words, nvalid, first_bad, nvalid_at_ev, cand_ok, off = (
        kb64.compact_codes(chars, length, url, both))

    def fallback():
        return decode_bulk(chars, length, url, both)

    def fast():
        from jax import lax as _lax

        from ..kernels import base64_kernel as kb

        # the dense code stream never leaves word form: phase C16's
        # (R, 128) int32 words feed the roll-only pack_words kernel and
        # only the final byte stream is bitcast out. The prior u8 detour
        # (bitcast -> u8_words -> (R,512) reshape -> pack_sextets) cost
        # ~37 of the 75 ms routed total (perf_records/base64_probe.jsonl)
        packed = _lax.bitcast_convert_type(
            kb.pack_words(words).reshape(-1, 1), jnp.uint8).reshape(-1)
        nfull = (nvalid // 4) * 4
        # tail sextets nfull..nfull+3 are the 4 bytes of ONE dense word
        # (nfull % 4 == 0; zeros beyond nvalid by phase C's clamp) — one
        # scalar gather from a materialized pallas output instead of the
        # round-4 form's 4 dynamic gathers through the bitcast chain
        tw = words[(nfull // 4) // 128, (nfull // 4) % 128]
        tail_vals = jnp.stack(
            [((tw >> (8 * i)) & 0xFF).astype(jnp.uint8) for i in range(4)]
        )
        # tail_start = source index of the rank-nfull kept char: locate
        # its tile from the per-tile offsets, then rescan that one 32 KiB
        # window (the reference's rewind trick at tile scale,
        # generic/utf8_validation/utf8_validator.h:43-52)
        nt = off.shape[0] - 1
        t_star = jnp.clip(jnp.sum(off <= nfull) - 1, 0, nt - 1)
        win = lax.dynamic_slice(
            chars, (t_star * kb64.TILE,), (kb64.TILE,)).astype(jnp.int32)
        codes_w = classify_chars(win, url, both)
        wpos = t_star * kb64.TILE + positions(kb64.TILE)
        valid_w = (codes_w <= 63) & (wpos < length)
        rank_w = jnp.cumsum(valid_w.astype(jnp.int32)) - valid_w
        hit = valid_w & (rank_w == (nfull - off[t_star]))
        tail_start = jnp.where(
            nvalid > nfull,
            jnp.min(jnp.where(hit, wpos, BIG)),
            length,
        )
        # nvalid_at_bad must match the scatter engine BIT-exactly
        # (rank[clamped_bad]): alphabet chars strictly before first_bad
        # when one exists (the in-kernel event), else rank[n-1] = nvalid
        # minus the validity of the last in-range char (ADVICE r03 #3)
        lastv = classify_chars(
            chars[n - 1].astype(jnp.int32).reshape(1), url, both)[0]
        last_valid = (lastv <= 63) & ((n - 1) < length)
        nvalid_at_bad = jnp.where(
            first_bad < BIG, nvalid_at_ev,
            nvalid - last_valid.astype(jnp.int32))
        return (first_bad, nvalid, nvalid_at_bad,
                packed, tail_vals, tail_start)

    return lax.cond(cand_ok, fast, fallback)


def encode_small(data: jnp.ndarray, url: bool):
    """Minor-dim 3->4 encode for SMALL buffers and vmapped batch rows.
    The (N/3, 3)/(N/3, 4) arrays pad their minors to 128 lanes on TPU, so
    this form must never see corpus-scale input — encode_bulk routes
    1536-aligned buffers through the word-plane kernel instead."""
    from ..kernels import base64_kernel as kb

    n = data.shape[0]
    d = data.astype(jnp.int32).reshape(n // 3, 3)
    t = (d[:, 0] << 16) | (d[:, 1] << 8) | d[:, 2]
    quads = jnp.stack(
        [(t >> 18) & 63, (t >> 12) & 63, (t >> 6) & 63, t & 63], axis=1
    ).reshape(-1)
    # range-compare value->char map (no 64-entry table gather; identical
    # to the to_base64/url alphabets of src/tables/base64_tables.h)
    return kb._unclassify(quads, url).astype(jnp.uint8)


def encode_bulk(data: jnp.ndarray, url: bool):
    """data: padded uint8[N] with N % 3 == 0. Encodes whole 3-byte groups
    (the caller slices the valid prefix on the host and appends the
    <=2-byte tail + padding). Returns u8[4N/3].

    1536-aligned buffers (the impl tier pads to that multiple) run the
    word-plane 3->4 repack (kernels/base64_kernel.block_encode): bytes are
    bitcast into int32 words and repacked on (R, 384) planes, so no
    (N/3, k)-minor array is materialized at corpus scale (same HLO-padding
    hazard as the decode side, VERDICT r03 #3)."""
    from jax import lax

    from ..kernels import base64_kernel as kb

    n = data.shape[0]
    if n % 1536 == 0 and n > 0:
        w = lax.bitcast_convert_type(data.reshape(-1, 4), jnp.int32)
        chars32 = kb.block_encode(w.reshape(-1, 384), url)
        return lax.bitcast_convert_type(
            chars32.reshape(-1, 1), jnp.uint8).reshape(-1)
    return encode_small(data, url)
