"""Pallas base64 kernels: clean-input block decode / encode.

The reference's hot base64 loop (generic/base64.h:43-246 + per-arch
block64 kernels like src/haswell/avx2_base64.cpp) decodes 64-char blocks
with a whitespace-compaction escape hatch. On TPU the winning split is the
same one at corpus scale: whitespace-free input (the overwhelmingly common
case — data URIs, JSON payloads, wire protocols) is a FIXED-RATE 4->3
repack, which needs no compaction at all; anything else falls back to the
XLA forgiving path.

The repack avoids dynamic gathers and rolls entirely via phase planes:
a (R, 512)->(R, 128, 4) minor-dim reshape exposes the stride-4 subsamples
P[..., i] (= every 4th char word), and each output word is a fixed byte
mix of phase planes at the SAME lane:

    out words 3s, 3s+1, 3s+2 are built from the decoded byte planes
    B0/B1/B2 of char words 4s..4s+3 — all phase-plane lookups at lane s.

Classification is pure range compares (no 256-entry table gather),
matching the repo-wide north star. A (1,1) SMEM flag records "saw
whitespace/garbage/invalid"; the caller falls back when it fires.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .validate import (_interpret, pallas_lowers, sds, vany, xla_driver)

RB = 16  # rows per tile: (16, 512) int32 = 32 KiB of chars


def _classify(c, url: bool, both: bool):
    """Char byte -> 6-bit value; 255 = not a base64 char (whitespace,
    garbage, padding — all routes to fallback). Range compares only
    (ops/base64_ops.py:57-74 shares the formulation)."""
    v = jnp.full_like(c, 255)
    v = jnp.where((c >= 65) & (c <= 90), c - 65, v)
    v = jnp.where((c >= 97) & (c <= 122), c - 71, v)
    v = jnp.where((c >= 48) & (c <= 57), c + 4, v)
    if both or not url:
        v = jnp.where(c == 43, 62, v)
        v = jnp.where(c == 47, 63, v)
    if both or url:
        v = jnp.where(c == 45, 62, v)
        v = jnp.where(c == 95, 63, v)
    return v


def _mix_planes(b0, b1, b2):
    """Byte planes (R, 512) of per-word 24-bit triples -> (R, 384) int32
    output words (little-endian byte stream). Every lookup is a
    phase-plane subsample at the SAME lane; the stride-4 minor reshape is
    VMEM-local in the pallas tier and fused by XLA in the driver tier."""
    R = b0.shape[0]
    P0 = b0.reshape(R, 128, 4)
    P1 = b1.reshape(R, 128, 4)
    P2 = b2.reshape(R, 128, 4)
    out0 = P0[..., 0] | (P1[..., 0] << 8) | (P2[..., 0] << 16) | (P0[..., 1] << 24)
    out1 = P1[..., 1] | (P2[..., 1] << 8) | (P0[..., 2] << 16) | (P1[..., 2] << 24)
    out2 = P2[..., 2] | (P0[..., 3] << 8) | (P1[..., 3] << 16) | (P2[..., 3] << 24)
    return jnp.stack([out0, out1, out2], axis=-1).reshape(R, 384)


def _decode_core(x, i, n, url: bool, both: bool):
    R = x.shape[0]
    # words beyond the logical length decode as 'AAAA' (zeros, no flag)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    widx = (i * R + row) * 512 + lane
    x = jnp.where(widx < n, x, 0x41414141)
    lu = jnp.uint32
    c0 = x & 0xFF
    c1 = (x.astype(lu) >> 8).astype(jnp.int32) & 0xFF
    c2 = (x.astype(lu) >> 16).astype(jnp.int32) & 0xFF
    c3 = (x.astype(lu) >> 24).astype(jnp.int32) & 0xFF
    v0 = _classify(c0, url, both)
    v1 = _classify(c1, url, both)
    v2 = _classify(c2, url, both)
    v3 = _classify(c3, url, both)
    notclean = vany((v0 | v1 | v2 | v3) > 63)
    t = (v0 << 18) | (v1 << 12) | (v2 << 6) | v3
    return _mix_planes((t >> 16) & 0xFF, (t >> 8) & 0xFF, t & 0xFF), notclean


def _decode_kernel(n_ref, x_ref, o_ref, f_ref, *, url: bool, both: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        f_ref[0, 0] = 0

    out, notclean = _decode_core(x_ref[...], i, n_ref[0], url, both)

    @pl.when(notclean)
    def _flag():
        f_ref[0, 0] = 1

    o_ref[...] = out


def clean_decode(x32: jnp.ndarray, nwords, url: bool = False,
                 both: bool = False):
    """x32: (R, 512) int32 view of the padded char buffer (R % RB == 0);
    ``nwords`` = number of logical 4-char words (the caller slices to full
    quads). Padding words decode as zeros without raising the flag.

    Returns (out (R, 384) int32 = decoded byte stream, flag)."""
    if not pallas_lowers(
        "b64_clean_decode",
        lambda: _clean_decode_pallas(jnp.zeros((RB, 512), jnp.int32), 0),
    ):
        return xla_driver(_decode_core, x32, nwords, url, both)
    return _clean_decode_pallas(x32, nwords, url, both)


@functools.partial(jax.jit, static_argnames=("url", "both"))
def _clean_decode_pallas(x32: jnp.ndarray, nwords, url: bool = False,
                         both: bool = False):
    grid = x32.shape[0] // RB
    out, flag = pl.pallas_call(
        functools.partial(_decode_kernel, url=url, both=both),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((RB, 512), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((RB, 384), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            sds(x32, (x32.shape[0], 384), jnp.int32),
            sds(x32, (1, 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(jnp.reshape(jnp.asarray(nwords, jnp.int32), (1,)), x32)
    return out, flag[0, 0]


def _pack_core(w):
    """w: (R, 512) int32 of sextet-VALUE words (4 compacted 6-bit values
    per word, little-endian). Returns (R, 384) int32 packed output bytes.
    This is _decode_core minus classification: the bulk decode paths
    (scatter-compacted or butterfly-compacted streams) already hold
    values, and packing them through value WORDS instead of an
    (n/4, 4)-minor array is what keeps HLO temps at ~1x input — the
    round-3 minor-dim form padded 4 lanes to 128 (1.00G -> 16.50G temps,
    OOM at a 64 MiB MIME corpus; VERDICT r03 #3)."""
    lu = jnp.uint32
    v0 = w & 0xFF
    v1 = (w.astype(lu) >> 8).astype(jnp.int32) & 0xFF
    v2 = (w.astype(lu) >> 16).astype(jnp.int32) & 0xFF
    v3 = (w.astype(lu) >> 24).astype(jnp.int32) & 0xFF
    t = (v0 << 18) | (v1 << 12) | (v2 << 6) | v3
    return _mix_planes((t >> 16) & 0xFF, (t >> 8) & 0xFF, t & 0xFF)


def _pack_kernel(x_ref, o_ref):
    o_ref[...] = _pack_core(x_ref[...])


@functools.cache
def _pack_xla():
    return jax.jit(_pack_core)


def pack_sextets(w32: jnp.ndarray) -> jnp.ndarray:
    """(R, 512) int32 sextet-value words -> (R, 384) int32 byte words
    (4->3 fixed-rate repack of already-compacted 6-bit values). Pallas
    when the toolchain lowers its casts (own-kernel probe) and
    R % RB == 0; the bit-identical XLA driver otherwise."""
    if w32.shape[0] % RB or not pallas_lowers(
        "b64_pack_sextets",
        lambda: _pack_sextets_pallas(jnp.zeros((RB, 512), jnp.int32)),
    ):
        return _pack_xla()(w32)
    return _pack_sextets_pallas(w32)


@jax.jit
def _pack_sextets_pallas(w32: jnp.ndarray):
    grid = w32.shape[0] // RB
    return pl.pallas_call(
        _pack_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((RB, 512), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((RB, 384), lambda i: (i, 0)),
        out_shape=sds(w32, (w32.shape[0], 384), jnp.int32),
        interpret=_interpret(),
    )(w32)


# --- dense 4->3 word repack (no reshape, no minor-dim arrays) -----------
#
# sextets_to_bytes' word-plane form (pack_sextets) is bit-correct but its
# (R, 512) geometry needs a minor-dim reshape, which this toolchain's
# Mosaic cannot lower (lane shapecast) — so it ran the XLA driver, and the
# (R,128)->(R,512) relayout + u8 round-trip around it cost ~30 ms at the
# 64 MiB MIME corpus (perf_records/base64_probe.jsonl, 2026-08-20: repack
# 36.9 ms of the 75 ms routed total; VERDICT r04 #1). pack_words repacks
# the (R, 128) int32 word stream phase C16 already produces DIRECTLY:
# per (64, 128) block, 4 sextet-words (16 values) become 3 byte-words (12
# bytes) with rolls + selects only —
#   1. per word: 24-bit payload y; mix with the next word's payload into
#      the three output-word candidates A0/A1/A2 (out word 3s+d needs
#      words 4s+d and 4s+d+1), selected per lane by lane%4;
#   2. lane compaction: candidate at lane i moves left by i//4 (monotone;
#      5 LSB-first butterfly rounds with a carried displacement plane —
#      butterfly._staged_moves' discipline with static initial disps);
#   3. per-row roll by (96*(r%4)) % 128 aligns each row's 96 valid words
#      to their final lane phase, a threshold select pairs rows (out row
#      3t+f spans input rows 4t+f, 4t+f+1), and a 4-round row butterfly
#      (row a moves up a//4) compacts 64 rows to 48.
# Reference counterpart: the 64-char-block 4->3 repack of
# src/generic/base64.h:43-246, re-derived for roll-only data movement.

def _pack_words_core(ext, roll):
    """ext: (RE, 128) int32 sextet-value words, RE = R + 8 (the trailing 8
    rows are the next block's first rows; only their first row's lane 0
    can be consumed, via the next-word payload of the block's last word).
    Returns (3R/4, 128) int32 packed output words."""
    RE = ext.shape[0]
    R = RE - 8
    w = ext
    v0 = w & 0xFF
    v1 = (w >> 8) & 0xFF
    v2 = (w >> 16) & 0xFF
    v3 = (w >> 24) & 0xFF  # sextet values < 64: sign bit never set
    t = (v0 << 18) | (v1 << 12) | (v2 << 6) | v3
    y = ((t >> 16) & 0xFF) | (((t >> 8) & 0xFF) << 8) | ((t & 0xFF) << 16)
    y1 = _groll_left_b64(y, 1, roll)  # payload of the next flat word
    row, lane = _iotas_b64((RE, 128))
    A0 = y | (y1 << 24)
    A1 = (y >> 8) | (y1 << 16)
    A2 = (y >> 16) | (y1 << 8)
    lm = lane & 3
    C = jnp.where(lm == 0, A0, jnp.where(lm == 1, A1, A2))
    # lane compaction: candidate at lane i (i%4 < 3) moves left by i//4;
    # i%4 == 3 lanes are dropped (disp 0, overwritten — butterfly.py's
    # non-kept pinning). Wrapped reads only land at lanes >= 112, beyond
    # the 96 valid output lanes.
    disp = jnp.where(lm < 3, lane >> 2, 0)
    for st in range(5):
        s = 1 << st
        mc = roll(C, 128 - s, 1)
        md = roll(disp, 128 - s, 1)
        take = (md & s) != 0
        C = jnp.where(take, mc, C)
        disp = jnp.where(take, md - s, disp)
    # row r's 96 words start at flat word 96r -> lane phase (96r) % 128 =
    # {0, 96, 64, 32} by r % 4 (the 384t term vanishes mod 128)
    rm = row & 3
    C = jnp.where(rm == 1, roll(C, 96, 1), C)
    C = jnp.where(rm == 2, roll(C, 64, 1), C)
    C = jnp.where(rm == 3, roll(C, 32, 1), C)
    # out row 3t+f = input rows 4t+f (below the lane threshold) and
    # 4t+f+1 (above); thresholds {96, 64, 32} for f = {0, 1, 2}
    Cn = roll(C, RE - 1, 0)
    thresh = jnp.where(rm == 0, 96, jnp.where(rm == 1, 64, 32))
    V = jnp.where(lane < thresh, C, Cn)
    # row compaction: row a moves up by a//4 (a%4 == 3 dropped); halo
    # rows would need a move of 16+, outside the 4 stages, so they stay
    # put and are sliced away
    dr = jnp.where(rm < 3, row >> 2, 0)
    for st in range(4):
        s = 1 << st
        mv = roll(V, RE - s, 0)
        mdr = roll(dr, RE - s, 0)
        take = (mdr & s) != 0
        V = jnp.where(take, mv, V)
        dr = jnp.where(take, mdr - s, dr)
    return V[: (R // 4) * 3]


def _groll_left_b64(a, k: int, roll):
    """Flat roll left by k over (R, 128) in row-major order (the
    butterfly._groll_left construction; duplicated to keep this module
    free of a circular import)."""
    R = a.shape[0]
    z1 = roll(a, 128 - k, 1)
    z2 = roll(z1, R - 1, 0)
    _, lane = _iotas_b64(a.shape)
    return jnp.where(lane < 128 - k, z1, z2)


def _iotas_b64(shape):
    return (jax.lax.broadcasted_iota(jnp.int32, shape, 0),
            jax.lax.broadcasted_iota(jnp.int32, shape, 1))


PWR = 64  # rows per pack_words block: (64, 128) int32 = 32 KiB of codes


def _pack_words_kernel(x_ref, nxt_ref, o_ref):
    ext = jnp.concatenate([x_ref[...], nxt_ref[...]], axis=0)
    o_ref[...] = _pack_words_core(ext, lambda a, s, ax: pltpu.roll(a, s, ax))


@jax.jit
def _pack_words_pallas(w128: jnp.ndarray):
    nt = w128.shape[0] // PWR
    return pl.pallas_call(
        _pack_words_kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((PWR, 128), lambda t: (t, 0)),
            pl.BlockSpec(
                (8, 128),
                lambda t: (jnp.minimum(8 * (t + 1), 8 * nt - 1), 0)),
        ],
        out_specs=pl.BlockSpec((PWR * 3 // 4, 128), lambda t: (t, 0)),
        out_shape=sds(w128, (w128.shape[0] * 3 // 4, 128), jnp.int32),
        interpret=_interpret(),
    )(w128, w128)


@functools.cache
def _pack_words_xla():
    def f(w128):
        nt = w128.shape[0] // PWR
        blocks = w128.reshape(nt, PWR, 128)
        halo = jnp.concatenate(
            [blocks[1:, :8], blocks[-1:, :8]], axis=0)
        ext = jnp.concatenate([blocks, halo], axis=1)  # (nt, 72, 128)
        out = jax.vmap(
            lambda e: _pack_words_core(e, jnp.roll))(ext)
        return out.reshape(nt * (PWR * 3 // 4), 128)
    return jax.jit(f)


def pack_words(w128: jnp.ndarray) -> jnp.ndarray:
    """(R, 128) int32 sextet-value words (R % 64 == 0) -> (3R/4, 128)
    int32 packed byte words — the fixed-rate 4->3 repack with no reshape
    and no minor-dim array anywhere. The kernel is rolls + selects +
    integer ops only (no lane shapecast, unlike pack_sextets), the same
    primitive class as the butterfly engines, so it runs the pallas path
    unguarded like they do (the pallas_lowers tunnel gate exists for
    shapecast kernels; measured 11.5 ms vs the 36.9 ms reshape detour at
    the 64 MiB MIME corpus, perf_records/base64_probe.jsonl). The
    vmapped XLA driver covers non-block-aligned shapes."""
    if w128.shape[0] % PWR:
        return _pack_words_xla()(w128)
    return _pack_words_pallas(w128)


def _unclassify(v, url: bool):
    """6-bit value -> char byte (inverse range mapping, no table)."""
    c = v + 65
    c = jnp.where(v >= 26, v + 71, c)
    c = jnp.where(v >= 52, v - 4, c)
    c = jnp.where(v == 62, 45 if url else 43, c)
    c = jnp.where(v == 63, 95 if url else 47, c)
    return c


def _encode_core(x, url: bool):
    R = x.shape[0]
    lu = jnp.uint32
    I = x.reshape(R, 128, 3)
    w0, w1, w2 = I[..., 0], I[..., 1], I[..., 2]

    def byte(w, k):
        return (w.astype(lu) >> (8 * k)).astype(jnp.int32) & 0xFF

    # triples 4s..4s+3 from words 3s..3s+2 (bytes in stream order)
    t0 = (byte(w0, 0) << 16) | (byte(w0, 1) << 8) | byte(w0, 2)
    t1 = (byte(w0, 3) << 16) | (byte(w1, 0) << 8) | byte(w1, 1)
    t2 = (byte(w1, 2) << 16) | (byte(w1, 3) << 8) | byte(w2, 0)
    t3 = (byte(w2, 1) << 16) | (byte(w2, 2) << 8) | byte(w2, 3)

    def chars(t):
        c0 = _unclassify((t >> 18) & 63, url)
        c1 = _unclassify((t >> 12) & 63, url)
        c2 = _unclassify((t >> 6) & 63, url)
        c3 = _unclassify(t & 63, url)
        return c0 | (c1 << 8) | (c2 << 16) | (c3 << 24)

    return jnp.stack(
        [chars(t0), chars(t1), chars(t2), chars(t3)], axis=-1
    ).reshape(R, 512)


def _encode_kernel(x_ref, o_ref, *, url: bool):
    o_ref[...] = _encode_core(x_ref[...], url)


@functools.cache
def _encode_xla(url: bool):
    return jax.jit(lambda x: _encode_core(x, url))


def block_encode(x32: jnp.ndarray, url: bool = False):
    """x32: (R, 384) int32 view of the padded payload (the caller slices
    to whole 3-byte groups). Returns (R, 512) int32 char stream (4 chars
    per lane). Pallas when the toolchain lowers its casts (own-kernel
    probe) and R % RB == 0; the bit-identical XLA driver otherwise."""
    if x32.shape[0] % RB or not pallas_lowers(
        "b64_block_encode",
        lambda: _block_encode_pallas(jnp.zeros((RB, 384), jnp.int32), url),
    ):
        return _encode_xla(url)(x32)
    return _block_encode_pallas(x32, url)


@functools.partial(jax.jit, static_argnames=("url",))
def _block_encode_pallas(x32: jnp.ndarray, url: bool = False):
    grid = x32.shape[0] // RB
    return pl.pallas_call(
        functools.partial(_encode_kernel, url=url),
        grid=(grid,),
        in_specs=[pl.BlockSpec((RB, 384), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((RB, 512), lambda i: (i, 0)),
        out_shape=sds(x32, (x32.shape[0], 512), jnp.int32),
        interpret=_interpret(),
    )(x32)
