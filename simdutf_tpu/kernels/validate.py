"""Pallas validation / counting kernels.

Each program handles a (BR, 512)-byte tile in VMEM, computes the UTF-8
event algebra (same formulation as ops/utf8.py) entirely on the VPU, and
emits a per-tile (min event position, code) pair; a tiny jnp epilogue takes
the global argmin. Exact first-error parity is preserved without any host
rescan.

Cross-tile carries: every row needs bytes 1..4 of the *next* row for its
last lanes. Rows inside the tile use the tile itself; the tile's last row
reads the first row of the next tile through a second, overlapping input
whose index_map points one tile ahead (the input array carries one extra
zero row so the lookahead never leaves bounds). This is the TPU analog of
the reference's 64-byte blocks with prev<1..3> carries
(src/generic/utf8_validation/utf8_lookup4_algorithm.h:100-108).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..errors import error_code as ec

W = 512  # bytes per row
BR = 64  # rows per tile -> 32 KiB tiles (measured best on v5e: ~500 GB/s
# validate, ~600 GB/s count at 16 MiB; smaller tiles are grid-overhead-bound)
BIG = 2**31 - 1

_TOO_SHORT = int(ec.TOO_SHORT)
_TOO_LONG = int(ec.TOO_LONG)
_OVERLONG = int(ec.OVERLONG)
_TOO_LARGE = int(ec.TOO_LARGE)
_SURROGATE = int(ec.SURROGATE)
_HEADER_BITS = int(ec.HEADER_BITS)


def _interpret() -> bool:
    try:
        return jax.default_backend() != "tpu"
    except Exception:  # backend init can fail transiently (tunnel busy)
        return True


def vany(m) -> jnp.ndarray:
    """Scalar "any lane is set" that Mosaic can always lower.

    ``jnp.any`` reduces an i1 vector, and current libtpu Mosaic rejects the
    mask relayout (tiled -> replicated) it needs for multi-vreg tiles
    ("Invalid relayout ... vector<64x256xi1>"); ``jnp.where(m, 1, 0)``
    fails the same way on the scalar broadcast. Converting the mask with
    astype and max-reducing int32 takes the plain integer-reduction path,
    which lowers everywhere (verified per-idiom on v5e Mosaic). Use this
    instead of jnp.any inside kernels."""
    return jnp.max(m.astype(jnp.int32)) > 0


@functools.cache
def xla_fn(core, *static):
    """Jitted whole-array XLA driver of a kernel ``core(x, i, n, *static)
    -> (out, bad)``: tile index 0 makes the core's row iota global, so the
    result is bit-identical to the gridded Pallas run. Used when the
    Mosaic toolchain lacks lane shape casts (lane_shapecast_supported);
    XLA lowers the reshapes/stacks natively and fuses the whole body."""

    @jax.jit
    def f(x, n):
        out, bad = core(x, 0, n, *static)
        return out, bad.astype(jnp.int32)

    return f


def xla_driver(core, x, n, *static):
    return xla_fn(core, *static)(x, jnp.asarray(n, jnp.int32))


@functools.cache
def _remote_compile_tunnel() -> bool:
    """Whether device compiles go through the axon remote-compile helper
    pool (identified from the PJRT platform version; the JAX_PLATFORMS
    env var is unreliable — sitecustomize loads the axon plugin even when
    the env says cpu)."""
    try:
        ver = getattr(jax.devices()[0].client, "platform_version", "") or ""
        return "axon" in ver.lower()
    except Exception:
        return False


def u8_words(b_u8: jnp.ndarray) -> jnp.ndarray:
    """(N,) u8 -> (N/512, 128) int32 little-endian words, byte-identical
    to ``bitcast_convert_type(b.reshape(-1, 4), int32)``.

    The reshape+bitcast form materializes a (N/4, 4)-minor array whose
    last dim TPU pads to 128 lanes whenever XLA cannot fuse it away —
    inside a lax.cond branch that is 8 GB of traffic for a 64 MiB input
    (u32[16M,4]{T(8,128)} reshape + shift-reduce, ~25 ms; profiled
    2026-08-20). This form keeps the minor dim at 512/128 throughout:
    a (R, 512) u8 view and four strided LANE slices, 2.2 ms direct and
    4.0 ms inside a cond at the same size (measured)."""
    x2 = b_u8.reshape(-1, 512)
    b0 = x2[:, 0::4].astype(jnp.int32)
    b1 = x2[:, 1::4].astype(jnp.int32)
    b2 = x2[:, 2::4].astype(jnp.int32)
    b3 = x2[:, 3::4].astype(jnp.int32)
    return b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)


def sds(like, shape, dtype):
    """ShapeDtypeStruct for a pallas out_shape whose varying-manual-axes
    (vma) are inherited from input ``like``: under shard_map with
    check_vma (jax >= 0.9 default), a pallas_call must declare which mesh
    axes its outputs vary over, and a kernel output always varies exactly
    like the shard data feeding it."""
    try:
        vma = jax.typeof(like).vma
    except Exception:
        vma = None
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


_LOWERS_OK: dict = {}


def pallas_lowers(key: str, thunk) -> bool:
    """One-tile compile probe of the REAL kernel behind ``key``.

    The shared shapecast probe below is no longer representative: the
    2026-08-20 toolchain accepts a 64-row lane-splitting cast but rejects
    the 16-row cast inside the base64 pack kernel ("infer-vector-layout:
    unsupported shape cast" — or an outright compile-helper crash,
    depending on which helper of the pool serves the request). The only
    trustworthy capability signal is compiling the kernel itself, so each
    rate-converting wrapper probes its own pallas path once per process
    with a one-tile dummy and routes to its XLA driver on ANY failure.
    This is src/implementation.cpp's supported_by_runtime_system() made
    per-kernel — with one hard exception: under the axon remote-compile
    TUNNEL the compile service is a pool whose helpers answer the SAME
    program differently per request (measured 2026-08-20: the one-tile
    probe of _pack_sextets_pallas compiled, then the identical real
    compile failed "unsupported shape cast"), so no probe is sound there
    and the shapecast kernels default to their bit-identical XLA drivers.
    SIMDUTF_TPU_SHAPECAST_PALLAS=1 forces probing anyway; =0 forces the
    drivers everywhere."""
    if _interpret():
        return True
    env = os.environ.get("SIMDUTF_TPU_SHAPECAST_PALLAS")
    if env == "0":
        return False
    if env != "1" and _remote_compile_tunnel():
        return False
    if key not in _LOWERS_OK:
        try:
            jax.block_until_ready(thunk())
            _LOWERS_OK[key] = True
        except Exception:
            _LOWERS_OK[key] = False
    return _LOWERS_OK[key]


@functools.cache
def lane_shapecast_supported() -> bool:
    """Whether the active Mosaic toolchain lowers lane-splitting vector
    shape casts — ``x.reshape(R, L, k)`` deinterleaves and
    ``stack(...).reshape(R, k*L)`` interleaves inside kernels.

    The rate-converting phase-plane kernels (uniform3, bmp widen/narrow,
    base64 4<->3 repack ...) need them; some libtpu builds reject them
    ("unsupported shape cast"), in which case those kernels route to their
    XLA drivers (same core math, reshapes lowered by XLA) — runtime
    capability dispatch, the reference's isadetection.h idea applied to
    the kernel toolchain. Probed once per process with a one-tile kernel
    at the kernels' REAL shapes (64 rows, k=2 and k=4 lane splits — an
    8-row/k=2 probe passes on toolchains that still reject the wider
    casts); interpret mode always supports them. A transient compile
    failure caches False, which only costs the pallas path, never
    correctness."""
    if _interpret():
        return True
    # The tunnel's compile service is a POOL of helper processes that can
    # run DIFFERENT toolchain builds (measured 2026-08-20: the same probe
    # kernel alternates between compiling and crashing the helper with
    # exit code 1 across fresh processes). One success therefore proves
    # nothing about the helper the next real kernel will hit — require
    # three consecutive fresh compiles (distinct constants defeat the
    # executable cache) before trusting the shapecast path; any failure,
    # including an HTTP 500 helper crash, routes to the XLA drivers.
    try:
        for trial in range(3):
            def k(x_ref, o_ref, *, salt=trial + 1):
                x = x_ref[...] ^ salt  # distinct program per trial
                quads = x.reshape(64, 128, 4)  # k=4 read split
                a = quads[..., 0] ^ quads[..., 3]
                b = quads[..., 1] ^ quads[..., 2]
                two = jnp.stack([a, b], axis=-1).reshape(64, 256)  # k=2 write
                pairs = two.reshape(64, 128, 2)  # k=2 read split
                o_ref[...] = jnp.stack(
                    [pairs[..., 0], pairs[..., 1], a, b], axis=-1
                ).reshape(64, 512)  # k=4 write

            out = pl.pallas_call(
                k,
                grid=(1,),
                in_specs=[pl.BlockSpec((64, 512), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((64, 512), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((64, 512), jnp.int32),
            )(jnp.zeros((64, 512), jnp.int32))
            jax.block_until_ready(out)
        return True
    except Exception:
        return False


def _iotas(shape):
    row = jax.lax.broadcasted_iota(jnp.int32, shape, dimension=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, dimension=1)
    return row, lane


HALO = 128  # lookahead halo width (Mosaic lane minimum)


def _shifts(b, halo):
    """b1..b4 (next bytes in row-major order) for a (BR, W) int32 tile.

    ``halo`` is an (8, HALO) block whose first row holds the first lanes
    of the row after the tile — only 4 bytes are used, but reading a
    column block (instead of a whole lookahead tile) keeps HBM read
    traffic at ~1.25N instead of 2N; 8 sublanes is the Mosaic minimum."""
    below_first = jnp.concatenate([b[1:, :HALO], halo[0:1]], axis=0)  # (BR, HALO)
    below = jnp.pad(below_first, ((0, 0), (0, W - HALO)))
    _, lane = _iotas(b.shape)
    outs = []
    for k in (1, 2, 3, 4):
        # roll requires non-negative shifts: W-k is a left shift by k
        rolled = pltpu.roll(b, shift=W - k, axis=1)  # b[r, (l+k) % W]
        wrap = pltpu.roll(below, shift=W - k, axis=1)  # below[r, (l+k)-W]
        outs.append(jnp.where(lane < W - k, rolled, wrap))
    return outs


def _utf8_events(b, nxt, base, shifts=None):
    """Min event (pos, code) for one int32 tile; ``base`` = global byte
    index of the tile's first byte. ``shifts`` lets fused callers (the
    one-pass detect kernel) share the b1..b4 halo shifts."""
    b1, b2, b3, b4 = _shifts(b, nxt) if shifts is None else shifts

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
    cp4 = ((b & 0x07) << 18) | ((b1 & 0x3F) << 12) | ((b2 & 0x3F) << 6) | (b3 & 0x3F)

    err = jnp.zeros_like(b)
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

    lead = ~is_cont
    seqlen = jnp.where(ascii_, 1, 0)
    seqlen = jnp.where(lead2, 2, seqlen)
    seqlen = jnp.where(lead3, 3, seqlen)
    seqlen = jnp.where(lead4, 4, seqlen)

    row, lane = _iotas(b.shape)
    gpos = base + row * W + lane

    # (1) invalid lead sequences, at the lead's own position
    bad_lead = lead & (err != 0)
    pos1 = jnp.min(jnp.where(bad_lead, gpos, BIG))
    code1 = jnp.max(jnp.where(bad_lead & (gpos == pos1), err, 0))
    # (2) unconsumed continuation after a valid sequence -> TOO_LONG there
    gap = (
        ((seqlen == 1) & c1)
        | ((seqlen == 2) & c2)
        | ((seqlen == 3) & c3)
        | ((seqlen == 4) & c4)
    )
    good_lead = lead & (err == 0) & ~badlead
    pos2 = jnp.min(jnp.where(good_lead & gap, gpos + seqlen, BIG))
    # (3) stream starts with a continuation byte (global position 0)
    # bool scalars can't be squeezed in Mosaic; extract via int32
    cont0 = is_cont.astype(jnp.int32)[0, 0]
    pos3 = jnp.where((base == 0) & (cont0 == 1), 0, BIG)

    pos = jnp.minimum(jnp.minimum(pos1, pos2), pos3)
    code = jnp.where(pos == pos1, code1, _TOO_LONG)
    code = jnp.where(pos == BIG, 0, code)
    return pos, code


def _utf8_kernel(x_ref, nxt_ref, out_ref):
    # TPU grid steps run sequentially on one core, so a constant-index
    # output block acts as an accumulator: running (min pos, its code).
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[0, 0] = BIG
        out_ref[0, 1] = 0

    base = i * (BR * W)
    pos, code = _utf8_events(
        x_ref[...].astype(jnp.int32), nxt_ref[...].astype(jnp.int32), base
    )

    @pl.when(pos < out_ref[0, 0])
    def _update():
        out_ref[0, 0] = pos
        out_ref[0, 1] = code


def _ascii_kernel(x_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[0, 0] = BIG
        out_ref[0, 1] = _TOO_LARGE

    b = x_ref[...].astype(jnp.int32)
    row, lane = _iotas(b.shape)
    gpos = i * (BR * W) + row * W + lane
    pos = jnp.min(jnp.where(b >= 0x80, gpos, BIG))

    @pl.when(pos < out_ref[0, 0])
    def _update():
        out_ref[0, 0] = pos


def _count_kernel(len_ref, x_ref, out_ref, *, what: str):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[0, 0] = 0
        out_ref[0, 1] = 0

    b = x_ref[...].astype(jnp.int32)
    row, lane = _iotas(b.shape)
    in_r = (i * (BR * W) + row * W + lane) < len_ref[0]
    if what == "latin1":  # utf8_length_from_latin1: N + high bytes
        part = jnp.sum(in_r.astype(jnp.int32))
        part = part + jnp.sum(((b >= 0x80) & in_r).astype(jnp.int32))
    else:
        noncont = ((b & 0xC0) != 0x80) & in_r
        part = jnp.sum(noncont.astype(jnp.int32))
        if what == "utf16":  # + 4-byte leads (one extra unit each)
            part = part + jnp.sum(((b >= 0xF0) & in_r).astype(jnp.int32))
    out_ref[0, 0] = out_ref[0, 0] + part


def _utf8_kernel_len(len_ref, x_ref, nxt_ref, out_ref):
    """utf8_first_event with an explicit logical length: bytes at/after
    ``len`` read as zero, reproducing the zero-padded-buffer semantics
    (a sequence truncated AT the length reports TOO_SHORT at its lead,
    exactly like the scalar machine). This is the dispatched-surface
    variant: ops/utf8.validate_with_errors routes big buffers here so a
    caller's dynamic length is honored without re-staging the buffer."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[0, 0] = BIG
        out_ref[0, 1] = 0

    base = i * (BR * W)
    L = len_ref[0]
    b = x_ref[...].astype(jnp.int32)
    row, lane = _iotas(b.shape)
    b = jnp.where(base + row * W + lane < L, b, 0)
    nx = nxt_ref[...].astype(jnp.int32)
    rn, ln = _iotas(nx.shape)
    nx = jnp.where((i + 1) * (BR * W) + rn * W + ln < L, nx, 0)
    pos, code = _utf8_events(b, nx, base)

    @pl.when(pos < out_ref[0, 0])
    def _update():
        out_ref[0, 0] = pos
        out_ref[0, 1] = code


@jax.jit
def utf8_first_event_len(x2d: jnp.ndarray, length):
    """Length-masked :func:`utf8_first_event` (same layout contract,
    except bytes at/after ``length`` may be arbitrary)."""
    rows = x2d.shape[0] - BR
    grid = rows // BR
    out = pl.pallas_call(
        _utf8_kernel_len,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BR, W), lambda i: (i, 0)),
            pl.BlockSpec((8, HALO), lambda i: ((i + 1) * BR // 8, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
        interpret=_interpret(),
    )(jnp.reshape(jnp.asarray(length, jnp.int32), (1,)), x2d, x2d)
    return out[0, 0], out[0, 1]


@jax.jit
def utf8_first_event(x2d: jnp.ndarray):
    """x2d: (R+1, W) uint8, zero-padded beyond the logical length, last row
    all zeros. Returns (pos, code) of the first UTF-8 error event; pos ==
    BIG when the buffer (with its zero tail) is valid."""
    rows = x2d.shape[0] - BR
    grid = rows // BR
    out = pl.pallas_call(
        _utf8_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((BR, W), lambda i: (i, 0)),
            # halo: first HALO lanes of the first rows of the next tile
            pl.BlockSpec((8, HALO), lambda i: ((i + 1) * BR // 8, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
        interpret=_interpret(),
    )(x2d, x2d)
    return out[0, 0], out[0, 1]


@jax.jit
def ascii_first_bad(x2d: jnp.ndarray):
    rows = x2d.shape[0] - BR
    grid = rows // BR
    out = pl.pallas_call(
        _ascii_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((BR, W), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
        interpret=_interpret(),
    )(x2d)
    return out[0, 0]


def _count_call(x2d, length, what):
    rows = x2d.shape[0] - BR
    grid = rows // BR
    out = pl.pallas_call(
        functools.partial(_count_kernel, what=what),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BR, W), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
        interpret=_interpret(),
    )(jnp.reshape(length, (1,)).astype(jnp.int32), x2d)
    return out[0, 0]


@jax.jit
def utf8_count(x2d: jnp.ndarray, length):
    return _count_call(x2d, length, "count")


@jax.jit
def utf8_utf16_length(x2d: jnp.ndarray, length):
    return _count_call(x2d, length, "utf16")


@jax.jit
def latin1_utf8_length(x2d: jnp.ndarray, length):
    """utf8_length_from_latin1: N + count of high bytes
    (scalar/latin1.h:9-19)."""
    return _count_call(x2d, length, "latin1")


def _utf32_len_kernel(len_ref, x_ref, out_ref, *, what: str):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[0, 0] = 0
        out_ref[0, 1] = 0

    w = x_ref[...]  # int32 lanes, one code point per lane
    row, lane = _iotas(w.shape)
    in_r = (i * (BR * W) + row * W + lane) < len_ref[0]
    # int32 lanes: negatives are >= 2^31 unsigned, above every threshold
    neg = w < 0
    part = jnp.sum(in_r.astype(jnp.int32))
    part = part + jnp.sum((((w > 0xFFFF) | neg) & in_r).astype(jnp.int32))
    if what == "utf8len":  # scalar/utf32.h length ladder
        part = part + jnp.sum((((w > 0x7F) | neg) & in_r).astype(jnp.int32))
        part = part + jnp.sum((((w > 0x7FF) | neg) & in_r).astype(jnp.int32))
    out_ref[0, 0] = out_ref[0, 0] + part


def _utf32_validate_kernel(len_ref, x_ref, out_ref):
    """Min bad-word position for UTF-32 range validation
    (scalar/utf32.h: > 0x10FFFF or surrogate)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[0, 0] = BIG
        out_ref[0, 1] = 0

    w = x_ref[...]  # int32 lanes, one code point per lane
    row, lane = _iotas(w.shape)
    gpos = i * (BR * W) + row * W + lane
    in_r = gpos < len_ref[0]
    neg = w < 0  # >= 2^31 unsigned
    bad = (neg | (w > 0x10FFFF) | ((w >= 0xD800) & (w <= 0xDFFF))) & in_r
    pos = jnp.min(jnp.where(bad, gpos, BIG))

    @pl.when(pos < out_ref[0, 0])
    def _update():
        out_ref[0, 0] = pos


@jax.jit
def utf32_first_bad(x2d: jnp.ndarray, length):
    """x2d: (rows, 512) int32, one UTF-32 word per lane (_pad_u32k layout).
    Returns min invalid-word index (BIG when valid)."""
    grid = x2d.shape[0] // BR
    out = pl.pallas_call(
        _utf32_validate_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BR, W), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
        interpret=_interpret(),
    )(jnp.reshape(length, (1,)).astype(jnp.int32), x2d)
    return out[0, 0]


@functools.partial(jax.jit, static_argnames=("what",))
def utf32_reduce(x2d: jnp.ndarray, length, what: str):
    """x2d: (rows, 512) int32, one UTF-32 code point per lane (the
    _pad_u32k layout). what: 'utf8len' | 'utf16len'. length in units."""
    grid = x2d.shape[0] // BR
    out = pl.pallas_call(
        functools.partial(_utf32_len_kernel, what=what),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BR, W), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
        interpret=_interpret(),
    )(jnp.reshape(length, (1,)).astype(jnp.int32), x2d)
    return out[0, 0]
