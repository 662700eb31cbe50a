"""Shared helpers for the XLA tier."""

from __future__ import annotations

import jax.numpy as jnp

#: sentinel for "no error" positions; must exceed any buffer index.
#: Plain Python int: a jnp scalar created at import would live on the
#: default device and turn every jit lowering into a device fetch.
BIG = 2**31 - 1


def bswap16(w: jnp.ndarray) -> jnp.ndarray:
    """Byteswap the low 16 bits of each lane (the UTF-16 BE<->native
    step; one shared definition so every direction lowers identically)."""
    return ((w << 8) | (w >> 8)) & 0xFFFF


def shift_left(b: jnp.ndarray, k: int) -> jnp.ndarray:
    """out[i] = b[i+k], zero-filled past the end.

    Plays the role of the reference's ``prev<N>`` cross-block carries
    (src/simdutf/haswell/simd.h) but in the forward direction over the whole
    buffer: zero fill reproduces zero-padded-remainder semantics
    (generic/utf8_validation/utf8_validator.h:18-22).
    """
    if k == 0:
        return b
    return jnp.pad(b[k:], (0, k))


def shift_right(b: jnp.ndarray, k: int) -> jnp.ndarray:
    """out[i] = b[i-k], zero-filled before the start (lookback carry)."""
    if k == 0:
        return b
    return jnp.pad(b[:-k], (k, 0))


def positions(n: int) -> jnp.ndarray:
    return jnp.arange(n, dtype=jnp.int32)


def zero_tail(b: jnp.ndarray, length) -> jnp.ndarray:
    """Force bytes at/after ``length`` to zero so padded tails behave like
    the reference's zero-padded last block."""
    idx = positions(b.shape[0])
    return jnp.where(idx < length, b, 0)


# --- transcode-engine variants (promotable via on-device probes, ----------
# tools/probe_transcode.py; see also bench records in perf_records/).
# SIMDUTF_TPU_TRANSCODE_ENGINE is a '+'-separated combination of:
#   blkscan — blocked cumsum (row-wise scan + tiny row-offset scan)
#   uniq    — scatters pass unique_indices=True (drop targets made distinct)
#   nat     — scatter values in the OUTPUT dtype ("u16" accepted as alias),
#             eliminating the post-scatter astype pass (a full read+write
#             of the capacity buffer when the output is narrower than i32)
# Read once at import: the choice is baked into jit caches like the
# reference's one-time backend pick (src/implementation.cpp:1290).

import os as _os

ENGINE = frozenset(
    filter(None, _os.environ.get("SIMDUTF_TPU_TRANSCODE_ENGINE", "").split("+"))
)
_NAT = "nat" in ENGINE or "u16" in ENGINE
_BLK = 2048  # blkscan row width (divides every padded bucket size)


def excl_scan(k32: jnp.ndarray, n: int):
    """Exclusive prefix sum of int32[n] -> (off, inclusive)."""
    if "blkscan" in ENGINE and n % _BLK == 0 and n > _BLK:
        x2 = k32.reshape(-1, _BLK)
        row_inc = jnp.cumsum(x2, axis=1)
        row_tot = row_inc[:, -1]
        row_off = jnp.cumsum(row_tot) - row_tot
        inc = (row_inc + row_off[:, None]).reshape(-1)
    else:
        inc = jnp.cumsum(k32)
    return inc - k32, inc


def scatter_writes(cap: int, out_dtype, writes):
    """Chained compaction scatters: out[off] = vals where mask, capacity
    ``cap``, others dropped. ``writes`` is a list of (mask, off, vals).
    Every transcode direction funnels through here so the engine variants
    above apply uniformly."""
    dt = out_dtype if _NAT else writes[0][2].dtype
    out = jnp.zeros(cap, dtype=dt)
    for mask, off, vals in writes:
        if _NAT:
            vals = vals.astype(dt)
        if "uniq" in ENGINE:
            idx = positions(mask.shape[0])
            tgt = jnp.where(mask, off, cap + idx)  # distinct OOB per drop
            out = out.at[tgt].set(vals, mode="drop", unique_indices=True)
        else:
            out = out.at[jnp.where(mask, off, cap)].set(vals, mode="drop")
    return out.astype(out_dtype)

