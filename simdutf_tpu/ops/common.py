"""Shared helpers for the XLA tier."""

from __future__ import annotations

import jax.numpy as jnp

#: sentinel for "no error" positions; must exceed any buffer index.
#: Plain Python int: a jnp scalar created at import would live on the
#: default device and turn every jit lowering into a device fetch.
BIG = 2**31 - 1


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

