"""Fused one-pass encoding detection, XLA tier.

The reference's SIMD backends run the UTF-8 checker, UTF-16 surrogate
machine, and UTF-32 range scan simultaneously per 64-byte block
(haswell/implementation.cpp:152-260); here the three validators share one
jit program over one buffer read — XLA fuses the elementwise work.
BOM sniffing stays on the host (encodings.check_bom).
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import BIG
from . import utf8 as o8, utf16 as o16, utf32 as o32


def detect_encodings(b: jnp.ndarray, length):
    """b: uint8[N] (N % 4 == 0 padded). Returns (utf8_ok, utf16le_ok,
    utf32le_ok) as int32 flags; the caller masks by length % 2 / % 4."""
    code8, _ = o8.validate_with_errors(b, length)
    w16 = b.reshape(-1, 2)
    u16 = (w16[:, 0].astype(jnp.int32) | (w16[:, 1].astype(jnp.int32) << 8))
    # o16.first_error masks by length itself — no pre-zeroing needed
    pos16, _ = o16.first_error(
        u16,
        length // 2,
    )
    w32 = b.reshape(-1, 4).astype(jnp.uint32)
    u32 = w32[:, 0] | (w32[:, 1] << 8) | (w32[:, 2] << 16) | (w32[:, 3] << 24)
    pos32, _ = o32.first_error(u32, length // 4)
    return (
        (code8 == 0).astype(jnp.int32),
        (pos16 == BIG).astype(jnp.int32),
        (pos32 == BIG).astype(jnp.int32),
    )
