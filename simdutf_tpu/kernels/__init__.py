"""Pallas tier: hand-tuned TPU kernels (the 'icelake' of this library).

Layout contract: byte streams are viewed as (R+1, 512) uint8 row-major
tiles (last row zero padding); kernels grid over row groups with a 4-byte
lookahead carried via an overlapping next-row input — the TPU analog of the
reference's 64-byte blocks with prev<1..3> carries
(src/generic/utf8_validation/utf8_lookup4_algorithm.h:100-108).
"""

from . import validate  # noqa: F401
