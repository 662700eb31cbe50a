"""Multi-chip / multi-host layer.

The reference is single-threaded by design (README.md:2343-2347) and scales
by letting users shard inputs across threads (benchmarks/threaded.cpp).
Here sharding is first-class: a shard planner splits byte corpora on
codepoint boundaries (trim_partial semantics, implementation.h:2690-2716),
shards run data-parallel under shard_map over a jax Mesh, and result
structs reduce with psum / min collectives so the global Result matches a
single-device run bit-for-bit (first-error = min over shard-local error
positions offset by shard starts).
"""

from .planner import plan_shards, plan_shards_base64, ShardPlan  # noqa: F401
from .distributed import (  # noqa: F401
    autodetect_encoding_sharded,
    base64_to_binary_sharded,
    count_sharded,
    detect_encodings_sharded,
    gather_units,
    gather_utf16,
    make_mesh,
    stage,
    plan_unit_for,
    transcode_sharded,
    transcode_utf8_to_utf16_sharded,
    transcode_utf16_to_utf8_sharded,
    validate_utf8_sharded,
    validate_utf16_sharded,
    validate_utf32_sharded,
)
