"""Feature introspection — the runtime analog of the reference's
compile-time SIMDUTF_FEATURE_* gates (implementation.h:23-38) and
amalgamation subsetting (singleheader/amalgamate.py:60-67).

Everything ships enabled here; the dict exists so code written against
feature-gated simdutf builds has something to query, plus tier/runtime
availability which is this library's real variability.
"""

from __future__ import annotations

from .registry import get_available_implementations


#: parity with SIMDUTF_FEATURE_* — all capabilities are always built
FEATURES = {
    "detect_encoding": True,
    "ascii": True,
    "latin1": True,
    "utf8": True,
    "utf16": True,
    "utf32": True,
    "base64": True,
}


def features() -> dict:
    """Capability + tier availability report."""
    tiers = {}
    for name, impl in get_available_implementations().items():
        tiers[name] = impl.description
    return {"capabilities": dict(FEATURES), "implementations": tiers}
