"""Feature introspection + runtime subsetting — the analog of the
reference's compile-time SIMDUTF_FEATURE_* gates (implementation.h:23-38)
and amalgamation subsetting (singleheader/amalgamate.py:60-67, exercised
by singleheader/test-features.py which builds every feature combination).

The reference strips source regions at amalgamation time; a Python package
can't compile subsets out, so the same contract is enforced at import time:
``SIMDUTF_TPU_FEATURES=utf8,utf16`` (comma list, case-insensitive) disables
every public free function that touches an unlisted capability — calling
one raises :class:`FeatureUnavailableError`, mirroring the link error a
subsetted reference build would give. Default: everything enabled.
"""

from __future__ import annotations

import os

from .registry import get_available_implementations

#: the reference's seven gates (amalgamate.py known_features)
ALL_FEATURES = (
    "detect_encoding",
    "ascii",
    "latin1",
    "utf8",
    "utf16",
    "utf32",
    "base64",
)


class FeatureUnavailableError(RuntimeError):
    """This build subset does not include the capability (parity with a
    reference build amalgamated without the SIMDUTF_FEATURE_* region)."""


def _parse_env() -> dict:
    raw = os.environ.get("SIMDUTF_TPU_FEATURES", "").strip()
    if not raw:
        return {f: True for f in ALL_FEATURES}
    want = {tok.strip().lower() for tok in raw.split(",") if tok.strip()}
    unknown = want - set(ALL_FEATURES)
    if unknown:
        raise ValueError(
            f"SIMDUTF_TPU_FEATURES: unknown feature(s) {sorted(unknown)}; "
            f"valid: {', '.join(ALL_FEATURES)}")
    return {f: f in want for f in ALL_FEATURES}


#: parity with SIMDUTF_FEATURE_* — populated from the environment once at
#: import, like a compile-time choice
FEATURES = _parse_env()


def required_features(name: str) -> set:
    """Capabilities a public function name touches. Mirrors the reference's
    region guards: convert_utf8_to_utf16le sits under
    ``SIMDUTF_FEATURE_UTF8 && SIMDUTF_FEATURE_UTF16``."""
    req = set()
    for tok in ("ascii", "latin1", "utf8", "utf16", "utf32", "base64"):
        if tok in name:
            req.add(tok)
    if "detect" in name:  # detect_encodings / autodetect_encoding
        req.add("detect_encoding")
    if "change_endianness" in name or "to_well_formed" in name:
        req.add("utf16")
    return req


def _gate(name: str, missing: set):
    missing_s = ", ".join(sorted(missing))

    def unavailable(*_a, **_k):
        raise FeatureUnavailableError(
            f"{name} requires feature(s) [{missing_s}] but this process "
            f"was started with SIMDUTF_TPU_FEATURES="
            f"{os.environ.get('SIMDUTF_TPU_FEATURES')!r}")

    unavailable.__name__ = name
    unavailable.__qualname__ = name
    unavailable.__doc__ = (
        f"Disabled by SIMDUTF_TPU_FEATURES (needs: {missing_s}).")
    return unavailable


def apply_gates(namespaces) -> list:
    """Replace public callables whose required features are disabled with
    raising stubs, in every given module namespace. Returns gated names."""
    disabled = {f for f, on in FEATURES.items() if not on}
    if not disabled:
        return []
    gated = []
    for ns in namespaces:
        for name in dir(ns):
            if name.startswith("_"):
                continue
            fn = getattr(ns, name)
            if not callable(fn) or isinstance(fn, type):
                continue
            missing = required_features(name) & disabled
            if missing:
                setattr(ns, name, _gate(name, missing))
                gated.append(name)
    return sorted(set(gated))


#: canonical stream-encoding name -> feature gate
ENCODING_FEATURE = {
    "utf8": "utf8", "utf16le": "utf16", "utf16be": "utf16",
    "utf32": "utf32", "latin1": "latin1", "ascii": "ascii",
}


def require_enabled(feats, who: str) -> None:
    """Raise FeatureUnavailableError if any needed feature is disabled —
    the runtime check used by class-based surfaces (streaming) that can't
    be name-gated at import like the free functions."""
    missing = {f for f in feats if not FEATURES.get(f, True)}
    if missing:
        raise FeatureUnavailableError(
            f"{who} requires feature(s) [{', '.join(sorted(missing))}] but "
            f"this process was started with SIMDUTF_TPU_FEATURES="
            f"{os.environ.get('SIMDUTF_TPU_FEATURES')!r}")


def features() -> dict:
    """Capability + tier availability report."""
    tiers = {}
    for name, impl in get_available_implementations().items():
        tiers[name] = impl.description
    return {"capabilities": dict(FEATURES), "implementations": tiers}
