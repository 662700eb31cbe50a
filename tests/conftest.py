"""Test configuration.

Tests run on CPU with 8 virtual devices (the reference tests multi-arch
via QEMU; we test multi-chip via XLA's host-platform device simulation).
Must set env before jax is imported anywhere.
"""

import os

# Force CPU even though the environment pre-imports jax with
# JAX_PLATFORMS=axon (TPU tunnel) via sitecustomize: the env var is snapshot
# at that import, so we must also use jax.config.update.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def _ensure_cnative_built():
    """Build the C extension in-place when it is missing so a fresh
    checkout tests all four tiers (without it the cnative tier — and its
    ~1000 parametrized tests — would silently vanish from the run)."""
    try:
        import simdutf_tpu._cnative  # noqa: F401

        return
    except ImportError:
        pass
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        subprocess.run(
            [sys.executable, "setup.py", "build_ext", "--inplace"],
            cwd=root, capture_output=True, timeout=600, check=True,
        )
    except Exception as exc:  # noqa: BLE001 - toolchain may be absent
        print(f"warning: cnative build failed ({exc}); "
              "the cnative tier will not be tested", file=__import__("sys").stderr)


_ensure_cnative_built()


def _available_impls():
    import simdutf_tpu as su

    return sorted(su.get_available_implementations())


@pytest.fixture(params=_available_impls())
def impl_name(request):
    """Run the test once per registered implementation, mirroring the
    reference's per-implementation test loop (tests/helpers/test.cpp)."""
    import simdutf_tpu as su

    su.set_active_implementation(request.param)
    yield request.param
    su.set_active_implementation("fallback")
