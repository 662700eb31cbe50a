"""Test configuration.

Tests run on CPU with 8 virtual devices (the reference tests multi-arch
via QEMU; we test multi-chip via XLA's host-platform device simulation).
Must set env before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


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
