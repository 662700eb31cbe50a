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
    # serialize concurrent pytest invocations (e.g. xdist workers): two
    # overlapping in-place builds can interleave into a truncated .so
    lock_path = os.path.join(root, "build", ".cnative_build_lock")
    os.makedirs(os.path.dirname(lock_path), exist_ok=True)
    lock = open(lock_path, "w")
    try:
        import fcntl

        fcntl.flock(lock, fcntl.LOCK_EX)
    except ImportError:  # non-POSIX: accept the (rare) race
        pass
    try:
        try:
            import simdutf_tpu._cnative  # noqa: F401  (another run built it)

            return
        except ImportError:
            pass
        proc = subprocess.run(
            [sys.executable, "setup.py", "build_ext", "--inplace"],
            cwd=root, capture_output=True, text=True, timeout=600,
        )
        if proc.returncode != 0:
            print("warning: cnative build failed; the cnative tier will "
                  f"not be tested. stderr:\n{proc.stderr[-2000:]}",
                  file=sys.stderr)
    except Exception as exc:  # noqa: BLE001 - toolchain may be absent
        print(f"warning: cnative build failed ({exc}); "
              "the cnative tier will not be tested", file=sys.stderr)
    finally:
        lock.close()


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
