"""Installation test analog (tests/installation_tests in the reference):
build an sdist-free wheel of this package and import it from a clean dir."""

import subprocess
import sys

import pytest


@pytest.mark.slow
def test_pip_wheel_builds_and_imports(tmp_path):
    r = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", "/root/repo", "--no-deps",
         "--no-build-isolation", "-w", str(tmp_path)],
        capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    wheels = list(tmp_path.glob("simdutf_tpu-*.whl"))
    assert wheels, list(tmp_path.iterdir())
    # install to a target dir (C extensions cannot zipimport) and import
    tgt = tmp_path / "site"
    ri = subprocess.run(
        [sys.executable, "-m", "pip", "install", "--no-deps", "--target",
         str(tgt), str(wheels[0])],
        capture_output=True, text=True, timeout=180,
    )
    assert ri.returncode == 0, ri.stderr[-2000:]
    check = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, sys.argv[1]); "
         "import simdutf_tpu as su; "
         "assert su.validate_utf8('ok🙂'.encode()); "
         "print(sorted(su.get_available_implementations()))",
         str(tgt)],
        capture_output=True, text=True, timeout=180,
        env={"JAX_PLATFORMS": "cpu", "HOME": "/root", "PATH": "/usr/bin:/bin"},
        cwd=str(tmp_path),
    )
    assert check.returncode == 0, check.stderr[-2000:]
    assert "cnative" in check.stdout  # the C extension made it into the wheel
