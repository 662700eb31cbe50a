"""Replay fuzz repro dumps as permanent regression vectors.

The continuous fuzzer (tools/fuzz_loop.py) dumps a standalone JSON repro
into fuzz_repros/ for every cross-tier deviation it finds (the reference's
fuzz/random_fuzzer.cpp:26-40 dumps repros the same way). Once the
underlying bug — or the over-strict invariant — is fixed, the dump stays
in the tree and this test replays it forever: the recorded input is pushed
through the original op on every registered tier and all results must
agree bit-for-bit with no exceptions.
"""

import glob
import importlib.util
import json
import os

import pytest

import simdutf_tpu as su

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_REPRO_DIR = os.path.join(_ROOT, "fuzz_repros")


def _load_fuzz_ops():
    spec = importlib.util.spec_from_file_location(
        "fuzz_loop", os.path.join(_ROOT, "tools", "fuzz_loop.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_repro_files = sorted(glob.glob(os.path.join(_REPRO_DIR, "*.json")))


@pytest.mark.skipif(not _repro_files, reason="no fuzz repros recorded")
@pytest.mark.parametrize(
    "path", _repro_files, ids=[os.path.basename(p) for p in _repro_files])
def test_replay_repro(path):
    fl = _load_fuzz_ops()
    rec = json.load(open(path))
    op_name = rec["op"]
    if op_name.startswith(("oracle:", "canary:")):
        # Oracle/canary dumps record the *category*, not a replayable op;
        # re-run the full oracle cross-check instead.
        data = bytes.fromhex(rec["input_hex"]) if rec["input_hex"] else b""
        assert fl.oracle_check(data) == []
        return
    ops = dict(fl.OPS)
    assert op_name in ops, f"unknown op {op_name!r} in {path}"
    data = bytes.fromhex(rec["input_hex"])
    fn = ops[op_name]
    impls = sorted(su.get_available_implementations())
    per_tier = {}
    try:
        for name in impls:
            su.set_active_implementation(name)
            per_tier[name] = fl._norm(fn(data))
    finally:
        su.set_active_implementation("fallback")
    vals = set(map(repr, per_tier.values()))
    assert len(vals) == 1, f"tiers diverge on {path}: {per_tier}"
