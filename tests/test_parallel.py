"""Multi-device (8 virtual CPU devices) sharding tests: global results must
match the single-buffer oracle bit-for-bit, including first-error positions
across shard boundaries (the reference's trim_partial + threaded.cpp model
lifted to a device mesh)."""

import numpy as np
import pytest

import helpers
import oracle
from simdutf_tpu.parallel import (
    make_mesh,
    plan_shards,
    transcode_utf8_to_utf16_sharded,
    validate_utf8_sharded,
)
from simdutf_tpu.parallel.distributed import gather_utf16

import jax

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple (virtual) devices"
)


def _mesh():
    return make_mesh(len(jax.devices()))


def test_plan_shards_boundaries():
    # a corpus of 3-byte chars: cuts must land on multiples of 3
    data = ("語" * 1000).encode()
    plan = plan_shards(data, 8)
    assert plan.total == len(data)
    for off in plan.offsets:
        assert int(off) % 3 == 0
    # every shard individually valid
    for i in range(8):
        assert oracle.validate_utf8(
            plan.shards[i, : plan.lengths[i]].tobytes()
        )
    # reassembly identity
    joined = b"".join(
        plan.shards[i, : plan.lengths[i]].tobytes() for i in range(8)
    )
    assert joined == data


@pytest.mark.parametrize("seed", range(6))
def test_sharded_validate_valid(seed):
    data = helpers.random_utf8(seed, 5000, 3, 2, 2, 1)
    plan = plan_shards(data, len(jax.devices()))
    code, pos = validate_utf8_sharded(plan, _mesh())
    assert code == 0 and pos == len(data)


@pytest.mark.parametrize("seed", range(10))
def test_sharded_validate_error_position(seed):
    data = bytearray(helpers.random_utf8(seed, 5000, 3, 2, 2, 1))
    # corrupt one byte somewhere (including near shard boundaries)
    n = len(data)
    spots = [n // 8 * k + (seed % 5) - 2 for k in range(1, 8)] + [
        seed * 997 % n
    ]
    for spot in spots:
        mutated = bytearray(data)
        mutated[spot % n] = 0xFF
        mb = bytes(mutated)
        expect = oracle.validate_utf8_with_errors(mb)
        plan = plan_shards(mb, len(jax.devices()))
        code, pos = validate_utf8_sharded(plan, _mesh())
        assert (code == 0) == expect.is_ok
        if not expect.is_ok:
            assert (code, pos) == (int(expect.error), expect.count), mb.hex()


@pytest.mark.parametrize("seed", range(5))
def test_sharded_transcode(seed):
    data = helpers.random_utf8(seed + 50, 4000, 2, 1, 2, 1)
    plan = plan_shards(data, len(jax.devices()))
    code, total, outs, out_lens = transcode_utf8_to_utf16_sharded(plan, _mesh())
    assert code == 0
    res, expect = oracle.convert_utf8_to_utf16_with_errors(data, False)
    assert total == res.count
    got = gather_utf16(outs, out_lens).tobytes()
    assert got == expect


def test_sharded_transcode_error():
    data = bytearray(helpers.random_utf8(7, 4000, 2, 1, 2, 1))
    data[len(data) // 2] = 0x80  # stray continuation mid-corpus
    mb = bytes(data)
    expect = oracle.validate_utf8_with_errors(mb)
    plan = plan_shards(mb, len(jax.devices()))
    code, pos, _, _ = transcode_utf8_to_utf16_sharded(plan, _mesh())
    assert (code, pos) == (int(expect.error), expect.count)
