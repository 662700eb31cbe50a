"""The public API is thread-safe (stateless + per-thread staging pools),
matching the reference's concurrency posture (README.md:2343-2347)."""

from concurrent.futures import ThreadPoolExecutor

import pytest

import helpers
import oracle
import simdutf_tpu as su


@pytest.mark.parametrize("tier", ["fallback", "xla", "cnative"])
def test_concurrent_calls_agree(tier):
    if tier not in su.get_available_implementations():
        pytest.skip(tier)
    su.set_active_implementation(tier)
    inputs = [helpers.random_utf8(s, 400, 2, 1, 1, 1) for s in range(8)]
    inputs += [helpers.mutate(i, 1, 2) for i in inputs]
    expected = [oracle.validate_utf8_with_errors(d) for d in inputs]

    def work(k):
        d = inputs[k % len(inputs)]
        r = su.validate_utf8_with_errors(d)
        o = su.convert_utf8_to_utf16le(d)
        return r, o

    with ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(work, range(64)))
    su.set_active_implementation("fallback")
    for k, (r, o) in enumerate(results):
        d = inputs[k % len(inputs)]
        assert r == expected[k % len(inputs)]
        exp = oracle.convert_utf8_to_utf16_with_errors(d, False)
        assert o == (exp[1] if exp[0].is_ok else b"")


def test_oversize_input_raises():
    import numpy as np

    class Fake:
        pass

    # don't allocate 2GB; simulate via the checker directly
    from simdutf_tpu.buffers import _check_size, MAX_SINGLE_CALL_BYTES

    _check_size(MAX_SINGLE_CALL_BYTES)
    with pytest.raises(ValueError, match="plan_shards"):
        _check_size(MAX_SINGLE_CALL_BYTES + 1)
