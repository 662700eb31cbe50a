"""Lane-gather compaction primitive: correctness vs NumPy."""

import numpy as np
import pytest

from simdutf_tpu.kernels.compaction import row_compact_pallas


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("shape", [(8, 128), (8, 512), (64, 512)])
def test_row_compact(seed, shape):
    rng = np.random.default_rng(seed)
    R, W = shape
    val = rng.integers(1, 1 << 20, (R, W)).astype(np.int32)
    keep = (rng.random((R, W)) < rng.choice([0.0, 0.2, 0.5, 0.9, 1.0])).astype(
        np.int32
    )
    out, cnt = row_compact_pallas(val, keep)
    out, cnt = np.asarray(out), np.asarray(cnt)
    for r in range(R):
        expect = val[r][keep[r] != 0]
        assert cnt[r] == expect.shape[0]
        assert np.array_equal(out[r, : cnt[r]], expect), (seed, r)
        assert not out[r, cnt[r]:].any()
