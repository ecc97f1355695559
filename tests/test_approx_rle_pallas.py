"""Lane-parallel Pallas approximate RLE vs the exact native recurrence."""

import numpy as np
import pytest

from cniic_tpu import native
from cniic_tpu.ops import approx_rle


def _make_batch(rng):
    B, L = 6, 3000
    lens = np.array([3000, 2999, 1, 700, 255 * 4, 2500], np.int32)
    scans = np.zeros((B, L, 3), np.uint8)
    for j in range(B):
        base = rng.integers(0, 25, 3)
        walk = rng.integers(-2, 3, (int(lens[j]), 3)).cumsum(0)
        scans[j, : lens[j]] = np.clip(base + walk, 0, 255)
    scans[5, : lens[5]] = rng.integers(0, 256, (int(lens[5]), 3))
    return scans, lens


@pytest.mark.parametrize("allow", [1.0, 4.0, 16.0])
def test_matches_native_engine(rng, allow):
    scans, lens = _make_batch(rng)
    outs = approx_rle.approx_rle_batch(scans, lens, allow, interpret=True)
    for j in range(scans.shape[0]):
        c_counts, c_colors = native.approx_rle_encode(scans[j, : lens[j]], allow)
        k_counts, k_colors = outs[j]
        assert int(k_counts.astype(np.int64).sum()) == int(lens[j])
        assert np.array_equal(c_counts, k_counts), f"lane {j}"
        assert np.array_equal(c_colors, k_colors), f"lane {j}"


def test_run_cap_and_flush(rng):
    # flat stream: runs of exactly 255 + remainder, flushed at stream end
    scans = np.full((1, 600, 3), 9, np.uint8)
    lens = np.array([600], np.int32)
    (counts, colors), = approx_rle.approx_rle_batch(scans, lens, 2.0, interpret=True)
    assert counts.tolist() == [255, 255, 90]
    assert (colors == 9).all()
