"""Direct pins for the r4 C helpers (rle_records_frame, palette_gather,
gather_i32) — layout and semantics, independent of the codec round-trips
that also exercise them."""

import numpy as np
import pytest

from cniic_tpu import native


def test_rle_records_frame_layout(rng):
    counts = rng.integers(1, 256, 1000).astype(np.uint8)
    colors = rng.integers(0, 256, (1000, 3)).astype(np.uint8)
    out = np.frombuffer(native.rle_records_frame(counts, colors),
                        dtype=np.uint8).reshape(-1, 12)
    # record: u8 count + 11-byte Rgb (u64 LE len=3 + payload)
    assert np.array_equal(out[:, 0], counts)
    assert (out[:, 1] == 3).all() and (out[:, 2:9] == 0).all()
    assert np.array_equal(out[:, 9:], colors)


def test_rle_records_frame_mismatch_rejected():
    with pytest.raises(ValueError):
        native.rle_records_frame(np.zeros(3, np.uint8),
                                 np.zeros((2, 3), np.uint8))


def test_palette_gather_matches_numpy(rng):
    colors = rng.integers(0, 256, (300, 3)).astype(np.uint8)
    ids = rng.integers(0, 300, 10_000).astype(np.int32)
    assert np.array_equal(native.palette_gather(ids, colors), colors[ids])


def test_gather_i32_matches_numpy(rng):
    table = rng.integers(-2**31, 2**31 - 1, 500).astype(np.int32)
    idx = rng.integers(0, 500, 10_000).astype(np.int32)
    assert np.array_equal(native.gather_i32(idx, table), table[idx])


def test_gathers_empty():
    assert native.palette_gather(np.zeros(0, np.int32),
                                 np.zeros((1, 3), np.uint8)).shape == (0, 3)
    assert native.gather_i32(np.zeros(0, np.int32),
                             np.zeros(1, np.int32)).size == 0
    assert native.rle_records_frame(np.zeros(0, np.uint8),
                                    np.zeros((0, 3), np.uint8)) == b""


def test_mse_sum_u8_matches_numpy(rng):
    # several sizes incl. odd tails (the C loop has no alignment
    # assumptions, but pin it anyway) and the saturation extremes
    for n in (1, 7, 1000, 12_345):
        a = rng.integers(0, 256, n).astype(np.uint8)
        b = rng.integers(0, 256, n).astype(np.uint8)
        ref = int(((a.astype(np.int64) - b.astype(np.int64)) ** 2).sum())
        assert native.mse_sum_u8(a, b) == ref
    full = native.mse_sum_u8(np.zeros(513, np.uint8),
                             np.full(513, 255, np.uint8))
    assert full == 513 * 255 * 255
    assert native.mse_sum_u8(np.empty(0, np.uint8),
                             np.empty(0, np.uint8)) == 0


def test_mse_sum_u8_mismatch_rejected():
    with pytest.raises(ValueError):
        native.mse_sum_u8(np.zeros(3, np.uint8), np.zeros(4, np.uint8))


def test_compute_error_native_matches_numpy_chain(rng):
    # runner.compute_error dispatches u8/same-shape pairs to the C kernel;
    # pin that the result is bit-identical to the numpy float64 chain it
    # replaced (every squared diff is an exactly-representable integer)
    from cniic_tpu.runner import compute_error
    x = rng.integers(0, 256, (33, 47, 3)).astype(np.uint8)
    y = rng.integers(0, 256, (33, 47, 3)).astype(np.uint8)
    d = x.astype(np.int64) - y.astype(np.int64)
    ref = float((d.astype(np.float64) ** 2).sum()) / (33 * 47)
    assert compute_error(x, y) == ref
    assert compute_error(x, x) == 0.0


def test_delta_keys_gather_matches_composition(rng):
    # fused curve-gather + diff + pack == delta_keys(gather_rgb(...)),
    # every shape class (odd dims, single pixel)
    from cniic_tpu import hilbert
    for (h, w) in ((1, 1), (3, 5), (64, 64), (100, 37)):
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        perm = hilbert.scan_indices(w, h)
        ref = native.delta_keys(native.gather_rgb(img.reshape(-1, 3), perm))
        got = native.delta_keys_gather(img.reshape(-1, 3), perm)
        assert np.array_equal(ref, got)
    with pytest.raises(ValueError):
        native.delta_keys_gather(np.zeros((4, 3), np.uint8),
                                 np.zeros(5, np.int64))


def test_delta_hist_gather_matches_composition(rng):
    # fused gather+diff+histogram == hist_u32(delta_keys(gather(...)))
    # in BOTH regimes: smooth content stays in the hash tiers, uniform
    # noise at 256x256 (~tens of thousands of distinct diff keys on the
    # sample) exercises the materialize-then-radix fallback
    from cniic_tpu import hilbert
    smooth = (np.cumsum(rng.integers(-2, 3, (100, 37, 3)), axis=1)
              % 256).astype(np.uint8)
    noisy = rng.integers(0, 256, (256, 256, 3)).astype(np.uint8)
    for img in (smooth, noisy):
        h, w = img.shape[:2]
        perm = hilbert.scan_indices(w, h)
        keys = native.delta_keys(native.gather_rgb(img.reshape(-1, 3), perm))
        ref = native.hist_u32(keys)
        got = native.delta_hist_gather(img.reshape(-1, 3), perm)
        for a, b in zip(ref, got):
            assert np.array_equal(a, b)
    # inverse reconstructs the key stream exactly
    uniq, counts, inverse = got
    assert np.array_equal(uniq[inverse], keys)
    assert counts.sum() == keys.size
