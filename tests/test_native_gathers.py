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
