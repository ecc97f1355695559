"""RLE semantics: exact segmented pass and the approximate running average."""

import numpy as np

from cniic_tpu import native
from cniic_tpu.ops import rle


def test_exact_rle_basic():
    scan = np.array([[1, 1, 1]] * 3 + [[2, 2, 2]] * 1 + [[1, 1, 1]] * 2, np.uint8)
    counts, colors = rle.rle_exact(scan)
    assert counts.tolist() == [3, 1, 2]
    assert colors.tolist() == [[1, 1, 1], [2, 2, 2], [1, 1, 1]]
    assert np.array_equal(rle.rle_expand(counts, colors), scan)


def test_exact_rle_255_cap():
    # run of 600 -> 255, 255, 90 (hilbertc.rs:127-143)
    scan = np.repeat(np.array([[9, 9, 9]], np.uint8), 600, axis=0)
    counts, colors = rle.rle_exact(scan)
    assert counts.tolist() == [255, 255, 90]
    scan2 = np.repeat(np.array([[9, 9, 9]], np.uint8), 510, axis=0)
    counts, _ = rle.rle_exact(scan2)
    assert counts.tolist() == [255, 255]


def test_exact_rle_empty():
    counts, colors = rle.rle_exact(np.zeros((0, 3), np.uint8))
    assert counts.size == 0 and colors.shape == (0, 3)


def _approx_model(pixels, allow):
    """Literal Python port of the reference recurrence (hilbertc.rs:200-285)."""
    out = []
    i = 0
    n = len(pixels)
    while i < n:
        s = [float(v) for v in pixels[i]]
        count = 1
        i += 1
        while i < n and count < 255:
            avg = [x / count for x in s]
            d = sum((a - float(p)) ** 2 for a, p in zip(avg, pixels[i])) ** 0.5
            if d <= allow:
                for c in range(3):
                    s[c] += float(pixels[i][c])
                count += 1
                i += 1
            else:
                break
        # f64 round = half away from zero; values are nonneg
        color = [int(np.floor(x / count + 0.5)) for x in s]
        out.append((count, color))
    return out


def test_approx_rle_matches_model(rng):
    pixels = rng.integers(0, 30, (5000, 3)).astype(np.uint8)
    for allow in (0.5, 2.0, 8.0):
        counts, colors = native.approx_rle_encode(pixels, allow)
        model = _approx_model(pixels.tolist(), allow)
        assert counts.tolist() == [c for c, _ in model]
        assert colors.tolist() == [col for _, col in model]


def test_approx_rle_exact_run_cap():
    pixels = np.repeat(np.array([[5, 5, 5]], np.uint8), 300, axis=0)
    counts, colors = native.approx_rle_encode(pixels, 1.0)
    assert counts.tolist() == [255, 45]
    assert colors.tolist() == [[5, 5, 5], [5, 5, 5]]


def test_native_rle_frame_matches_oracle():
    """The fused C RLE+framing pass must emit byte-identical records to the
    vectorized rle_exact + _records_to_bytes pipeline (incl. the 255-cap)."""
    from cniic_tpu import native
    from cniic_tpu.codecs.hilbertc import _records_to_bytes

    rng = np.random.default_rng(42)
    cases = [
        rng.integers(0, 4, (5000, 3)).astype(np.uint8),
        rng.integers(0, 256, (3000, 3)).astype(np.uint8),
        np.zeros((70000, 3), np.uint8),
        np.zeros((0, 3), np.uint8),
        np.repeat(np.array([[9, 8, 7]], np.uint8), 255, axis=0),
        np.repeat(np.array([[9, 8, 7]], np.uint8), 510, axis=0),
        np.repeat(np.array([[9, 8, 7]], np.uint8), 511, axis=0),
        np.repeat(rng.integers(0, 3, (200, 3)).astype(np.uint8),
                  rng.integers(1, 700, 200), axis=0),
    ]
    for scan in cases:
        counts, colors = rle.rle_exact(scan)
        assert _records_to_bytes(counts, colors) == native.rle_frame(scan)


def test_native_rle_frame_gather_matches_unfused():
    """rle_frame_gather (curve gather + u32-compare RLE + framing + header
    in one C pass, the r5 hilbert-rle encode path) must be byte-identical to
    rle_frame(gather_rgb(...)) on every permutation and content class,
    including the sentinel edge (a run ending at the last pixel with R=255,
    where the internal sentinel byte wraps)."""
    rng = np.random.default_rng(11)
    cases = [
        rng.integers(0, 4, (5000, 3)).astype(np.uint8),
        rng.integers(0, 256, (3000, 3)).astype(np.uint8),
        np.full((700, 3), 255, np.uint8),  # sentinel wrap edge
        np.zeros((1, 3), np.uint8),
        np.repeat(np.array([[9, 8, 7]], np.uint8), 511, axis=0),
    ]
    for flat in cases:
        n = flat.shape[0]
        perm = rng.permutation(n).astype(np.int64)
        want = b"HD" + native.rle_frame(native.gather_rgb(flat, perm))
        got = native.rle_frame_gather(flat, perm, prefix=b"HD")
        assert got == want
    # out-of-range permutation is rejected, not read
    import pytest
    with pytest.raises(ValueError):
        native.rle_frame_gather(cases[0], np.array([0, 5000], np.int64))
