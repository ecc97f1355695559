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


@pytest.mark.parametrize("allow", [1, 4, 16])
def test_wide_kernel_matches_native_when_unflagged(rng, allow):
    """The integer-exact wide kernel must equal the exact-f64 native engine
    on every stream it does not flag (flags mark the only boundary ties
    where exact arithmetic cannot predict the reference's f64 rounding)."""
    scans, lens = _make_batch(rng)
    outs = approx_rle.approx_rle_wide(scans, lens, allow, interpret=True)
    n_flagged = 0
    for j, (kc, kcol, _forced, flagged) in enumerate(outs):
        assert int(kc.astype(np.int64).sum()) == int(lens[j])
        if flagged:
            n_flagged += 1
            continue
        c_counts, c_colors = native.approx_rle_encode(
            scans[j, : lens[j]], float(allow))
        assert np.array_equal(c_counts, kc), f"stream {j}"
        assert np.array_equal(c_colors, kcol), f"stream {j}"
    assert n_flagged <= 3  # boundary ties stay a small minority


def test_wide_kernel_many_streams(rng):
    """Fill a big slice of the 1024 lanes, mixed lengths."""
    B, L = 300, 520
    lens = rng.integers(1, L + 1, B).astype(np.int32)
    scans = np.zeros((B, L, 3), np.uint8)
    for j in range(B):
        scans[j, : lens[j]] = np.clip(
            rng.integers(0, 30, 3)
            + rng.integers(-2, 3, (int(lens[j]), 3)).cumsum(0), 0, 255)
    outs = approx_rle.approx_rle_wide(scans, lens, 4, interpret=True)
    n_flagged = 0
    for j, (kc, kcol, _forced, flagged) in enumerate(outs):
        assert int(kc.astype(np.int64).sum()) == int(lens[j])
        if flagged:
            n_flagged += 1
            continue
        c_counts, c_colors = native.approx_rle_encode(scans[j, : lens[j]], 4.0)
        assert np.array_equal(c_counts, kc), f"stream {j}"
        assert np.array_equal(c_colors, kcol), f"stream {j}"
    # ~5% of streams hit integer boundary ties at allow=4 (measured: 16,
    # of which 4 genuinely diverge from f64); the invariant is that every
    # UNFLAGGED stream is exact — flags just bound the stitcher's replays
    assert n_flagged <= 45


def test_wide_kernel_last_forced_marker():
    """bit 25: closed-by-stream-end vs genuine cap/reject closes."""
    scans = np.full((1, 600, 3), 9, np.uint8)
    (counts, colors, forced, _), = approx_rle.approx_rle_wide(
        scans, np.array([600], np.int32), 2, interpret=True)
    assert counts.tolist() == [255, 255, 90] and forced
    scans = np.full((1, 510, 3), 9, np.uint8)
    (counts, colors, forced, _), = approx_rle.approx_rle_wide(
        scans, np.array([510], np.int32), 2, interpret=True)
    assert counts.tolist() == [255, 255] and not forced


@pytest.mark.parametrize("kind,n", [
    ("walk", 5000), ("flat", 5000), ("rand", 3000), ("walk", 300),
    ("mixed", 7777), ("flat", 2048), ("flat", 1),
])
def test_chunked_byte_exact(rng, kind, n):
    """approx_rle_chunked (speculative 1024-chunks + seam stitching) must
    reproduce the exact-f64 native engine byte-for-byte — including runs
    crossing chunk seams (flat regions) and flagged-chunk replays."""
    if kind == "walk":
        scan = np.clip(rng.integers(0, 30, 3)
                       + rng.integers(-2, 3, (n, 3)).cumsum(0), 0, 255)
    elif kind == "flat":
        scan = np.full((n, 3), 9)
    elif kind == "rand":
        scan = rng.integers(0, 256, (n, 3))
    else:
        scan = np.clip(rng.integers(0, 30, 3)
                       + rng.integers(-1, 2, (n, 3)).cumsum(0), 0, 255)
        scan[2000:4000] = 7  # flat region crossing several chunk seams
    scan = scan.astype(np.uint8)
    for allow in (1, 4, 16):
        cc, ccol = native.approx_rle_encode(scan, float(allow))
        kc, kcol = approx_rle.approx_rle_chunked(scan, allow, chunk=1024,
                                                 interpret=True)
        assert np.array_equal(cc, kc), (kind, n, allow)
        assert np.array_equal(ccol, kcol), (kind, n, allow)


def test_codec_chunked_gate_byte_identical(rng, monkeypatch):
    """hilbert(rle(4)) under CNIIC_CHUNKED_RLE=1 produces the same wire
    bytes as the default native path."""
    from cniic_tpu.codecs import from_spec

    img = np.clip(rng.integers(0, 40, 3)
                  + rng.integers(-2, 3, (60, 77, 3)).cumsum(0), 0,
                  255).astype(np.uint8)
    codec = from_spec("hilbert(rle(4))")
    base = codec.encode(img)
    monkeypatch.setenv("CNIIC_CHUNKED_RLE", "1")
    assert codec.encode(img) == base


def test_chunked_byte_exact_through_flagged_chunks(rng):
    """Force the stitcher's flagged-chunk replay path with a crafted
    boundary tie: after the run (3,3,3),(3,3,2),(4,4,3) [sums (10,10,8),
    count 3], pixel (2,2,2) gives dist2 = 4^2+4^2+2^2 = 36 == (allow*c)^2
    at allow=2 with all three averages f64-inexact (10/3, 10/3, 8/3) —
    exactly the ambiguity the kernel must flag. The stitch must stay
    byte-exact through the flagged chunk's replay."""
    n = 2048
    scan = rng.integers(40, 240, (n, 3)).astype(np.uint8)
    tie = np.array([[3, 3, 3], [3, 3, 2], [4, 4, 3], [2, 2, 2]], np.uint8)
    scan[700:704] = tie  # inside chunk 1 at chunk=512
    chunks = np.stack([scan[i * 512 : (i + 1) * 512] for i in range(4)])
    spec = approx_rle.approx_rle_wide(chunks, np.full(4, 512, np.int64), 2,
                                      interpret=True)
    assert spec[1][3], "the crafted tie must flag its chunk"
    cc, ccol = native.approx_rle_encode(scan, 2.0)
    kc, kcol = approx_rle.approx_rle_chunked(scan, 2, chunk=512,
                                             interpret=True)
    assert np.array_equal(cc, kc) and np.array_equal(ccol, kcol)


def test_wide_kernel_rejects_allow_beyond_clamp_bound(rng):
    """ADVICE r3: the wide kernel's ICL=16384 clamp only preserves
    accept/reject decisions for allow <= 64 (the native fast-path bound);
    larger allowances must raise, and the chunked stitcher must fall back
    to the exact-f64 native engine instead of silently diverging."""
    scan = rng.integers(0, 256, (3000, 3)).astype(np.uint8)
    with pytest.raises(ValueError):
        approx_rle.approx_rle_wide(scan[None], np.array([3000]), 65,
                                   interpret=True)
    for allow in (65, 100, 200):
        cc, ccol = native.approx_rle_encode(scan, float(allow))
        kc, kcol = approx_rle.approx_rle_chunked(scan, allow, chunk=1024,
                                                 interpret=True)
        assert np.array_equal(cc, kc) and np.array_equal(ccol, kcol), allow
