"""End-to-end codec round trips and wire-level format checks."""

import time

import numpy as np
import pytest

from cniic_tpu import wire
from cniic_tpu.codecs import from_spec
from cniic_tpu.runner import compute_error

LOSSLESS = ["hufman", "zip(dict)", "zip(back)", "hilbert(rle)", "hilbert(zip)", "delta"]
LOSSY = ["hilbert(rle(4))", "cluster-colors(16)", "voronoi(32)"]


@pytest.mark.parametrize("spec", LOSSLESS)
def test_lossless_roundtrip(spec, test_image):
    codec = from_spec(spec)
    data = codec.encode(test_image)
    dec = codec.decode(data)
    assert np.array_equal(dec, test_image), spec


@pytest.mark.parametrize("spec", LOSSLESS)
@pytest.mark.parametrize("shape", [(1, 1), (1, 17), (16, 1), (3, 3), (37, 2)])
def test_lossless_odd_shapes(spec, shape, rng):
    img = rng.integers(0, 256, (*shape, 3)).astype(np.uint8)
    codec = from_spec(spec)
    assert np.array_equal(codec.decode(codec.encode(img)), img), (spec, shape)


@pytest.mark.parametrize("spec", LOSSY)
def test_lossy_roundtrip_shape_and_error(spec, test_image):
    codec = from_spec(spec)
    dec = codec.decode(codec.encode(test_image))
    assert dec.shape == test_image.shape
    assert compute_error(test_image, dec) > 0


def test_hufman_header_and_flat_image():
    img = np.full((4, 6, 3), 7, np.uint8)
    codec = from_spec("hufman")
    data = codec.encode(img)
    # header: w=6, h=4 LE u32s, then single-leaf tree (tag 0 + 11-byte Rgb)
    assert data[:8] == wire.pack_dims(6, 4)
    assert data[8] == 0
    assert data[9:20] == wire.pack_rgb(7, 7, 7)
    assert len(data) == 20  # zero payload bits for a 1-symbol alphabet
    assert np.array_equal(codec.decode(data), img)


def test_hilbert_rle_flat_image_record_format():
    img = np.full((16, 16, 3), 9, np.uint8)  # 256 pixels -> runs 255 + 1
    codec = from_spec("hilbert(rle)")
    data = codec.encode(img)
    assert data[:8] == wire.pack_dims(16, 16)
    body = data[8:]
    assert len(body) == 2 * 12
    assert body[0] == 255 and body[1:12] == wire.pack_rgb(9, 9, 9)
    assert body[12] == 1
    assert np.array_equal(codec.decode(data), img)


def test_delta_flat_image_small():
    img = np.full((8, 8, 3), 100, np.uint8)
    codec = from_spec("delta")
    data = codec.encode(img)
    dec = codec.decode(data)
    assert np.array_equal(dec, img)
    # alphabet = {(100,100,100) once, (0,0,0) x63}: tree = 3 nodes
    # 8B dims + (1+6)*2 leaves + 1 branch tag + 64 bits payload = 8+15+8
    assert len(data) == 8 + 15 + 8


def test_voronoi_wire_format(test_image):
    codec = from_spec("voronoi(8)")
    data = codec.encode(test_image)
    r = wire.ByteReader(data)
    w, h = r.dims()
    assert (w, h) == (test_image.shape[1], test_image.shape[0])
    k = r.u64()
    assert k == 8
    assert r.remaining() == 8 * 19  # 19 bytes per centroid
    for _ in range(8):
        x = r.u32()
        y = r.u32()
        rgb = r.rgb()
        assert 0 <= x < w and 0 <= y < h


def test_voronoi_decode_semantics():
    """Decode is position-only nearest centroid under wrapping-u32 ops
    (clusterc.rs:180-186). Modular squaring makes the wrapped distance equal
    the plain squared distance, so the quirk reduces to: COLOR IS IGNORED.
    Verify both the distance behavior and the mod-2^32 equivalence."""
    from cniic_tpu.ops import voronoi

    xy = np.array([[0, 0], [3, 3]], np.uint32)
    colors = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
    out = voronoi.reconstruct(xy, colors, 4, 4)
    # plain 2-D nearest: (1,1) -> A (d2=2 vs 8); (2,2) -> B (d2=8 vs 2)
    assert out[1, 1].tolist() == [255, 0, 0]
    assert out[2, 2].tolist() == [0, 255, 0]
    assert out[0, 0].tolist() == [255, 0, 0]
    assert out[3, 3].tolist() == [0, 255, 0]
    # tie (1,2)/(2,1): d2 = 5 both -> first centroid wins (min_by_key)
    assert out[2, 1].tolist() == [255, 0, 0]
    assert out[1, 2].tolist() == [255, 0, 0]

    # numpy model of the exact wrapping expression equals plain distance
    x, y = np.uint32(2), np.uint32(2)
    cx, cy = np.uint32(0), np.uint32(0)
    with np.errstate(over="ignore"):
        wrapped = (cx - x) * (cx - x) + (cy - y) * (cy - y)
    assert int(wrapped) == 8


def test_cluster_colors_decodes_via_hufman(test_image):
    cc = from_spec("cluster-colors(8)")
    data = cc.encode(test_image)
    huf = from_spec("hufman")
    a = cc.decode(data)
    b = huf.decode(data)
    assert np.array_equal(a, b)
    # at most 8 distinct colors in the reconstruction
    flat = a.reshape(-1, 3)
    assert np.unique(flat, axis=0).shape[0] <= 8


def test_zip_frames_dims_inside_stream(test_image):
    codec = from_spec("zip(dict)")
    data = codec.encode(test_image)
    from cniic_tpu import native

    raw = native.zip_dict_decode(bytes(data))
    h, w = test_image.shape[:2]
    assert raw[:8] == wire.pack_dims(w, h)
    assert len(raw) == 8 + w * h * 11


def test_hilbert_zip_frames_dims_outside(test_image):
    codec = from_spec("hilbert(zip)")
    data = codec.encode(test_image)
    h, w = test_image.shape[:2]
    assert data[:8] == wire.pack_dims(w, h)


def test_encode_batch_matches_sequential(rng, test_image, monkeypatch):
    monkeypatch.setenv("CNIIC_PALLAS_RLE", "1")  # exercise the Pallas path
    imgs = [test_image, test_image[:17, :23].copy(),
            rng.integers(0, 256, (9, 31, 3)).astype(np.uint8)]
    for spec in ["hilbert(rle(4))", "hufman", "delta", "hilbert(rle)"]:
        codec = from_spec(spec)
        batch = codec.encode_batch(imgs)
        seq = [codec.encode(im) for im in imgs]
        assert batch == seq, spec


@pytest.mark.parametrize("spec", ["hufman", "delta", "hilbert(rle)", "zip(dict)", "voronoi(4)"])
def test_decode_rejects_truncated_stream(spec, test_image):
    codec = from_spec(spec)
    data = codec.encode(test_image)
    with pytest.raises(Exception):
        codec.decode(data[: len(data) // 3])


def test_rle_decode_rejects_garbage():
    codec = from_spec("hilbert(rle)")
    with pytest.raises(Exception):
        codec.decode(wire.pack_dims(4, 4) + b"\x01\x02\x03")


def test_cluster_colors_stream_matches_hufman_of_reduced(test_image):
    """The direct-from-palette Huffman stream must be byte-identical to
    Hufman-encoding the reduced image (clusterc.rs:43-52 semantics)."""
    from cniic_tpu.codecs.hufman import Hufman
    from cniic_tpu.codecs.base import pixels_row_major
    from cniic_tpu.ops import histogram, kmeans

    cc = from_spec("cluster-colors(8)")
    data = cc.encode(test_image)

    pixels = pixels_row_major(test_image)
    colors, counts, inverse = histogram.color_histogram(pixels)
    centroids, assignment, _ = kmeans.kmeans(
        colors.astype(np.int64), 8, weights=counts.astype(np.int64))
    reduced = centroids.astype(np.uint8)[assignment][inverse].reshape(test_image.shape)
    assert data == Hufman().encode(reduced)


def test_cluster_colors_drops_empty_cluster_leaves(test_image, monkeypatch):
    """A cluster left empty at loop exit must not leave a zero-frequency
    leaf in the Huffman tree (ADVICE.md r1): the stream must still be
    byte-identical to Hufman-encoding the reduced image."""
    from cniic_tpu.codecs.base import pixels_row_major
    from cniic_tpu.codecs.hufman import Hufman
    from cniic_tpu.ops import histogram, kmeans

    pixels = pixels_row_major(test_image)
    colors, counts, _ = histogram.color_histogram(pixels)
    n_colors = colors.shape[0]
    # crafted result: cluster 2 is empty, its centroid color is unique
    fake_cents = np.array([[10, 10, 10], [200, 200, 200], [7, 99, 7]], np.int64)
    fake_assign = np.where(np.arange(n_colors) % 2 == 0, 0, 1).astype(np.int32)
    monkeypatch.setattr(kmeans, "kmeans",
                        lambda *a, **k: (fake_cents, fake_assign, 1))
    cc = from_spec("cluster-colors(3)")
    data = cc.encode(test_image)

    _, _, inverse = histogram.color_histogram(pixels)
    reduced = fake_cents.astype(np.uint8)[fake_assign][inverse].reshape(test_image.shape)
    assert data == Hufman().encode(reduced)
    # the empty cluster's leaf record (tag 0 + 11-byte Rgb wire) is gone
    ghost_leaf = b"\x00" + (3).to_bytes(8, "little") + bytes([7, 99, 7])
    assert ghost_leaf not in data


@pytest.mark.parametrize("spec", ["cluster-colors(8)", "voronoi(16)"])
def test_kmeans_codec_batch_matches_single(spec, rng):
    """encode_batch must produce byte-identical streams to per-image encode:
    lanes freeze independently in the lockstep device loop, so batching an
    image with a slower-converging neighbour must not change its result.
    Mixed shapes exercise the voronoi shape bucketing and the cluster-colors
    padding/masking."""
    imgs = [
        rng.integers(0, 256, (24, 32, 3)).astype(np.uint8),
        rng.integers(0, 256, (40, 40, 3)).astype(np.uint8),
        rng.integers(0, 256, (24, 32, 3)).astype(np.uint8),
    ]
    codec = from_spec(spec)
    batched = codec.encode_batch(imgs)
    singles = [codec.encode(im) for im in imgs]
    assert batched == singles


def test_voronoi_decode_batch_matches_single(rng):
    codec = from_spec("voronoi(8)")
    imgs = [rng.integers(0, 256, (24, 32, 3)).astype(np.uint8) for _ in range(3)]
    imgs.append(rng.integers(0, 256, (16, 16, 3)).astype(np.uint8))
    blobs = codec.encode_batch(imgs)
    batched = codec.decode_batch(blobs)
    singles = [codec.decode(b) for b in blobs]
    for b, s in zip(batched, singles):
        np.testing.assert_array_equal(b, s)


@pytest.mark.parametrize("spec", ["zip(dict)", "zip(back)", "hufman", "delta",
                                  "hilbert(rle)", "hilbert(zip)",
                                  "cluster-colors(4)", "voronoi(4)"])
def test_decode_survives_fuzz(spec, rng):
    """Arbitrary bytes fed to decode must raise a clean Python error (or
    decode to something) — never crash the process. Exercises the C
    decoders' bounds checks and the wire readers."""
    codec = from_spec(spec)
    img = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    good = bytearray(codec.encode(img))
    cases = [b"", b"\x00", bytes(rng.integers(0, 256, 64, dtype=np.uint8))]
    # truncations and single-byte corruptions of a real stream
    cases += [bytes(good[:n]) for n in (1, 7, 9, len(good) // 2)]
    for pos in range(0, len(good), max(len(good) // 7, 1)):
        bad = bytearray(good)
        bad[pos] ^= 0x5A
        cases.append(bytes(bad))
    for data in cases:
        # the contract: either a clean exception or a real image array —
        # the assert must live OUTSIDE the try or the except swallows it
        # (review r4; tests/test_fuzz_decode.py is the structured harness)
        try:
            out = codec.decode(data)
        except Exception:
            continue  # clean failure is fine; crashing the process is not
        assert isinstance(out, np.ndarray) and out.dtype == np.uint8


def test_kmeans_codecs_reject_too_few_points(rng):
    """Fewer pixels/colors than clusters must raise cleanly (the runner's
    per-image continue-on-error is the analog of the reference's panic)."""
    tiny = rng.integers(0, 256, (2, 2, 3)).astype(np.uint8)
    with pytest.raises(ValueError):
        from_spec("voronoi(8)").encode(tiny)
    flat = np.zeros((8, 8, 3), np.uint8)  # one unique color, k=4
    with pytest.raises(ValueError):
        from_spec("cluster-colors(4)").encode(flat)


@pytest.mark.parametrize("shape", [(1, 33), (33, 1), (2, 2), (5, 129)])
def test_lossy_degenerate_shapes(shape, rng):
    img = rng.integers(0, 256, (*shape, 3)).astype(np.uint8)
    for spec in ("voronoi(2)", "cluster-colors(2)", "hilbert(rle(4))"):
        codec = from_spec(spec)
        dec = codec.decode(codec.encode(img))
        assert dec.shape == img.shape, (spec, shape)


def test_voronoi_decode_mse_batch_matches_plain(rng):
    """The fused device decode+MSE path (VERDICT r2 #6) must reproduce both
    the decode_batch images and compute_error bit-for-bit, including mixed
    shape buckets."""
    codec = from_spec("voronoi(8)")
    imgs = [rng.integers(0, 256, (32, 48, 3)).astype(np.uint8),
            rng.integers(0, 256, (40, 24, 3)).astype(np.uint8),
            rng.integers(0, 256, (32, 48, 3)).astype(np.uint8)]
    blobs = codec.encode_batch(imgs)
    plain = codec.decode_batch(blobs)
    mses, fetch = codec.decode_mse_batch(blobs, imgs)
    fetched = fetch()
    for im, dec, f, mse in zip(imgs, plain, fetched, mses):
        np.testing.assert_array_equal(dec, f)
        assert mse == compute_error(im, dec)


def test_runner_uses_fused_voronoi_path(tmp_path, rng):
    """The batched runner rides decode_mse_batch and still writes the
    decoded PNG per lossy image (bench.rs:50-56 protocol)."""
    import os

    from cniic_tpu import runner

    paths = []
    for i in range(2):
        img = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
        p = tmp_path / f"im{i}.png"
        from cniic_tpu import image_io
        image_io.save_png(img, str(p))
        paths.append(str(p))
    res = runner.measure_all(from_spec("voronoi(8)"), paths,
                             output_dir=str(tmp_path / "out"),
                             verbose=False, batch=2)
    assert len(res.rows) == 2 and not res.failures
    for i in range(2):
        assert os.path.exists(tmp_path / "out" / f"im{i}.png")
    # MSE recorded equals the host recomputation on the saved image
    for p, row in zip(paths, res.rows):
        img = image_io.load_image(p)
        stem = os.path.splitext(os.path.basename(p))[0]
        dec = image_io.load_image(str(tmp_path / "out" / f"{stem}.png"))
        assert row[3] == compute_error(img, dec)


def test_runner_fused_path_isolates_failed_lanes(tmp_path, rng):
    """A voronoi image failing the k-means validation must not break the
    fused decode+MSE path for the surviving images (runner blast radius)."""
    import os

    from cniic_tpu import image_io, runner

    good = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
    tiny = rng.integers(0, 256, (2, 2, 3)).astype(np.uint8)  # n < k
    paths = []
    for i, img in enumerate([good, tiny, good]):
        p = tmp_path / f"im{i}.png"
        image_io.save_png(img, str(p))
        paths.append(str(p))
    res = runner.measure_all(from_spec("voronoi(8)"), paths,
                             output_dir=str(tmp_path / "out"),
                             verbose=False, batch=3)
    assert len(res.rows) == 2
    assert len(res.failures) == 1 and "im1" in res.failures[0][0]
    assert os.path.exists(tmp_path / "out" / "im0.png")
    assert os.path.exists(tmp_path / "out" / "im2.png")


def test_fused_rle_decode_error_paths(rng):
    """The fused C RLE decode (VERDICT r3 #3b) must reject corrupt
    prefixes, partial records and short streams as WireError."""
    from cniic_tpu import wire
    from cniic_tpu.codecs import from_spec

    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    codec = from_spec("hilbert(rle)")
    blob = bytearray(codec.encode(img))
    with pytest.raises(wire.WireError):
        codec.decode(bytes(blob[:-5]))  # partial record
    bad = bytearray(blob)
    bad[8 + 3] ^= 0xFF  # corrupt a record's Rgb length prefix
    with pytest.raises(wire.WireError):
        codec.decode(bytes(bad))
    with pytest.raises(wire.WireError):
        codec.decode(bytes(blob[:8] + blob[8:8 + 12]))  # too few pixels


def test_fused_delta_decode_range_check(rng):
    """The fused C delta decode (VERDICT r3 #3a) must reject streams whose
    running sums leave [0, 255]."""
    from cniic_tpu import hilbert, native, wire
    from cniic_tpu.codecs import from_spec

    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    codec = from_spec("delta")
    assert np.array_equal(codec.decode(codec.encode(img)), img)

    # hand-built: one leaf with diff -1 -> first pixel underflows
    leaf = np.frombuffer(np.array([-1, 0, 0], np.int16).tobytes(),
                         np.uint8).reshape(1, 6)
    with pytest.raises(ValueError):
        native.delta_unpack(leaf, np.zeros(4, np.int32),
                            np.arange(4, dtype=np.int64))
    # id out of range
    with pytest.raises(ValueError):
        native.delta_unpack(leaf, np.array([1], np.int32),
                            np.zeros(1, np.int64))


def test_voronoi_zero_centroid_stream_rejected():
    """A centroid count of 0 is malformed: no encoder produces it (the
    k-means floor rejects k < 1) and the reference's min_by_key over an
    empty centroid set panics (clusterc.rs:143-297) — decode must raise
    WireError instead of fabricating an all-black image (review r5)."""
    codec = from_spec("voronoi(8)")
    blob = wire.pack_dims(6, 4) + wire.pack_u64(0)
    with pytest.raises(wire.WireError):
        codec.decode(blob)


def test_kmeans_codecs_reject_k_zero(rng):
    """voronoi(0) / cluster-colors(0) parse (the grammar accepts any \\d+,
    prs.rs parity) but must fail encode with the clean per-lane ValueError
    every other infeasible k produces — not a ZeroDivisionError escaping
    collect-mode isolation (review r5)."""
    img = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    for spec in ("voronoi(0)", "cluster-colors(0)"):
        codec = from_spec(spec)
        with pytest.raises(ValueError):
            codec.encode(img)
        lanes = codec.encode_batch([img, img])
        assert all(isinstance(b, ValueError) for b in lanes)


def test_runner_survives_fused_fetch_failure(tmp_path, rng):
    """A failure in the fused path's untimed decoded-image fetch must not
    abort the run: rows fall back to per-image decode (bench.rs:78
    continue-on-error; review r5)."""
    import os

    from cniic_tpu import image_io, runner

    paths = []
    for i in range(2):
        img = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
        p = tmp_path / f"im{i}.png"
        image_io.save_png(img, str(p))
        paths.append(str(p))

    codec = from_spec("voronoi(8)")
    real = codec.decode_mse_batch

    def broken_fetch(blobs, imgs):
        mses, _ = real(blobs, imgs)

        def fetch():
            raise RuntimeError("transient fetch failure")

        return mses, fetch

    codec.decode_mse_batch = broken_fetch

    # the fallback decode exists only for the PNG-save protocol: the fused
    # path already timed the decode leg, so it must stay out of decode_s
    # (review r5 double-count). A deliberately slow decode makes any
    # double-count unmissable against the ~ms fused leg.
    real_decode = codec.decode

    def slow_decode(data):
        time.sleep(0.2)
        return real_decode(data)

    codec.decode = slow_decode
    res = runner.measure_all(codec, paths, output_dir=str(tmp_path / "out"),
                             verbose=False, batch=2)
    assert len(res.rows) == 2 and not res.failures
    for i in range(2):  # lossy PNGs still saved via the per-image fallback
        assert os.path.exists(tmp_path / "out" / f"im{i}.png")
    assert res.decode_s < 0.2, (
        f"fallback decodes leaked into decode_s ({res.decode_s:.3f}s)")
