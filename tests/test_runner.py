"""Bench harness protocol: CSV schema, round-trip-or-die, resume, tracing."""

import csv
import os

import numpy as np
import pytest

from cniic_tpu import image_io, runner, trace
from cniic_tpu.codecs import from_spec
from cniic_tpu.codecs.base import Codec


@pytest.fixture
def corpus(tmp_path, rng):
    paths = []
    for i in range(3):
        img = rng.integers(0, 256, (12 + i, 20, 3)).astype(np.uint8)
        p = tmp_path / f"img{i}.png"
        image_io.save_png(img, p)
        paths.append(str(p))
    return paths


def test_csv_schema_and_ratio(tmp_path, corpus):
    codec = from_spec("hufman")
    res = runner.measure_all(codec, corpus, output_dir=str(tmp_path / "out"), verbose=False)
    csv_path = tmp_path / "out" / "Hufman.csv"
    rows = list(csv.reader(open(csv_path)))
    assert rows[0] == ["name", "compressed_size", "compression_ratio", "error"]
    assert len(rows) == 4
    # ratio convention: bytes / (W*H*24) * 100 (bench.rs:41)
    name, size, ratio, err = rows[1]
    assert abs(float(ratio) - int(size) / (20 * 12 * 24) * 100) < 1e-9
    assert float(err) == 0.0
    assert not res.failures


def test_resume_skips_done(tmp_path, corpus):
    out = str(tmp_path / "out")
    codec = from_spec("hufman")
    runner.measure_all(codec, corpus[:2], output_dir=out, verbose=False)
    res = runner.measure_all(codec, corpus, output_dir=out, verbose=False, resume=True)
    rows = list(csv.reader(open(os.path.join(out, "Hufman.csv"))))
    assert len(rows) == 4  # header + 3, no duplicates
    assert len(res.rows) == 3


class _Broken(Codec):
    """Claims lossless, decodes garbage — must hard-fail per image."""

    def encode(self, img):
        self._shape = img.shape
        return b"x"

    def decode(self, data):
        return np.zeros(self._shape, np.uint8)

    @property
    def name(self):
        return "broken"

    @property
    def is_lossless(self):
        return True


def test_lossless_round_trip_or_die(tmp_path, corpus):
    res = runner.measure_all(_Broken(), corpus[:1], output_dir=str(tmp_path / "out"), verbose=False)
    assert len(res.failures) == 1
    assert len(res.rows) == 0
    # the mismatching decode is saved for inspection (bench.rs:50-55)
    assert os.path.exists(tmp_path / "out" / "img0.png")


def test_trace_spans():
    trace.reset()
    with trace.span("outer"):
        with trace.span("inner"):
            pass
    rep = trace.report()
    assert rep["outer"][0] == 1
    assert rep["outer.inner"][0] == 1


def test_batch_isolates_degenerate_image(tmp_path, rng):
    """One near-flat image failing the k-means active-cluster floor must
    not take down the rest of its batch (per-image blast radius, like the
    reference's per-image panic)."""
    from cniic_tpu import image_io, runner
    from cniic_tpu.codecs import from_spec

    paths = []
    good = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    flat = np.zeros((16, 16, 3), np.uint8)
    flat[0, 0] = [1, 2, 3]  # 2 unique colors, k=4 -> active floor fails
    for i, im in enumerate([good, flat, good]):
        p = tmp_path / f"im{i}.png"
        image_io.save_png(im, str(p))
        paths.append(str(p))

    res = runner.measure_all(from_spec("cluster-colors(4)"), paths,
                             output_dir=str(tmp_path), verbose=False, batch=3)
    assert len(res.rows) == 2
    assert len(res.failures) == 1
    assert "im1" in res.failures[0][0]


def test_pipelined_batches_match_sequential(tmp_path, rng, monkeypatch):
    """The software pipeline (encode N+1 overlapping verify N) must produce
    the same rows/CSV as the sequential path."""
    import csv

    from cniic_tpu import image_io, runner
    from cniic_tpu.codecs import from_spec

    paths = []
    for i in range(5):  # 3 groups of 2 at batch=2 (odd tail exercised)
        img = rng.integers(0, 256, (16, 20, 3)).astype(np.uint8)
        p = tmp_path / f"p{i}.png"
        image_io.save_png(img, str(p))
        paths.append(str(p))
    codec = from_spec("hufman")
    # hufman's pipeline_profitable is False: force the worker-thread
    # pipeline on for the first run (ADVICE r3 — without this both runs
    # took the sequential path and the test compared it against itself)
    monkeypatch.setenv("CNIIC_PIPELINE", "1")
    r1 = runner.measure_all(codec, paths, output_dir=str(tmp_path / "a"),
                            verbose=False, batch=2)
    monkeypatch.setenv("CNIIC_PIPELINE", "0")
    r2 = runner.measure_all(codec, paths, output_dir=str(tmp_path / "b"),
                            verbose=False, batch=2)
    assert r1.rows == r2.rows and not r1.failures and not r2.failures
    rows_a = list(csv.reader(open(tmp_path / "a" / "Hufman.csv")))
    rows_b = list(csv.reader(open(tmp_path / "b" / "Hufman.csv")))
    assert rows_a == rows_b


def test_pipelined_voronoi_matches_sequential_and_reuses_upload(
        tmp_path, rng, monkeypatch):
    """Voronoi under the pipeline: group N's decode_mse_batch must still
    find group N's encode upload in the device-image cache even though
    group N+1's encode already ran in the worker thread (ADVICE r3 — the
    clear-at-encode-start cache was wiped by the next group exactly in the
    default pipelined path), and rows must match the sequential run."""
    from cniic_tpu import image_io, runner
    from cniic_tpu.codecs import from_spec

    paths = []
    for i in range(6):  # 3 groups of 2
        img = rng.integers(0, 256, (16, 20, 3)).astype(np.uint8)
        p = tmp_path / f"v{i}.png"
        image_io.save_png(img, str(p))
        paths.append(str(p))

    codec = from_spec("voronoi(4)")
    hits = []

    monkeypatch.setenv("CNIIC_PIPELINE", "1")
    real = codec.decode_mse_batch

    def spy(blobs, originals):
        # this group's own cache key (same construction as decode_mse_batch;
        # one shape bucket here) must be present when its decode runs, even
        # though the worker thread already encoded the NEXT group
        h, w = originals[0].shape[:2]
        key = ((h, w), tuple(id(im) for im in originals))
        hits.append(key in codec._dev_imgs)
        return real(blobs, originals)

    monkeypatch.setattr(codec, "decode_mse_batch", spy)
    r1 = runner.measure_all(codec, paths, output_dir=str(tmp_path / "a"),
                            verbose=False, batch=2)
    monkeypatch.setattr(codec, "decode_mse_batch", real)
    monkeypatch.setenv("CNIIC_PIPELINE", "0")
    r2 = runner.measure_all(codec, paths, output_dir=str(tmp_path / "b"),
                            verbose=False, batch=2)
    assert r1.rows == r2.rows and not r1.failures and not r2.failures
    # every pipelined decode group found (and reused) its own encode upload
    assert hits and all(hits), hits
