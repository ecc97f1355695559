"""Matched-content host baseline (scripts/measure_baseline.py --images):
the north-star denominator must be measured on the same corpus statistics
as the numerator (VERDICT r4 #1), so the --images mode samples the real
corpus deterministically instead of synthesizing easy content. These tests
pin the sampling and the output document shape on a tiny corpus with a
reduced suite — the timing values themselves are the real run's business.
"""

import json
import os
import sys

import numpy as np

from cniic_tpu import image_io

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
import measure_baseline as mb  # noqa: E402


def test_corpus_sample_is_deterministic_spread():
    paths = [f"img_{i:04d}.png" for i in range(100)]
    s = mb._corpus_sample(paths, 4)
    assert s == mb._corpus_sample(paths, 4)
    assert s[0] == paths[0] and s[-1] == paths[-1]
    assert len(s) == 4
    # a sample larger than the corpus degrades to the whole corpus
    assert mb._corpus_sample(paths[:3], 8) == paths[:3]


def test_images_mode_writes_matched_baseline(tmp_path, rng, monkeypatch):
    for i in range(5):
        img = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
        image_io.save_png(img, tmp_path / f"c_{i}.png")

    import bench
    monkeypatch.setattr(bench, "SUITE",
                        [("hufman", 24, 3), ("delta", 24, 3)])
    monkeypatch.setattr(mb, "_CORPUS_DEFAULT_N", 2)
    out_name = "BASELINE_TEST_NS.json"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.setattr(sys, "argv", [
        "measure_baseline.py", f"--images={tmp_path}/*.png",
        f"--out={out_name}"])
    try:
        assert mb.main() == 0
        doc = json.load(open(os.path.join(repo, out_name)))
    finally:
        os.remove(os.path.join(repo, out_name))
    assert set(doc["per_codec"]) == {"Hufman", "delta"}
    for v in doc["per_codec"].values():
        assert v["encode_mps"] > 0 and v["decode_mps"] > 0
    assert doc["corpus"]["images"] == 5
    # 2-image deterministic spread = first and last of the sorted corpus;
    # fast legs share one recorded sample (r5 review: the identical list
    # was stored once per codec, 7x redundant in the artifact)
    assert doc["corpus"]["sampled"]["default"] == ["c_0.png", "c_4.png"]
    assert "Hufman" not in doc["corpus"]["sampled"]


def test_images_mode_empty_glob_fails(tmp_path, monkeypatch):
    monkeypatch.setattr(sys, "argv", [
        "measure_baseline.py", f"--images={tmp_path}/nothing/*.png"])
    assert mb.main() == 1


def test_only_splice_preserves_untouched_legs(tmp_path, rng, monkeypatch):
    """--only=<leg>: re-measures just the named legs and splices them into
    the existing file — every other denominator (and the corpus record)
    must come through byte-identical (the r5 baseline-refresh protocol:
    re-rolling all nine would replace the k-means denominators that
    dominate the suite estimate with fresh noise)."""
    for i in range(4):
        img = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
        image_io.save_png(img, tmp_path / f"c_{i}.png")

    import bench
    monkeypatch.setattr(bench, "SUITE",
                        [("hufman", 24, 3), ("delta", 24, 3)])
    monkeypatch.setattr(mb, "_CORPUS_DEFAULT_N", 2)
    out_name = "BASELINE_TEST_ONLY.json"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(repo, out_name)
    try:
        monkeypatch.setattr(sys, "argv", [
            "measure_baseline.py", f"--images={tmp_path}/*.png",
            f"--out={out_name}"])
        assert mb.main() == 0
        doc = json.load(open(out_path))
        # plant sentinels: the splice must keep the untouched leg verbatim
        doc["per_codec"]["Hufman"] = {"encode_mps": 123.0,
                                      "decode_mps": 456.0}
        json.dump(doc, open(out_path, "w"))

        monkeypatch.setattr(sys, "argv", [
            "measure_baseline.py", f"--images={tmp_path}/*.png",
            f"--out={out_name}", "--only=delta"])
        assert mb.main() == 0
        doc2 = json.load(open(out_path))
        assert doc2["per_codec"]["Hufman"] == {"encode_mps": 123.0,
                                               "decode_mps": 456.0}
        assert doc2["per_codec"]["delta"]["encode_mps"] > 0
        assert doc2["corpus"] == doc["corpus"]

        # a leg not present in the file is a hard error, not a silent add
        monkeypatch.setattr(sys, "argv", [
            "measure_baseline.py", f"--images={tmp_path}/*.png",
            f"--out={out_name}", "--only=zip-back"])
        assert mb.main() == 1
    finally:
        os.remove(out_path)
