"""CLI surface (reference src/main.rs behavior)."""

import csv
import os

import numpy as np
import pytest

from cniic_tpu import cli, image_io


@pytest.fixture
def png(tmp_path, rng):
    img = rng.integers(0, 256, (9, 14, 3)).astype(np.uint8)
    p = tmp_path / "img.png"
    image_io.save_png(img, p)
    return str(p)


def test_usage_on_no_args(capsys):
    assert cli.main([]) == 1
    assert "Usage" in capsys.readouterr().err


def test_malformed_codec(capsys, png):
    assert cli.main(["--codec=nonsense", png]) == 1
    err = capsys.readouterr().err
    assert "Malformed codec argument" in err
    # error taxonomy lists every alternative (prs.rs AllFailed)
    for name in ("ClusterColors", "VoronoiCluster", "Delta", "Hilbert", "Hufman", "Zip"):
        assert name in err


def test_invalid_special(capsys):
    assert cli.main(["--special=bogus"]) == 1
    assert "Invalid special command" in capsys.readouterr().err


def test_codec_run_writes_csv(png, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert cli.main(["--codec=hufman", png]) == 0
    rows = list(csv.reader(open("output/Hufman.csv")))
    assert rows[0] == ["name", "compressed_size", "compression_ratio", "error"]
    assert len(rows) == 2


def test_special_hilbert_dumps(png, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert cli.main(["--special=hilbert", png]) == 0
    for kind in ("rect", "small", "large"):
        path = f"output/img.{kind}.hilbert.csv"
        assert os.path.exists(path), kind
        rows = list(csv.reader(open(path)))
        assert rows[0] == ["red", "blue", "green"]  # reference's exact header
    # rect and large cover every pixel
    assert len(list(csv.reader(open("output/img.rect.hilbert.csv")))) == 9 * 14 + 1
    assert len(list(csv.reader(open("output/img.large.hilbert.csv")))) == 9 * 14 + 1


def test_special_hilbert_small_square_pow2_quirk(tmp_path, monkeypatch, rng):
    """The 'largest inscribed' square replicates the reference formula
    next_power_of_two() >> 1 (hilbert.rs:18) — an exactly power-of-two
    dimension is HALVED (64 -> 32), because Rust's next_power_of_two(64)
    is 64. Bug-for-bug parity, same as the voronoi wrapping-u32 metric."""
    img = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    p = tmp_path / "sq.png"
    image_io.save_png(img, p)
    monkeypatch.chdir(tmp_path)
    assert cli.main(["--special=hilbert", str(p)]) == 0
    rows = list(csv.reader(open("output/sq.small.hilbert.csv")))
    assert len(rows) == 32 * 32 + 1  # NOT 64*64: the reference halves it
    # non-power-of-two: 65 -> next_pow2 128 -> 64 (true largest inscribed)
    img = rng.integers(0, 256, (64, 65, 3)).astype(np.uint8)
    p2 = tmp_path / "r.png"
    image_io.save_png(img, p2)
    assert cli.main(["--special=hilbert", str(p2)]) == 0
    rows = list(csv.reader(open("output/r.small.hilbert.csv")))
    assert len(rows) == 32 * 32 + 1  # min(64, 32) over (w=65, h=64)


def test_batch_and_resume_flags(png, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert cli.main(["--codec=hilbert(rle)", "--batch=2", png]) == 0
    assert cli.main(["--codec=hilbert(rle)", "--resume", png]) == 0
    rows = list(csv.reader(open("output/hilbert-rle.csv")))
    assert len(rows) == 2  # resume did not duplicate


def test_missing_file_continues(png, capsys, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = cli.main(["--codec=hufman", "/nonexistent.png", png])
    assert rc == 2  # failures present
    rows = list(csv.reader(open("output/Hufman.csv")))
    assert len(rows) == 2  # good image still measured
