"""Golden 4K fixture (VERDICT r3 #2 close-out).

The reference's k-means handles any point count (kmeans.rs:21-39); after
the r4 cap lift ours does too. This pins the capability end-to-end: the
committed `tests/fixtures/voronoi128_synth4k.bin` is the voronoi(128)
stream of a deterministic 3840x2160 synthetic image, captured on TPU
hardware (2026-08-17; encode 320 s cold / CLI evidence in BENCH_NOTES).
Every k-means stage is integer-exact, so the CPU backend must reproduce
the identical decode; the MSE pin is an exact f64 equality.

The image regenerates from seed in-process (the 10 MB PNG is not
committed); `make synth-4k` writes it to data/4k/ for hardware runs.
"""

import hashlib
import importlib.util
import os

import numpy as np
import pytest

from cniic_tpu import wire
from cniic_tpu.codecs import from_spec

_IMG_SHA = "cd3007fd8c3d56783a8a9714e4641e005e1e7a133ef60817bc23efc75aa33ab3"
_STREAM_SHA = "df51eee5af16fd1a47af40fea1e8cc1112aacf3d8f8d6fe48a6dfa69911ba857"
_MSE = 491.312682  # 3840x2160, reference convention (bench.rs:95-104)

_FIX = os.path.join(os.path.dirname(__file__), "fixtures",
                    "voronoi128_synth4k.bin")


def _synth4k():
    spec = importlib.util.spec_from_file_location(
        "make_synth_corpus",
        os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                     "make_synth_corpus.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m.synth_natural(np.random.default_rng(42), 2160, 3840)


def test_voronoi128_4k_fixture_decodes_to_pinned_mse():
    data = open(_FIX, "rb").read()
    assert hashlib.sha256(data).hexdigest() == _STREAM_SHA
    assert len(data) == 16 + 19 * 128  # header + k exact 19-byte centroids

    # stream parses to the right geometry before any heavy work
    r = wire.ByteReader(data)
    w, h = r.dims()
    assert (w, h) == (3840, 2160)
    assert r.u64() == 128

    img = _synth4k()
    assert hashlib.sha256(img.tobytes()).hexdigest() == _IMG_SHA

    out = from_spec("voronoi(128)").decode(data)
    assert out.shape == (2160, 3840, 3)
    d = img.astype(np.int64) - out.astype(np.int64)
    mse = float((d.astype(np.float64) ** 2).sum()) / (2160 * 3840)
    assert mse == pytest.approx(_MSE, abs=1e-4)
