"""Golden frontier fixtures (SURVEY.md §4 implications, VERDICT r1 #6).

Pins the exact (compressed_size, MSE) every codec config produces on three
fixed synthetic images. Every stage is integer-exact and deterministic
(canonical Huffman, exact k-means distances, f64 approx-RLE recurrence in
C), so the pins are exact equalities — identical on the CPU backend and on
hardware. A silent frontier regression (e.g. a k-means convergence tweak or
a codebook change) fails here instead of shipping.

Regenerate after an *intentional* frontier change with:
    CNIIC_GOLDEN_RECORD=1 python -m pytest tests/test_golden_frontier.py -q -s
and paste the printed table.
"""

import os

import numpy as np
import pytest

from cniic_tpu.codecs import from_spec
from cniic_tpu.runner import compute_error


def _synth(rng, h, w):
    """Same recipe as scripts/make_synth_corpus.py (natural-ish statistics)."""
    yy = np.linspace(0, 4 * np.pi, h)[:, None]
    xx = np.linspace(0, 4 * np.pi, w)[None, :]
    base = 110 + 70 * np.sin(xx * 0.7 + rng.uniform(0, 6)) * np.cos(yy * 0.5) \
        + 45 * np.sin(0.23 * (xx * 3 + yy * 2) + rng.uniform(0, 6))
    img = np.stack([base, base * 0.8 + 30, 255 - base * 0.6], axis=-1)
    for _ in range(6):
        y0, x0 = rng.integers(0, h // 2), rng.integers(0, w // 2)
        hh, ww = rng.integers(h // 8, h // 3), rng.integers(w // 8, w // 3)
        img[y0:y0 + hh, x0:x0 + ww] = rng.integers(0, 256, 3)
    img = img + rng.normal(0, 2.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(42)
    return [_synth(rng, 96, 128), _synth(rng, 128, 128), _synth(rng, 80, 112)]


SPECS = [
    "hufman",
    "delta",
    "hilbert(rle)",
    "hilbert(rle(4))",
    "hilbert(rle(16))",
    "hilbert(zip)",
    "zip(dict)",
    "zip(back)",
    "cluster-colors(16)",
    "cluster-colors(32)",
    "voronoi(64)",
    "voronoi(128)",
]

# spec -> [(compressed_size, mse) per corpus image]; exact pins
GOLDEN = {
    "hufman": [(123035, 0.0), (167727, 0.0), (103150, 0.0)],
    "delta": [(42106, 0.0), (55623, 0.0), (39282, 0.0)],
    "hilbert(rle)": [(147164, 0.0), (196304, 0.0), (107384, 0.0)],
    "hilbert(rle(4))": [(99764, 1.7685547), (143684, 1.4632568), (81320, 1.3321429)],
    "hilbert(rle(16))": [(6080, 41.4523926), (12968, 47.4560547), (8612, 46.1870536)],
    "hilbert(zip)": [(49164, 0.0), (65760, 0.0), (39036, 0.0)],
    "zip(dict)": [(49244, 0.0), (65524, 0.0), (39444, 0.0)],
    "zip(back)": [(67523, 0.0), (94533, 0.0), (53173, 0.0)],
    "cluster-colors(16)": [(6148, 450.2252604), (8238, 88.2706299), (4651, 60.3631696)],
    "cluster-colors(32)": [(7918, 170.2086589), (10630, 42.1232910), (5948, 18.0802455)],
    "voronoi(64)": [(1232, 3731.9038086), (1232, 3365.5150146), (1232, 2294.0121652)],
    "voronoi(128)": [(2448, 2427.6587728), (2448, 2714.3590698), (2448, 1443.4994420)],
}


@pytest.mark.parametrize("spec", SPECS)
def test_golden_frontier(spec, corpus, capsys):
    codec = from_spec(spec)
    got = []
    for img in corpus:
        data = codec.encode(img)
        dec = codec.decode(data)
        got.append((len(data), compute_error(img, dec)))

    if os.environ.get("CNIIC_GOLDEN_RECORD", "") == "1":
        with capsys.disabled():
            vals = ", ".join(f"({s}, {m:.7f})".replace(".0000000", ".0")
                             for s, m in got)
            print(f'    "{spec}": [{vals}],')
        return

    want = GOLDEN[spec]
    for i, ((gs, gm), (ws, wm)) in enumerate(zip(got, want)):
        assert gs == ws, f"{spec} image {i}: size {gs} != golden {ws}"
        assert gm == pytest.approx(wm, abs=1e-6), \
            f"{spec} image {i}: MSE {gm} != golden {wm}"
