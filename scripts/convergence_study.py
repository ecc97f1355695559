"""Quantify the k-means stopping-rule divergence (VERDICT r1 #5).

The reference iterates strictly until no point changes cluster
(kmeans.rs:26). ops/kmeans.py adds two early stops (<0.1% moved; move-count
plateau) because integer-truncated means at megapixel scale leave a small
fraction of boundary points limit-cycling forever. This script measures the
frontier impact: per codec config and image, (compressed_size, MSE,
iterations) under the default rule vs CNIIC_KMEANS_STRICT=1, printed as the
markdown table recorded in PARITY.md.

Runs on the CPU backend (deterministic, no device claim):
    python scripts/convergence_study.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BIG = len(sys.argv) > 1 and sys.argv[1] == "big"

if not BIG:  # small study runs hardware-free; `big` uses the default device
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from cniic_tpu.codecs import from_spec  # noqa: E402
from cniic_tpu.runner import compute_error  # noqa: E402
from make_synth_corpus import synth  # noqa: E402


def main():
    if BIG:
        # megapixel scale — where the limit-cycling actually appears
        rng = np.random.default_rng(2024)
        imgs = [("768x768", synth(rng, 768, 768)),
                ("1024x1024", synth(rng, 1024, 1024))]
        specs = ["cluster-colors(32)", "voronoi(128)"]
    else:
        rng = np.random.default_rng(42)
        imgs = [("96x128", synth(rng, 96, 128)), ("128x128", synth(rng, 128, 128)),
                ("80x112", synth(rng, 80, 112))]
        rng2 = np.random.default_rng(3)
        imgs.append(("256x256", synth(rng2, 256, 256)))
        specs = ["cluster-colors(16)", "cluster-colors(32)", "cluster-colors(64)",
                 "voronoi(64)", "voronoi(128)", "voronoi(256)"]

    print("| codec | image | size (plateau) | size (strict) | MSE (plateau) | MSE (strict) | dMSE % | s (plateau) | s (strict) |")
    print("|---|---|---|---|---|---|---|---|---|")
    for spec in specs:
        codec = from_spec(spec)
        for name, img in imgs:
            os.environ.pop("CNIIC_KMEANS_STRICT", None)
            t0 = time.perf_counter()
            d1 = codec.encode(img)
            t1 = time.perf_counter() - t0
            m1 = compute_error(img, codec.decode(d1))
            os.environ["CNIIC_KMEANS_STRICT"] = "1"
            t0 = time.perf_counter()
            d2 = codec.encode(img)
            t2 = time.perf_counter() - t0
            m2 = compute_error(img, codec.decode(d2))
            os.environ.pop("CNIIC_KMEANS_STRICT", None)
            dm = 100.0 * (m1 - m2) / m2 if m2 else 0.0
            print(f"| {codec.name} | {name} | {len(d1)} | {len(d2)} | "
                  f"{m1:.2f} | {m2:.2f} | {dm:+.2f} | {t1:.1f} | {t2:.1f} |",
                  flush=True)


if __name__ == "__main__":
    main()
