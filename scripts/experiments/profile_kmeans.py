"""Profile + hardware-parity check for the k-means encode paths.

Runs the batched voronoi/cluster-colors encoders on the real device, times
them, and verifies the fused Pallas iteration produces BIT-IDENTICAL
results to the XLA oracle on hardware (the CPU-side parity tests cover
interpret mode; this is the on-silicon check the kernel docstring cites).

    python scripts/experiments/profile_kmeans.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402  (synth_image)
from cniic_tpu.codecs import from_spec  # noqa: E402
from cniic_tpu.ops import histogram, kmeans  # noqa: E402


def _median_time(fn, trials=5):
    fn()  # warm
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    return out, float(np.median(ts)), min(ts)


def main():
    import jax

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(2024)
    imgs = [bench.synth_image(rng, 768, 768) for _ in range(4)]
    mp = sum(im.shape[0] * im.shape[1] for im in imgs) / 1e6

    for spec in ("voronoi(128)", "cluster-colors(32)"):
        codec = from_spec(spec)

        os.environ["CNIIC_PALLAS_KMEANS"] = "0"
        ref, med_x, best_x = _median_time(lambda: codec.encode_batch(imgs))
        os.environ.pop("CNIIC_PALLAS_KMEANS")
        got, med_p, best_p = _median_time(lambda: codec.encode_batch(imgs))

        equal = got == ref
        print(f"{spec}: XLA {mp/med_x:.2f} MP/s (best {mp/best_x:.2f}) | "
              f"Pallas {mp/med_p:.2f} MP/s (best {mp/best_p:.2f}) | "
              f"streams bit-identical: {equal}")
        if not equal:
            raise SystemExit(f"HARDWARE PARITY FAILURE: {spec}")

    # cluster-colors stage split
    stats = [histogram.color_histogram(im.reshape(-1, 3)) for im in imgs]
    _, med, _ = _median_time(lambda: [
        histogram.color_histogram(im.reshape(-1, 3)) for im in imgs], 3)
    print(f"  hist: {med:.3f}s ({[s[0].shape[0] for s in stats]} uniques)")
    _, med, _ = _median_time(lambda: kmeans.kmeans_batch(
        [c.astype(np.int64) for c, _, _ in stats], 32,
        weights_list=[c.astype(np.int64) for _, c, _ in stats]), 3)
    print(f"  kmeans_batch: {med:.3f}s")


if __name__ == "__main__":
    main()
