"""Profile the voronoi/cluster-colors encode paths on the real TPU.

Times the batched encode (the bench path) and the k-means internals.
Run on the TPU host:

    python scripts/experiments/profile_kmeans.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402  (synth_image)
from cniic_tpu.codecs import from_spec  # noqa: E402
from cniic_tpu.ops import kmeans, histogram  # noqa: E402


def timed(label, fn, *a, **kw):
    t0 = time.perf_counter()
    out = fn(*a, **kw)
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.3f}s")
    return out, dt


def main():
    import jax
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(2024)
    imgs = [bench.synth_image(rng, 768, 768) for _ in range(2)]
    mp = sum(im.shape[0] * im.shape[1] for im in imgs) / 1e6

    vor = from_spec("voronoi(128)")
    print("== voronoi(128) @ 2x768^2 ==")
    timed("encode_batch cold", vor.encode_batch, imgs)
    _, dt = timed("encode_batch warm", vor.encode_batch, imgs)
    print(f"  -> {mp/dt:.2f} MP/s")
    _, dt = timed("encode single warm", vor.encode, imgs[0])
    print(f"  -> single {mp/2/dt:.2f} MP/s")

    # phase split for the batched path
    t0 = time.perf_counter()
    cents = kmeans.voronoi_centroids_batch(np.stack(imgs), 128)
    print(f"  voronoi_centroids_batch warm: {time.perf_counter()-t0:.3f}s")

    cc = from_spec("cluster-colors(32)")
    print("== cluster-colors(32) @ 2x768^2 ==")
    timed("encode_batch cold", cc.encode_batch, imgs)
    _, dt = timed("encode_batch warm", cc.encode_batch, imgs)
    print(f"  -> {mp/dt:.2f} MP/s")

    # split: hist / kmeans / stream
    t0 = time.perf_counter()
    stats = [histogram.color_histogram(im.reshape(-1, 3)) for im in imgs]
    print(f"  hist: {time.perf_counter()-t0:.3f}s "
          f"({[s[0].shape[0] for s in stats]} uniques)")
    t0 = time.perf_counter()
    kmeans.kmeans_batch([c.astype(np.int64) for c, _, _ in stats], 32,
                        weights_list=[c.astype(np.int64) for _, c, _ in stats])
    print(f"  kmeans_batch warm: {time.perf_counter()-t0:.3f}s")


if __name__ == "__main__":
    main()
