#!/usr/bin/env python
"""Batch-depth scaling study for the device (k-means) legs (VERDICT r4 #2).

CLAUDE.md's burst measurement says the ~0.2 s per-burst cost on the
tunneled stack is dispatch latency, not compute or upload — so deeper lane
batches should amortize it. This measures voronoi(128) and
cluster-colors(32) encode MP/s at lanes in {4, 8, 16, 32} x 1024^2 (the
bench suite's image shape) and prints a scaling table; the best depth is
what bench.py's suite and the sweep driver should adopt (the analog of the
reference saturating its host cores with rayon, bench.rs:22-27).

Usage: python scripts/experiments/batch_depth_study.py [depths...]
Writes one JSON line at the end (per-codec {depth: mps}).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import bench  # noqa: E402  (repo-root bench.py: synth_image)
from cniic_tpu.codecs import from_spec  # noqa: E402

TRIALS = 3


def main() -> int:
    depths = [int(a) for a in sys.argv[1:]] or [4, 8, 16, 32]
    rng = np.random.default_rng(2024)
    imgs_all = [bench.synth_image(rng, 1024, 1024) for _ in range(max(depths))]
    out = {}
    for spec in ("cluster-colors(32)", "voronoi(128)"):
        codec = from_spec(spec)
        out[codec.name] = {}
        for lanes in (4, 8):
            for d in depths:
                if lanes > d:
                    continue
                imgs = imgs_all[:d]
                mp = sum(im.shape[0] * im.shape[1] for im in imgs) / 1e6
                os.environ["CNIIC_KMEANS_LANES"] = str(lanes)
                try:
                    codec.encode_batch(imgs)  # compile + warm at this shape
                    trials = []
                    for _ in range(TRIALS):
                        t0 = time.perf_counter()
                        blobs = codec.encode_batch(imgs)
                        trials.append(time.perf_counter() - t0)
                finally:
                    os.environ.pop("CNIIC_KMEANS_LANES", None)
                med = float(np.median(trials))
                key = f"depth{d}_chunk{lanes}"
                out[codec.name][key] = round(mp / med, 3)
                print(f"{codec.name} {key}: {mp/med:.2f} MP/s (trials "
                      f"{'/'.join(f'{mp/t:.2f}' for t in trials)}), "
                      f"stream0 {len(blobs[0])} B", flush=True)
    print(json.dumps({"metric": "batch_depth_scaling", "mps": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
