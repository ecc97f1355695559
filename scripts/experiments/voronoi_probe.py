#!/usr/bin/env python
"""Standalone voronoi(128) encode throughput probe at north-star statistics.

The NS re-run (NORTHSTAR_r05.json) read voronoi_128 encode at 3.22 MP/s
cumulative vs 4.89 in the pre-quantization run, while its burst/padding
math is provably unchanged for 2^20-point pow2 lanes. This probe times
`encode_batch` ALONE (no pipelining, no decode overlap, no other codec in
flight) over real ns1000 chunks at the adopted depth, to attribute the
delta: if standalone reads ~5 MP/s the NS number is overlap attribution +
vCPU swing; if it reads ~3.2 something real regressed.

Usage: python scripts/experiments/voronoi_probe.py [--chunks=3] [--depth=8]
"""

from __future__ import annotations

import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from cniic_tpu import image_io  # noqa: E402
from cniic_tpu.codecs import from_spec  # noqa: E402


def main() -> None:
    chunks = 3
    depth = 8
    for a in sys.argv[1:]:
        if a.startswith("--chunks="):
            chunks = int(a.split("=", 1)[1])
        elif a.startswith("--depth="):
            depth = int(a.split("=", 1)[1])
    paths = sorted(glob.glob("data/ns1000/*.png"))
    if not paths:
        sys.exit("no ns1000 corpus; run `make ns-corpus` first")
    codec = from_spec("voronoi(128)")
    # untimed warmup on the first group (compile + first-fetch stall)
    warm = [image_io.load_image(p) for p in paths[:depth]]
    t0 = time.perf_counter()
    codec.encode_batch(warm)
    print(f"warm {time.perf_counter() - t0:.1f}s", flush=True)
    total_mp = 0.0
    total_s = 0.0
    for c in range(chunks):
        grp_paths = paths[(c + 1) * depth:(c + 2) * depth]
        imgs = [image_io.load_image(p) for p in grp_paths]
        t0 = time.perf_counter()
        streams = codec.encode_batch(imgs)
        # encode_batch returns host bytes — the stream itself is the sync
        dt = time.perf_counter() - t0
        mp = sum(im.shape[0] * im.shape[1] for im in imgs) / 1e6
        total_mp += mp
        total_s += dt
        assert all(isinstance(s, bytes) and len(s) > 16 for s in streams)
        print(f"chunk {c}: {dt:.2f}s {mp / dt:.2f} MP/s", flush=True)
    print(f"standalone steady: {total_mp / total_s:.2f} MP/s "
          f"over {total_mp:.0f} MP", flush=True)


if __name__ == "__main__":
    main()
