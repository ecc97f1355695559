#!/usr/bin/env python
"""Attribute the NS-vs-isolated cluster-colors gap (7.37 vs ~10.5 MP/s).

The clean corpus splice (BENCH_NOTES "r5 final+") reads cluster-colors_32
at 7.37 MP/s cumulative while `profile_clusterc.py` reads 10.1-10.6 on the
same 32-image chunks back-to-back. The difference between the two
protocols is everything the northstar driver runs BETWEEN cluster-colors
calls: its fused decode+MSE, voronoi encode (big device allocations),
voronoi decode (device reconstruct), and fresh PNG loads. This probe
replays the exact NS per-chunk sequence with production calls and times
the cluster-colors encode leg in each context:

  A. cluster encode alone, chunks back-to-back        (the profile case)
  B. cluster encode + its decode_mse                  (adds host C decode)
  C. full NS order: cluster enc+dec, voronoi enc+dec  (the NS case)

If C's cluster leg reproduces ~4.5 s/chunk while A stays ~3.2, the gap is
real neighbor-state churn (allocator/tunnel), and B vs C splits whether
the churn comes from the host decode or the voronoi device work.

Usage: python scripts/experiments/interleave_probe.py [--chunks=3] <pngs...>
"""

from __future__ import annotations

import glob as globlib
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from cniic_tpu import image_io  # noqa: E402
from cniic_tpu.codecs import from_spec  # noqa: E402
from cniic_tpu.runner import compute_error  # noqa: E402

CHUNK = 32


def _decode_verify(codec, blobs, imgs):
    """The exact NS decode+verify leg: fused decode_mse_batch when the
    codec has one, else decode_batch + per-image MSE."""
    fused = getattr(codec, "decode_mse_batch", None)
    if fused is not None:
        fused(blobs, imgs)
    else:
        decs = codec.decode_batch(blobs)
        for im, de in zip(imgs, decs):
            compute_error(im, de)


def main() -> int:
    n_chunks = 3
    paths = []
    for a in sys.argv[1:]:
        if a.startswith("--chunks="):
            n_chunks = int(a.split("=", 1)[1])
        else:
            paths.extend(sorted(globlib.glob(a)) or [a])
    paths = sorted(paths)[: CHUNK * (n_chunks + 1)]
    if len(paths) < CHUNK * 2:
        print("need at least two chunks of images", file=sys.stderr)
        return 1

    cc = from_spec("cluster-colors(32)")
    vo = from_spec("voronoi(128)")
    groups = [paths[i:i + CHUNK] for i in range(0, len(paths), CHUNK)]
    imgs_by_chunk = [[image_io.load_image(p) for p in g] for g in groups]
    mp_of = [sum(im.shape[0] * im.shape[1] for im in ch) / 1e6
             for ch in imgs_by_chunk]

    # warmup on chunk 0 (both codecs, all shapes)
    t0 = time.time()
    blobs = cc.encode_batch(imgs_by_chunk[0])
    _decode_verify(cc, blobs, imgs_by_chunk[0])
    vb = vo.encode_batch(imgs_by_chunk[0])
    _decode_verify(vo, vb, imgs_by_chunk[0])
    print(f"warmup {time.time()-t0:.1f}s", flush=True)

    work = imgs_by_chunk[1:]

    def cc_leg(imgs):
        t0 = time.perf_counter()
        b = cc.encode_batch(imgs)
        dt = time.perf_counter() - t0
        return b, dt

    for label, mode in (("A cluster-only", "a"),
                        ("B +own-decode", "b"),
                        ("C full-NS-order", "c")):
        ts, mps = [], []
        for ci, imgs in enumerate(work, start=1):
            b, dt = cc_leg(imgs)
            ts.append(dt)
            mps.append(mp_of[ci])
            if mode in ("b", "c"):
                _decode_verify(cc, b, imgs)
            if mode == "c":
                vb = vo.encode_batch(imgs)
                _decode_verify(vo, vb, imgs)
        rates = "/".join(f"{m/t:.2f}" for m, t in zip(mps, ts))
        print(f"{label}: cluster enc {rates} MP/s "
              f"(mean {sum(mps)/sum(ts):.2f})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
