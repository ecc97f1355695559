#!/usr/bin/env python
"""Corpus-scale CPU-only probe for the host-C codec legs.

The r5 north-star table read hilbert-rle encode at 42.0 MP/s over the full
1000-image corpus while the host baseline's 8-image sample read 135-137
(median-of-3, reproducible) — a 3.3x gap on a leg whose hot path is the
same C in both runs. This probe isolates the variables: it replays the
EXACT northstar chunk protocol (chunked encode_batch, load untimed,
accumulated encode seconds) over a contiguous corpus prefix, but CPU-only
(no TPU claim, no axon tunnel threads). If it reads ~135, the NS gap is
TPU-attachment/suite contention inside the northstar process; if it reads
~42, the gap is corpus-scale content (per-image variance the 8-image
linspace sample misses).

Usage: python scripts/experiments/probe_cleg_scale.py [--n=128] [--chunk=32]
           [--specs=hilbert(rle),hilbert(rle(4))] [--glob='data/ns1000/*.png']
"""

from __future__ import annotations

import glob as globlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax

jax.config.update("jax_platforms", "cpu")  # the point: no device attached

from cniic_tpu import image_io  # noqa: E402
from cniic_tpu.codecs import from_spec  # noqa: E402


def main() -> int:
    n, chunk = 128, 32
    specs = "hilbert(rle),hilbert(rle(4))"
    pat = "data/ns1000/*.png"
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        elif a.startswith("--chunk="):
            chunk = int(a.split("=", 1)[1])
        elif a.startswith("--specs="):
            specs = a.split("=", 1)[1]
        elif a.startswith("--glob="):
            pat = a.split("=", 1)[1]
    paths = sorted(globlib.glob(pat))[:n]
    if not paths:
        print(f"no images match {pat}", file=sys.stderr)
        return 1
    codecs = [from_spec(s) for s in specs.split(",")]
    acc = {c.name: [0.0, 0.0] for c in codecs}  # mp, enc_s

    groups = [paths[i:i + chunk] for i in range(0, len(paths), chunk)]
    warm = [image_io.load_image(p) for p in groups[0]]
    for c in codecs:
        c.encode_batch(warm[: min(8, len(warm))])
    for gi, g in enumerate(groups):
        imgs = [image_io.load_image(p) for p in g]
        mp = sum(im.shape[0] * im.shape[1] for im in imgs) / 1e6
        for c in codecs:
            t0 = time.perf_counter()
            c.encode_batch(imgs)
            dt = time.perf_counter() - t0
            acc[c.name][0] += mp
            acc[c.name][1] += dt
        print(f"chunk {gi+1}/{len(groups)}: " + " ".join(
            f"{c.name}:{acc[c.name][0]/max(acc[c.name][1],1e-9):.1f}"
            for c in codecs), flush=True)
    for c in codecs:
        mp, s = acc[c.name]
        print(f"{c.name}: {mp/s:.1f} MP/s over {mp:.0f} MP ({s:.2f}s) CPU-only")
    return 0


if __name__ == "__main__":
    sys.exit(main())
