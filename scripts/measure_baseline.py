"""Measure the single-core host-CPU baseline for bench.py's vs_baseline.

The reference binary cannot be built in-container (no rustc/cargo, zero
egress — BENCH_NOTES.md documents the blocker), so the measured baseline is
this framework itself on the **CPU backend of the same host**: identical
algorithms, identical streams, one slow vCPU — the same class of machine the
single-core Rust reference would run on. For the LZ/Huffman/RLE families the
hot loops are the same C the production path uses (the reference's own
algorithms), so the baseline if anything *over*-states the Rust's speed (our
C engines carry optimizations the reference lacks: ringless LZ77 history,
AVX2 candidate prefilter, radix histograms); for the k-means codecs the
dense XLA formulation runs on the host CPU. vs_baseline is therefore a
conservative, reproducible measurement of what the TPU buys per codec.

Run ALONE on the bench host (the single vCPU makes concurrent timings lie):

    python scripts/measure_baseline.py          # writes BASELINE_HOST.json

bench.py picks the file up automatically.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # never claim the TPU

import numpy as np  # noqa: E402

import bench  # noqa: E402
from cniic_tpu.codecs import from_spec  # noqa: E402


def main() -> int:
    rng = np.random.default_rng(2024)
    out = {}
    for spec, side, n_imgs in bench.SUITE:
        codec = from_spec(spec)
        imgs = [bench.synth_image(rng, side, side) for _ in range(n_imgs)]
        mp = sum(im.shape[0] * im.shape[1] for im in imgs) / 1e6
        # warmup at the EXACT batch shape (review r4: a 1-image warmup left
        # the batch-4 XLA compile inside the timed region for the k-means
        # codecs, depressing the baseline and inflating vs_baseline), then
        # one timed pass — the heavy codecs take minutes per pass on the
        # host CPU, median-of-N is a luxury reserved for the TPU side
        codec.encode_batch(imgs)
        t0 = time.perf_counter()
        blobs = codec.encode_batch(imgs)
        enc_s = time.perf_counter() - t0
        # NOTE: decode here is the per-image decode() loop, not bench.py's
        # batched/fused decode path — decode_mps is a host reference point,
        # NOT the denominator of any published speedup (bench.py computes
        # vs_baseline from encode only)
        for b in blobs[:1]:
            codec.decode(b)  # decode-side warm (tables, caches)
        t0 = time.perf_counter()
        for b in blobs:
            codec.decode(b)
        dec_s = time.perf_counter() - t0
        out[codec.name] = {"encode_mps": round(mp / enc_s, 4),
                           "decode_mps": round(mp / dec_s, 4)}
        print(f"{codec.name}: encode {mp/enc_s:.3f} MP/s, "
              f"decode {mp/dec_s:.3f} MP/s", file=sys.stderr, flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_HOST.json")
    with open(path, "w") as f:
        json.dump({"host": "bench host, CPU backend, single process",
                   "per_codec": out}, f, indent=1)
    print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
