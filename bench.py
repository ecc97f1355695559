#!/usr/bin/env python
"""Headline benchmark: encode throughput across all nine codec families.

Runs each codec over a deterministic synthetic corpus with natural-image-like
statistics (spatially-correlated texture + gradients + flat regions), checks
the round trip, and reports the **geometric mean encode throughput in
megapixels/sec** across the nine configs of the reference Makefile sweep.

Baseline: the reference never recorded wall-clock (BASELINE.md); its north
star is ">= 50x the Rust single-core encode throughput". We normalize
against a nominal 1.0 MP/s Rust single-core rate (the reference flags
cluster-colors/voronoi/zip-back as multi-hour "slow codecs" over 100 ~3MP
images, i.e. well under 1 MP/s), so ``vs_baseline`` is the estimated
speedup factor over the reference engine per chip.

Prints exactly one JSON line:
    {"metric": "...", "value": N, "unit": "MP/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import math
import sys
import time

import numpy as np

from cniic_tpu.codecs import from_spec
from cniic_tpu.runner import compute_error


def synth_image(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Natural-ish content: low-frequency fields + flat patches + mild noise."""
    yy = np.linspace(0, 4 * np.pi, h)[:, None]
    xx = np.linspace(0, 4 * np.pi, w)[None, :]
    base = (
        110
        + 70 * np.sin(xx * 0.7 + 1.3) * np.cos(yy * 0.5)
        + 45 * np.sin(0.23 * (xx * 3 + yy * 2))
    )
    img = np.stack([base, base * 0.8 + 30, 255 - base * 0.6], axis=-1)
    # a few flat rectangles (RLE/palette-friendly structure)
    for _ in range(6):
        y0, x0 = rng.integers(0, h // 2), rng.integers(0, w // 2)
        hh, ww = rng.integers(h // 8, h // 3), rng.integers(w // 8, w // 3)
        img[y0 : y0 + hh, x0 : x0 + ww] = rng.integers(0, 256, 3)
    img = img + rng.normal(0, 2.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


# (spec, image side, images) — sized so host-sequential engines don't dominate
SUITE = [
    ("hufman", 1024, 4),
    ("delta", 1024, 4),
    ("hilbert(rle)", 1024, 4),
    ("hilbert(rle(4))", 1024, 4),
    ("cluster-colors(32)", 768, 2),
    ("voronoi(128)", 768, 2),
    ("hilbert(zip)", 512, 2),
    ("zip(dict)", 512, 2),
    ("zip(back)", 512, 2),
]


def main() -> int:
    rng = np.random.default_rng(2024)
    per_codec = {}
    failures = {}
    details = []
    for spec, side, n_imgs in SUITE:
        codec = from_spec(spec)
        imgs = [synth_image(rng, side, side) for _ in range(n_imgs)]
        ok = False
        for attempt in range(3):  # the tunneled device throws transient errors
            try:
                # warmup (jit compiles, native lib build, first-fetch toll)
                # at the exact batch shape so the timed run hits warm caches
                codec.encode_batch(imgs)

                t0 = time.perf_counter()
                blobs = codec.encode_batch(imgs)
                enc_s = time.perf_counter() - t0

                mp = sum(im.shape[0] * im.shape[1] for im in imgs) / 1e6
                mps = mp / enc_s

                # round-trip check on the first image
                dec = codec.decode(blobs[0])
                err = compute_error(imgs[0], dec)
                if codec.is_lossless and err != 0.0:
                    print(f"FATAL: {codec.name} lossless round-trip failed (MSE={err})", file=sys.stderr)
                    return 1
                ok = True
                break
            except Exception as e:
                failures[codec.name] = repr(e)[:200]
                print(f"{codec.name}: attempt {attempt + 1} failed: {e!r}", file=sys.stderr)
                time.sleep(20)
        if not ok:  # a failed codec flags but doesn't kill the bench
            details.append(f"{codec.name}: FAILED {failures[codec.name]}")
            continue
        failures.pop(codec.name, None)
        per_codec[codec.name] = mps
        ratio = len(blobs[0]) / (side * side * 24) * 100
        details.append(f"{codec.name}: {mps:.2f} MP/s, ratio {ratio:.3f}%, MSE {err:.1f}")

    for line in details:
        print(line, file=sys.stderr)

    if not per_codec:
        print(json.dumps({"metric": "encode_throughput_geomean_9codecs",
                          "value": 0.0, "unit": "MP/s", "vs_baseline": 0.0,
                          "failures": failures}))
        return 1
    value = math.exp(sum(math.log(v) for v in per_codec.values()) / len(per_codec))
    out = {
        "metric": "encode_throughput_geomean_9codecs",
        "value": round(value, 3),
        "unit": "MP/s",
        "vs_baseline": round(value / 1.0, 3),
        "per_codec_mps": {k: round(v, 3) for k, v in per_codec.items()},
    }
    if failures:
        out["failures"] = failures
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
