"""Deterministic synthetic corpus generator (zero-egress stand-in for DIV2K).

Usage: python scripts/make_synth_corpus.py <out_dir> <n_images> [side]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cniic_tpu import image_io  # noqa: E402


def synth(rng, h, w):
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


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "data/synth"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    side = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(7)
    for i in range(n):
        image_io.save_png(synth(rng, side, side), os.path.join(out_dir, f"synth_{i:04d}.png"))
    print(f"wrote {n} {side}x{side} images to {out_dir}")


if __name__ == "__main__":
    main()
