"""Deterministic synthetic corpus generator (zero-egress stand-in for DIV2K).

Usage:
  python scripts/make_synth_corpus.py <out_dir> <n_images> [side]
  python scripts/make_synth_corpus.py <out_dir> <n_images> --div2k

The --div2k mode emits 2040x1356 images (the DIV2K_valid_HR typical shape,
SURVEY §6) with natural-image statistics: ~1/f^1.8 power spectra per
channel (the classic natural-image law), correlated chroma, a few
piecewise-flat regions, and mild sensor noise — the closest attainable
stand-in for the reference's chart corpus in a zero-egress container
(VERDICT r2 #4 / missing #1).
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


def synth_natural(rng, h, w):
    """Natural-statistics field: 1/f^1.8 spectrum, correlated channels,
    flat patches, mild noise."""
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.rfftfreq(w)[None, :]
    f = np.sqrt(fy * fy + fx * fx)
    f[0, 0] = f[0, 1]
    spec = 1.0 / f ** 1.8

    def field():
        ph = rng.normal(size=(h, w // 2 + 1)) + 1j * rng.normal(size=(h, w // 2 + 1))
        x = np.fft.irfft2(ph * spec, s=(h, w))
        lo, hi = np.percentile(x, [1, 99])
        return np.clip((x - lo) / (hi - lo + 1e-9), 0, 1)

    lum = field()
    c1, c2 = field(), field()
    r = np.clip(lum * 0.75 + c1 * 0.35 - 0.05, 0, 1)
    g = np.clip(lum * 0.85 + c2 * 0.20 - 0.02, 0, 1)
    b = np.clip(lum * 0.65 + (1 - c1) * 0.30, 0, 1)
    img = np.stack([r, g, b], axis=-1) * 255.0

    # piecewise-flat man-made regions (walls, sky patches): local mean fill
    for _ in range(int(rng.integers(4, 9))):
        y0, x0 = rng.integers(0, h * 3 // 4), rng.integers(0, w * 3 // 4)
        hh, ww = rng.integers(h // 12, h // 4), rng.integers(w // 12, w // 4)
        patch = img[y0:y0 + hh, x0:x0 + ww]
        img[y0:y0 + hh, x0:x0 + ww] = patch.mean(axis=(0, 1))

    img = img + rng.normal(0, 1.4, img.shape)  # mild sensor noise
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_dir = args[0] if args else "data/synth"
    n = int(args[1]) if len(args) > 1 else 24
    div2k = "--div2k" in sys.argv
    os.makedirs(out_dir, exist_ok=True)
    if "--4k" in sys.argv:
        # the golden-fixture image (tests/test_golden_4k.py pins its sha)
        img = synth_natural(np.random.default_rng(42), 2160, 3840)
        image_io.save_png(img, os.path.join(out_dir, "synth4k_0000.png"))
        print(f"wrote 3840x2160 image to {out_dir}")
        return
    rng = np.random.default_rng(7)
    if div2k:
        for i in range(n):
            image_io.save_png(synth_natural(rng, 1356, 2040),
                              os.path.join(out_dir, f"nat_{i:04d}.png"))
        print(f"wrote {n} 2040x1356 natural-statistics images to {out_dir}")
        return
    side = int(args[2]) if len(args) > 2 else 1024
    for i in range(n):
        image_io.save_png(synth(rng, side, side), os.path.join(out_dir, f"synth_{i:04d}.png"))
    print(f"wrote {n} {side}x{side} images to {out_dir}")


if __name__ == "__main__":
    main()
