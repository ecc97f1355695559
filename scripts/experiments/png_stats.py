"""Corpus statistics (reference scripts/experiments/png_stats.py):
file sizes, dimensions, and unique color counts of the dataset."""

import os
import sys

import numpy as np
from PIL import Image

data_dir = sys.argv[1] if len(sys.argv) > 1 else "data/DIV2K_valid_HR"

sizes, dims, colors = [], [], []
for name in sorted(os.listdir(data_dir)):
    if not name.lower().endswith(".png"):
        continue
    path = os.path.join(data_dir, name)
    sizes.append(os.path.getsize(path))
    arr = np.asarray(Image.open(path).convert("RGB"))
    dims.append(arr.shape[:2])
    keys = (arr[..., 0].astype(np.uint32) << 16) | (arr[..., 1].astype(np.uint32) << 8) | arr[..., 2]
    colors.append(np.unique(keys).size)

sizes = np.array(sizes)
colors = np.array(colors)
print(f"images: {len(sizes)}")
print(f"file size:      min {sizes.min()}, mean {sizes.mean():.0f}, max {sizes.max()}")
print(f"dims:           {sorted(set(dims))[:10]}{'...' if len(set(dims)) > 10 else ''}")
print(f"unique colors:  min {colors.min()}, mean {colors.mean():.0f}, max {colors.max()}")
