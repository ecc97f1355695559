"""PNG baseline CSV (reference scripts/png.py).

Records the on-disk PNG size of each corpus image against the same
bytes / (W*H*24) "compression ratio" convention the bench harness uses, so
the PNG series plots alongside the codec CSVs.
"""

import csv
import os
import sys

from PIL import Image

data_dir = sys.argv[1] if len(sys.argv) > 1 else "data/DIV2K_valid_HR"
output_path = "output/png.csv"

os.makedirs("output", exist_ok=True)
with open(output_path, "w", newline="") as fh:
    w = csv.writer(fh)
    w.writerow(["name", "compressed_size", "compression_ratio"])
    for name in sorted(os.listdir(data_dir)):
        if not name.lower().endswith(".png"):
            continue
        path = os.path.join(data_dir, name)
        size = os.path.getsize(path)
        with Image.open(path) as img:
            iw, ih = img.size
        raw = iw * ih * 24  # see cniic_tpu/runner.py
        w.writerow([path, size, size / raw * 100])
