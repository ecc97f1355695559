"""Distribution of neighbor differences along the Hilbert traversal
(reference scripts/experiments/hilbert_distribution.py) — the evidence for
the delta codec's effectiveness."""

import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

csv_path = sys.argv[1]
df = pd.read_csv(csv_path)

fig, axes = plt.subplots(1, 3, figsize=(14, 4))
for ax, col in zip(axes, df.columns):
    diffs = np.diff(df[col].to_numpy().astype(np.int16))
    ax.hist(diffs, bins=np.arange(-64, 65) - 0.5, log=True)
    ax.set_title(f"Δ{col}")
out = csv_path.replace(".csv", ".dist.png")
plt.savefig(out, dpi=150)
print(out)
