"""Per-channel values along the Hilbert traversal (reference
scripts/experiments/hilbert_channels.py). Consumes the
output/<img>.<kind>.hilbert.csv dumps written by --special=hilbert."""

import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd

csv_path = sys.argv[1]
df = pd.read_csv(csv_path)
window = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

fig, axes = plt.subplots(3, 1, sharex=True, figsize=(12, 6))
for ax, col in zip(axes, df.columns):
    ax.plot(df[col][:window], lw=0.3)
    ax.set_ylabel(col)
plt.xlabel("traversal position")
out = csv_path.replace(".csv", ".channels.png")
plt.savefig(out, dpi=150)
print(out)
