"""Lossy-codec frontier scatter (reference error_vs_compression_plot.py).

Groups CSVs by the codec name before the first `_` so parameter sweeps form
one series; x = mean ratio on a log axis relabeled as (1-x)% saving, y = mean
MSE on a symlog axis limited to [-1, 10^4].
Writes output/error_vs_compression.png (copied to lossy_status.png).
"""

import os
from collections import defaultdict

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import matplotlib.ticker as ticker
import pandas as pd

import cniic

series = defaultdict(list)
for csv_path in cniic.diagram_csvs():
    display = os.path.splitext(os.path.basename(csv_path))[0]
    series[display.split("_")[0]].append(csv_path)

for codec_name, files in series.items():
    xs, ys = [], []
    for csv_path in files:
        df = pd.read_csv(csv_path)
        xs.append(df["compression_ratio"].mean() / 100)
        ys.append(df["error"].mean() if "error" in df.columns else 0)
    plt.scatter(xs, ys, label=codec_name)

plt.xlabel("Compression ratio (left is better)")
plt.ylabel("Error (lower is better)")
ax = plt.gca()
ax.set_xscale("log")
ax.xaxis.set_major_formatter(ticker.FuncFormatter(lambda y, _: f"{(1 - y) * 100:g}%"))
ax.set_xticks([0.25, 0.1, 0.05, 0.01, 0.001, 0.0001])
ax.set_yscale("symlog")
ax.yaxis.set_major_formatter(ticker.ScalarFormatter())
plt.ylim(-1, 10000)
plt.legend()
plt.savefig(os.path.join(cniic.output_folder(), "error_vs_compression.png"))
