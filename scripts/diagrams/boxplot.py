"""Lossless-codec compression boxplot (reference scripts/diagrams/boxplot.py).

Keeps codecs whose CSV has no `error` column or whose mean error is 0, sorts
series by mean ratio, draws a boxplot with means, y-limited to 0-100%.
Writes output/boxplot.png (copied to lossless_status.png by the Makefile).
"""

import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import matplotlib.ticker as ticker
import pandas as pd

import cniic

names = []
data = []
for csv_path in cniic.diagram_csvs():
    df = pd.read_csv(csv_path)
    if "error" not in df or df["error"].mean() == 0:
        data.append(df["compression_ratio"])
        names.append(os.path.splitext(os.path.basename(csv_path))[0])

order = sorted(range(len(data)), key=lambda i: data[i].mean())
data = [data[i] for i in order]
names = [names[i] for i in order]

ax = plt.gca()
plt.ylabel("Compression ratio (lower is better)")
plt.ylim(0, 100)
ax.yaxis.set_major_formatter(ticker.FuncFormatter(lambda y, _: f"{y:g}%"))
plt.boxplot(data, showmeans=True, tick_labels=names)
plt.savefig(os.path.join(cniic.output_folder(), "boxplot.png"))
