#!/usr/bin/env python
"""DIV2K-shaped parity table (VERDICT r2 #4).

Reads the sweep CSVs in output/ and prints per-codec mean compression
ratio + mean MSE side by side with BASELINE.md's chart readings (the only
published numbers the reference has — values read off
lossless_status.png / lossy_status.png, see SURVEY §6), flagging anything
outside the chart's box range.

Usage: python scripts/parity_table.py [output_dir]
"""

from __future__ import annotations

import csv
import glob
import os
import sys

# BASELINE.md chart readings: name -> (mean ratio %, box lo, box hi)
LOSSLESS_CHART = {
    "delta": (7.0, 5.0, 9.0),
    "Hufman": (17.0, 13.0, 21.0),
    "hilbert-zip": (17.5, 14.0, 21.0),
    "zip-dict": (18.0, 15.0, 21.0),
    "zip-back": (22.0, 18.0, 26.0),
    "hilbert-rle": (45.0, 43.0, 48.0),
}
# lossy families: name -> (ratio range %, MSE range), monotone in the param
LOSSY_CHART = {
    "voronoi": ((0.002, 0.02), (4200.0, 6500.0)),
    "cluster-colors": ((0.3, 0.7), (55.0, 300.0)),
    "hilbert-rle-approx": ((5.0, 30.0), (0.3, 27.0)),
}


def stats(path):
    ratios, errs, sizes = [], [], []
    with open(path, newline="") as fh:
        for row in list(csv.reader(fh))[1:]:
            if len(row) >= 4:  # skip non-bench CSVs (png.csv is 3-column)
                sizes.append(int(row[1]))
                ratios.append(float(row[2]))
                errs.append(float(row[3]))
    n = len(ratios)
    return ((sum(ratios) / n, sum(errs) / n, n, sizes) if n
            else (0.0, 0.0, 0, []))


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "output"
    rows = []
    for path in sorted(glob.glob(os.path.join(out, "*.csv"))):
        if path.endswith(".hilbert.csv"):  # --special=hilbert dumps (the
            continue                       # same filter as cniic.py:14-16)
        name = os.path.basename(path)[:-4]
        ratio, err, n, sizes = stats(path)
        if not n:
            continue
        family = name.split("_")[0]
        verdict = ""
        if name in LOSSLESS_CHART:
            mean, lo, hi = LOSSLESS_CHART[name]
            verdict = (f"chart ~{mean}% (box {lo}-{hi})  "
                       + ("IN BOX" if lo <= ratio <= hi else "OUTSIDE"))
            if err != 0.0:
                verdict += "  NONZERO MSE (must be 0)"
        elif family == "voronoi":
            # a voronoi stream is deterministically 16 + 19k bytes
            # (clusterc.py::_serialize), so the ratio column is pure
            # arithmetic — identical to what the reference binary writes
            # for the same k and dims. Verify the sizes and claim exact
            # parity; only the MSE column is content-dependent
            # (VERDICT r3 weak #4; BASELINE.md's "0.002-0.02%" was a
            # log-scatter misread of lossy_status.png).
            k = int(name.split("_")[1])
            expect = 16 + 19 * k
            _, (elo, ehi) = LOSSY_CHART[family]
            eok = elo * 0.5 <= err <= ehi * 2
            size_ok = all(s == expect for s in sizes)
            verdict = (
                (f"size {expect} B exact: ratio parity BY CONSTRUCTION"
                 if size_ok else f"SIZE MISMATCH (expect {expect} B)")
                + f"; chart MSE {elo}-{ehi}  "
                + ("IN BAND (strict)" if elo <= err <= ehi else
                   "IN RANGE (2x slack)" if eok else "OUTSIDE"))
        elif family in LOSSY_CHART:
            (rlo, rhi), (elo, ehi) = LOSSY_CHART[family]
            rok = rlo * 0.5 <= ratio <= rhi * 2  # family-range, 2x slack
            eok = elo * 0.5 <= err <= ehi * 2
            strict = rlo <= ratio <= rhi and elo <= err <= ehi
            verdict = (f"family ratio {rlo}-{rhi}%, MSE {elo}-{ehi}  "
                       + ("IN BAND (strict)" if strict else
                          "IN RANGE (2x slack)" if rok and eok else
                          "OUTSIDE"))
        rows.append((name, n, ratio, err, verdict))

    print(f"| codec | imgs | mean ratio % | mean MSE | vs BASELINE.md chart |")
    print(f"|---|---|---|---|---|")
    for name, n, ratio, err, verdict in rows:
        print(f"| {name} | {n} | {ratio:.3f} | {err:.1f} | {verdict} |")


if __name__ == "__main__":
    main()
