"""Shared helpers for the analysis/diagram scripts (reference scripts/cniic.py).

Scripts are run from the repo root; `output/` holds one CSV per codec run.
"""

import glob
import os


def output_folder():
    return os.path.join(os.getcwd(), "output")


def diagram_csvs():
    return [p for p in glob.glob(output_folder() + "/*.csv")
            if not p.endswith(".hilbert.csv")]
