"""Overlapped sweep driver (scripts/run_sweep.py): streams unchanged.

The driver is the sweep-scope analog of the reference's rayon fan-out
(bench.rs:22-27): a device queue and a host queue on two threads. The
load-bearing property is that overlap changes ONLY wall-clock — every CSV
must be byte-identical to a serial run (the queues share no codec state
and each config runs through the stock runner.measure_all).
"""

import os
import sys

import numpy as np
import pytest

from cniic_tpu import image_io

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
import run_sweep  # noqa: E402


@pytest.fixture
def corpus(tmp_path, rng):
    paths = []
    for i in range(3):
        img = np.zeros((24, 32, 3), np.uint8)
        img[:, :, 0] = np.linspace(0, 255, 32, dtype=np.uint8)[None, :]
        img[6 + i : 15 + i, 8:20] = [200, 40 * i, 60]
        img[18:, 24:] = rng.integers(0, 256, (6, 8, 3))
        p = tmp_path / f"img{i}.png"
        image_io.save_png(img, p)
        paths.append(str(p))
    return paths


def _run(mode, corpus, out_dir, configs):
    argv = ["run_sweep.py", "--batch=2", f"--out={out_dir}",
            f"--configs={','.join(configs)}"] + corpus
    if mode == "serial":
        argv.insert(1, "--serial")
    old = sys.argv
    sys.argv = argv
    try:
        assert run_sweep.main() == 0
    finally:
        sys.argv = old


def test_overlapped_csvs_byte_identical_to_serial(tmp_path, corpus):
    # one config per queue family: host-C, hilbert, and both k-means codecs
    configs = ["hufman", "hilbert(rle)", "cluster-colors(4)", "voronoi(8)"]
    _run("serial", corpus, str(tmp_path / "ser"), configs)
    _run("overlap", corpus, str(tmp_path / "ovl"), configs)
    names = sorted(os.listdir(tmp_path / "ser"))
    csvs = [n for n in names if n.endswith(".csv")]
    assert len(csvs) == len(configs)
    assert csvs == sorted(
        n for n in os.listdir(tmp_path / "ovl") if n.endswith(".csv"))
    for n in csvs:
        a = (tmp_path / "ser" / n).read_bytes()
        b = (tmp_path / "ovl" / n).read_bytes()
        assert a == b, f"{n} differs between serial and overlapped runs"


def test_config_split_routes_kmeans_to_device_queue():
    # assert on the module's actual splitter (review r4: an inline copy of
    # the routing logic tested nothing)
    dev, host = run_sweep.split_configs(
        ["hufman", "voronoi(8)", "cluster-colors(4)", "ccol(4)",
         "zip(dict)"])
    assert dev == ["voronoi(8)", "cluster-colors(4)", "ccol(4)"]
    assert host == ["hufman", "zip(dict)"]
    # default split = the full matrix lists, in sync with the Makefile's
    # 22 configs
    dev, host = run_sweep.split_configs()
    assert len(dev) == 11 and len(host) == 11


def test_failed_config_fails_the_sweep(tmp_path, corpus):
    # an unknown spec raises inside the queue; the driver must record it
    # and exit non-zero instead of silently dropping the queue (a dead
    # thread previously still reported success)
    argv = ["run_sweep.py", "--serial", "--batch=2",
            f"--out={tmp_path / 'out'}", "--configs=hufman,no-such-codec"
            ] + corpus
    old = sys.argv
    sys.argv = argv
    try:
        assert run_sweep.main() == 1
    finally:
        sys.argv = old
    # the healthy config still ran
    assert (tmp_path / "out" / "Hufman.csv").exists()
