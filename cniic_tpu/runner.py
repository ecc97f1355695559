"""Benchmark harness (reference src/bench.rs rebuilt).

For every input image: encode -> record compressed size -> decode -> verify
the round trip -> append a CSV row. Protocol details preserved exactly:

* CSV path ``output/<codec-name>.csv`` with header
  ``name, compressed_size, compression_ratio, error`` (bench.rs:67-75,85-91);
* ``compression_ratio`` = compressed_bytes / (W*H*24) * 100 — the
  bytes-vs-24 convention of bench.rs:41 (the comment there says "3 bytes RGB"
  but multiplies by 24; scripts/png.py replicates it, so we must too);
* ``error`` = mean over pixels of the squared Euclidean RGB distance
  (bench.rs:95-104);
* any nonzero error saves the decoded image to ``output/<stem>.png``; a
  nonzero error from a codec claiming losslessness fails that image hard
  (bench.rs:50-60) — the round-trip-or-die property;
* per-image failures are reported and the run continues (bench.rs:78).

Additions over the reference: per-image wall-clock + aggregate
megapixels/sec, returned as a summary dict.
"""

from __future__ import annotations

import csv
import os
import time
from dataclasses import dataclass, field

import numpy as np

from . import image_io, native
from .codecs.base import Codec


def compute_error(x: np.ndarray, y: np.ndarray) -> float:
    """MSE per bench.rs:95-104 (sum of squared channel diffs / pixel count).

    The single-pass C kernel and the numpy chain below are bit-identical:
    every squared diff is an integer <= 255^2 and the float64 accumulation
    of the numpy path is exact far past any image size, so both produce the
    same integer total before the one shared division."""
    if x.dtype == np.uint8 and y.dtype == np.uint8 and x.shape == y.shape:
        tot = float(native.mse_sum_u8(x, y))
    else:
        d = x.astype(np.int64) - y.astype(np.int64)
        tot = float((d.astype(np.float64) ** 2).sum())
    return tot / (x.shape[0] * x.shape[1])


@dataclass
class BenchResult:
    rows: list = field(default_factory=list)
    failures: list = field(default_factory=list)
    encode_s: float = 0.0
    decode_s: float = 0.0
    megapixels: float = 0.0

    @property
    def encode_mps(self) -> float:
        return self.megapixels / self.encode_s if self.encode_s else 0.0

    @property
    def mean_ratio(self) -> float:
        return float(np.mean([r[2] for r in self.rows])) if self.rows else 0.0

    @property
    def mean_error(self) -> float:
        return float(np.mean([r[3] for r in self.rows])) if self.rows else 0.0


def measure_all(codec: Codec, paths, output_dir: str = "output",
                verbose: bool = True, batch: int = 1,
                resume: bool = False) -> BenchResult:
    """Bench every image; with resume=True, images already present in the
    codec's CSV are skipped and rows are appended (the per-batch analog of
    the reference Makefile's .bak result caching, SURVEY §5.4)."""
    os.makedirs(output_dir, exist_ok=True)
    csv_path = os.path.join(output_dir, f"{codec.name}.csv")
    res = BenchResult()

    done = set()
    if resume and os.path.exists(csv_path):
        corrupt = False
        with open(csv_path, newline="") as fh:
            for row in list(csv.reader(fh))[1:]:
                try:
                    parsed = [row[0], int(row[1]), float(row[2]),
                              float(row[3])]
                except (IndexError, ValueError):
                    # a crash mid-write leaves a short/garbled final line;
                    # treat that image as not-done and re-bench it rather
                    # than making --resume unusable on interrupted runs
                    corrupt = corrupt or bool(row)
                    continue
                done.add(row[0])
                res.rows.append(parsed)
        paths = [p for p in paths if str(p) not in done]
        if corrupt and done:
            # rewrite with only the well-formed rows so the appends below
            # don't merge onto a partial line
            with open(csv_path, "w", newline="") as fh:
                w = csv.writer(fh)
                w.writerow(["name", "compressed_size", "compression_ratio",
                            "error"])
                w.writerows(res.rows)

    mode = "a" if done else "w"
    with open(csv_path, mode, newline="") as fh:
        writer = csv.writer(fh)
        if not done:
            writer.writerow(["name", "compressed_size", "compression_ratio", "error"])
        if batch <= 1:
            for p in paths:
                try:
                    row = _measure_one(codec, p, output_dir, res, verbose)
                except Exception as e:  # continue with other images (bench.rs:78)
                    res.failures.append((str(p), repr(e)))
                    print(f"error: {p}: {e!r}")
                    continue
                if row is not None:
                    writer.writerow(row)
                    res.rows.append(row)
        else:
            paths = list(paths)
            groups = [paths[i : i + batch] for i in range(0, len(paths), batch)]
            env = os.environ.get("CNIIC_PIPELINE", "")
            pipelined = len(groups) > 1 and (
                env == "1" or (env != "0" and codec.pipeline_profitable))
            if pipelined:
                # software pipeline (VERDICT r2 #5, the reference's rayon
                # fan-out bench.rs:22-27 as overlap): group N+1's encode —
                # host C histograms/LZ with the GIL released, device
                # dispatches — runs in a worker thread while the main
                # thread decodes, verifies and writes group N. On a
                # one-vCPU host the win is the device-wait windows; on a
                # real host every C stage overlaps.
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=1) as ex:
                    fut = ex.submit(_load_and_encode, codec, groups[0], res)
                    for gi in range(len(groups)):
                        loaded = fut.result()
                        if gi + 1 < len(groups):
                            fut = ex.submit(_load_and_encode, codec,
                                            groups[gi + 1], res)
                        for row in _verify_group(codec, loaded, output_dir,
                                                 res, verbose):
                            if row is not None:
                                writer.writerow(row)
                                res.rows.append(row)
            else:
                for group in groups:
                    loaded = _load_and_encode(codec, group, res)
                    for row in _verify_group(codec, loaded, output_dir, res,
                                             verbose):
                        if row is not None:
                            writer.writerow(row)
                            res.rows.append(row)
    return res


def _load_and_encode(codec: Codec, group, res: BenchResult):
    """Pipeline stage 1: load the group and run the batched encode.
    Returns (names, imgs, blobs) with failures recorded; (.., None) when
    the whole group failed. Thread-safe with stage 2: only appends to the
    failure list and adds to the float accumulators."""
    imgs, names = [], []
    for p in group:
        try:
            imgs.append(image_io.load_image(p))
            names.append(p)
        except Exception as e:
            res.failures.append((str(p), repr(e)))
            print(f"error: {p}: {e!r}")

    if not imgs:
        return names, imgs, None
    t0 = time.perf_counter()
    try:
        blobs = codec.encode_batch(imgs)
    except Exception as e:  # whole group fails; continue with other groups
        for p in names:
            res.failures.append((str(p), repr(e)))
        print(f"error: batch {names[0]}..{names[-1]}: {e!r}")
        return names, imgs, None
    res.encode_s += time.perf_counter() - t0
    res.megapixels += sum(im.shape[0] * im.shape[1] for im in imgs) / 1e6
    return names, imgs, blobs


def _verify_group(codec: Codec, loaded, output_dir: str, res: BenchResult,
                  verbose: bool):
    """Pipeline stage 2: decode, verify, save PNGs, yield CSV rows."""
    names, imgs, blobs = loaded
    if blobs is None:
        return

    # batched codecs may return an Exception in place of a failed image's
    # stream (e.g. the k-means active-cluster floor) — isolate those images
    # and decode the rest in one batch
    ok_idx = [i for i, b in enumerate(blobs) if not isinstance(b, Exception)]
    decoded_all: list = [None] * len(blobs)
    errors_all: list = [None] * len(blobs)
    fused_fetch = None  # lazy decoded-image fetch from the fused path
    fused = getattr(codec, "decode_mse_batch", None)
    try:
        t1 = time.perf_counter()
        if fused is not None:
            # fused device decode+MSE: only error scalars cross the link on
            # the timed path; images stay in HBM until the PNG save needs them
            mses, fused_fetch = fused([blobs[i] for i in ok_idx],
                                      [imgs[i] for i in ok_idx])
            res.decode_s += time.perf_counter() - t1
            for j, i in enumerate(ok_idx):
                errors_all[i] = mses[j]
        else:
            dec_ok = codec.decode_batch([blobs[i] for i in ok_idx])
            res.decode_s += time.perf_counter() - t1
            for j, i in enumerate(ok_idx):
                decoded_all[i] = dec_ok[j]
    except Exception as e:
        # per-image decode below recovers the rows, but a systematically
        # broken decode_batch must not hide (ADVICE.md r2): say so once
        fused_fetch = None
        errors_all = [None] * len(blobs)
        print(f"warning: {codec.name} decode_batch failed "
              f"({e!r}); falling back to per-image decode")

    if fused_fetch is not None:
        # untimed: the PNG-save protocol (bench.rs:50-56) still wants the
        # decoded images on disk for every lossy image. A fetch failure must
        # not abort the run (per-image continue-on-error, bench.rs:78): the
        # row loop below decodes per image when decoded_all[i] stays None,
        # and the already-fetched MSE scalars remain valid.
        try:
            fetched = fused_fetch()
        except Exception as e:
            print(f"warning: {codec.name} decoded-image fetch failed "
                  f"({e!r}); falling back to per-image decode")
        else:
            for j, i in enumerate(ok_idx):
                decoded_all[i] = fetched[j]

    for p, img, data, decoded, error in zip(names, imgs, blobs, decoded_all,
                                            errors_all):
        try:
            if isinstance(data, Exception):
                raise data
            if decoded is None:
                # error already set means the fused path timed this image's
                # decode leg and only the untimed image fetch failed: the
                # fallback decode here exists for the PNG-save protocol and
                # must not count the leg twice
                timed = error is None
                t1 = time.perf_counter()
                decoded = codec.decode(data)
                if timed:
                    res.decode_s += time.perf_counter() - t1
            h, w = img.shape[:2]
            ratio = len(data) / (w * h * 24)
            if error is None:
                error = compute_error(img, decoded)
            if error != 0.0:
                stem = os.path.splitext(os.path.basename(str(p)))[0]
                image_io.save_png(decoded, os.path.join(output_dir, stem + ".png"))
                if codec.is_lossless:
                    raise AssertionError(
                        f"lossless codec {codec.name} round-trip mismatch (MSE={error})")
            if verbose:
                print(f"bench: {p}: {len(data)} B, ratio {ratio * 100:.3f}%, MSE {error:.3f}")
            yield [str(p), len(data), ratio * 100.0, error]
        except Exception as e:
            res.failures.append((str(p), repr(e)))
            print(f"error: {p}: {e!r}")


def _measure_one(codec: Codec, path, output_dir: str, res: BenchResult, verbose: bool):
    if verbose:
        print(f"Processing {path!r}...")
    img = image_io.load_image(path)
    h, w = img.shape[:2]

    t0 = time.perf_counter()
    data = codec.encode(img)
    t1 = time.perf_counter()
    decoded = codec.decode(data)
    t2 = time.perf_counter()

    res.encode_s += t1 - t0
    res.decode_s += t2 - t1
    res.megapixels += w * h / 1e6

    compressed_size = len(data)
    raw_size = w * h * 24  # bytes-vs-24 convention (bench.rs:41)
    ratio = compressed_size / raw_size
    error = compute_error(img, decoded)

    if error != 0.0:
        stem = os.path.splitext(os.path.basename(str(path)))[0]
        image_io.save_png(decoded, os.path.join(output_dir, stem + ".png"))
        if codec.is_lossless:
            raise AssertionError(f"lossless codec {codec.name} round-trip mismatch (MSE={error})")

    if verbose:
        print(f"bench: {compressed_size} B, ratio {ratio * 100:.3f}%, MSE {error:.3f}, "
              f"enc {t1 - t0:.3f}s dec {t2 - t1:.3f}s")
    return [str(path), compressed_size, ratio * 100.0, error]
