"""CLI entry point (reference src/main.rs).

Usage mirrors the reference binary:

    python -m cniic_tpu --codec=<spec> <img files...>
    python -m cniic_tpu --special=hilbert <img files...>

``--special`` is tried first, then ``--codec`` (main.rs:17-21). The hilbert
special dumps three CSVs per image (rect/small/large traversals,
main.rs:31-49) consumed by the analysis scripts; the header is
``red,blue,green`` — the reference's exact (mislabeled) header — while the
values are r,g,b.
"""

from __future__ import annotations

import csv
import os
import sys

from . import hilbert, image_io, runner
from .codecs import from_spec

USAGE = """Usage: python -m cniic_tpu --codec=<codec> [<img file>..]
       python -m cniic_tpu --special=hilbert [<img file>..]
Available codecs:
  hufman
  zip(dict) | zip(back)
  hilbert(rle) | hilbert(rle(<d>)) | hilbert(zip)
  delta
  cluster-colors(<n>) | ccol(<n>)
  voronoi(<n>)"""


def _next_pow2(x: int) -> int:
    return 1 if x <= 1 else 1 << (x - 1).bit_length()


def _under_output(path: str, new_ext: str, output_dir: str = "output") -> str:
    base = os.path.basename(path)
    stem = os.path.splitext(base)[0]
    return os.path.join(output_dir, stem + "." + new_ext)


def _special_hilbert(paths) -> None:
    os.makedirs("output", exist_ok=True)
    for p in paths:
        img = image_io.load_image(p)
        h, w = img.shape[:2]

        def dump(coords, suffix):
            out = _under_output(p, f"{suffix}.hilbert.csv")
            with open(out, "w", newline="") as fh:
                cw = csv.writer(fh)
                cw.writerow(["red", "blue", "green"])  # reference header (main.rs:38)
                for x, y in coords:
                    px = img[y, x]
                    cw.writerow([px[0], px[1], px[2]])

        dump(hilbert.scan_coords(w, h), "rect")

        # "largest inscribed" power-of-two square, replicating the
        # reference's exact formula `next_power_of_two() >> 1`
        # (hilbert.rs:18) — including its quirk that an exactly
        # power-of-two dimension is HALVED (w=512 -> 256), since Rust's
        # next_power_of_two(512) == 512. Pinned by tests/test_cli.py.
        so = min(_next_pow2(w) >> 1, _next_pow2(h) >> 1)
        # a dimension of 1 gives side 0: the reference's iterator is simply
        # empty there — emit a header-only CSV instead of crashing
        dump(hilbert.scan_coords(so, so) if so > 0 else [], "small")

        # smallest covering square, out-of-bounds filtered (hilbert.rs:25-32)
        so = max(_next_pow2(w), _next_pow2(h))
        coords = hilbert.scan_coords(so, so)
        dump(((x, y) for x, y in coords if x < w and y < h), "large")


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(USAGE, file=sys.stderr)
        return 1
    command, files = argv[0], argv[1:]

    if command.startswith("--special="):
        special = command[len("--special="):]
        if special != "hilbert":
            print(f"Invalid special command: {special!r}", file=sys.stderr)
            return 1
        _special_hilbert(files)
        return 0

    batch = 1
    resume = False
    rest = []
    for a in [command] + files:
        if a.startswith("--batch="):
            try:
                batch = int(a[len("--batch="):])
            except ValueError:
                print(f"Malformed batch argument: {a!r}", file=sys.stderr)
                print(USAGE, file=sys.stderr)
                return 1
        elif a == "--resume":
            resume = True
        else:
            rest.append(a)
    if not rest:
        print(USAGE, file=sys.stderr)
        return 1
    command, files = rest[0], rest[1:]

    if command.startswith("--codec="):
        try:
            codec = from_spec(command[len("--codec="):])
        except Exception as e:
            print(f"Malformed codec argument\n{e}", file=sys.stderr)
            return 1
        res = runner.measure_all(codec, files, batch=batch, resume=resume)
        print(f"{codec.name}: {len(res.rows)} images ok, {len(res.failures)} failed; "
              f"mean ratio {res.mean_ratio:.3f}%, mean MSE {res.mean_error:.3f}; "
              f"encode {res.encode_mps:.3f} MP/s")
        return 0 if not res.failures else 2

    print(USAGE, file=sys.stderr)
    return 1
