"""Stage profile of Hufman ENCODE at north-star statistics.

The decode side at these statistics (370-460k unique colors) yielded a
1.7x series in r5; this probes whether the encode side has the same
unexplored headroom. Stages timed per image, CPU-only (the Hufman leg
never touches the device on the default path).

Usage: python scripts/experiments/profile_hufenc.py [n_images]
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from PIL import Image

sys.path.insert(0, ".")

from cniic_tpu import huffman, native, wire  # noqa: E402
from cniic_tpu.codecs.base import pixels_row_major  # noqa: E402
from cniic_tpu.ops import histogram  # noqa: E402


def profile_one(img: np.ndarray) -> dict:
    mp = img.shape[0] * img.shape[1] / 1e6
    t = {}

    t0 = time.perf_counter()
    pixels = pixels_row_major(img)
    t["pixels"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    colors, counts, inverse = histogram.color_histogram(pixels)
    t["histogram"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    leaf_payloads = np.frombuffer(
        wire.rgb_stream_to_wire(colors), dtype=np.uint8
    ).reshape(-1, wire.RGB_WIRE_SIZE)
    t["leaf_wire"] = time.perf_counter() - t0

    # build_codebook internals, split out (production fused-C-sort path)
    freqs = np.asarray(counts, dtype=np.uint64)
    t0 = time.perf_counter()
    lens = native.huf_lens_unsorted(freqs)
    t["huf_lens_unsorted"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    codes, tags, leaf_sym = native.huf_canonical(lens)
    t["huf_canonical"] = time.perf_counter() - t0

    book = huffman.Codebook(codes=codes, lens=lens, tags=tags,
                            leaf_sym=leaf_sym)

    t0 = time.perf_counter()
    tree = huffman.serialize_tree(book, leaf_payloads)
    t["serialize_tree"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    payload = native.pack_bits(book.codes, book.lens,
                               np.asarray(inverse, np.int32))
    t["pack_bits"] = time.perf_counter() - t0

    total = sum(t.values())
    return {
        "uniques": int(colors.shape[0]),
        "mp": mp,
        "stages_ms_per_mp": {k: v / mp * 1e3 for k, v in t.items()},
        "total_ms_per_mp": total / mp * 1e3,
        "mps": mp / total,
        "bytes": len(tree) + len(payload) + 8,
    }


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    paths = sorted(__import__("glob").glob("data/ns1000/ns_*.png"))[:n]
    # warm pass (page cache, allocator)
    img0 = np.asarray(Image.open(paths[0]).convert("RGB"))
    profile_one(img0)

    agg: dict[str, list] = {}
    for p in paths:
        img = np.asarray(Image.open(p).convert("RGB"))
        r = profile_one(img)
        print(f"{p.split('/')[-1]}: uniq={r['uniques']:>7} "
              f"total={r['total_ms_per_mp']:6.1f} ms/MP ({r['mps']:5.1f} MP/s)")
        for k, v in r["stages_ms_per_mp"].items():
            agg.setdefault(k, []).append(v)

    print("\nmedian ms/MP per stage:")
    tot = 0.0
    for k, vs in agg.items():
        m = float(np.median(vs))
        tot += m
        print(f"  {k:<16} {m:7.2f}")
    print(f"  {'TOTAL':<16} {tot:7.2f}  ({1e3 / tot:.1f} MP/s)")


if __name__ == "__main__":
    main()
