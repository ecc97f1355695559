"""Adversarial-input fuzzing of every decode path (VERDICT r3 #5).

The nine codec families parse untrusted bytes partly in hand-written C
(``cniic_native.c``) — one missed bound there is memory corruption, not an
exception. This harness feeds truncated, bit-flipped, random, and
structure-aware-corrupted streams into every family's decoder. The
contract: decode either succeeds (a mutation can be benign — e.g. a bit
flip inside pixel payload) or raises the ValueError family (WireError is a
subclass) — never a crash, hang, MemoryError-scale allocation, or silent
type confusion.

``make asan-fuzz`` reruns exactly this file against an
address-sanitized build of the C engines (result recorded in BENCH_NOTES).

Reference decode surface: codec.rs:16 (decode returns Option — malformed
input is a recoverable failure, not UB), back.rs:648-706, huf.rs parse.
"""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from cniic_tpu.codecs import from_spec

# one decode machine per entry: (spec, mutation budget scale)
FAMILIES = [
    ("hufman", 1.0),
    ("zip(dict)", 1.0),
    ("zip(back)", 1.0),
    ("hilbert(rle)", 1.0),
    ("hilbert(rle(2))", 1.0),
    ("hilbert(zip)", 1.0),
    ("delta", 1.0),
    ("cluster-colors(4)", 0.4),  # device-side tails: keep the budget lean
    ("voronoi(4)", 0.4),
]

ALLOWED = (ValueError,)  # WireError subclasses ValueError


def _test_image() -> np.ndarray:
    rng = np.random.default_rng(99)
    img = np.zeros((16, 24, 3), np.uint8)
    img[:, :, 0] = np.linspace(0, 255, 24, dtype=np.uint8)[None, :]
    img[4:9, 3:15] = [200, 40, 90]
    img[10:, 16:] = rng.integers(0, 256, (6, 8, 3))
    return img


def _check(codec, blob: bytes) -> str:
    """Decode one mutated stream; return 'ok' or 'raised'."""
    try:
        out = codec.decode(blob)
    except ALLOWED:
        return "raised"
    assert isinstance(out, np.ndarray) and out.dtype == np.uint8 \
        and out.ndim == 3 and out.shape[2] == 3, \
        f"decode returned a malformed image: {type(out)}"
    # a benign mutation must not smuggle out an image past the wire-layer
    # plausibility cap (2^27 pixels, wire.ByteReader.dims)
    assert out.size <= 3 << 27, f"implausible decode size {out.shape}"
    return "ok"


@pytest.mark.parametrize("spec,scale", FAMILIES, ids=[f for f, _ in FAMILIES])
def test_fuzz_decode(spec, scale):
    codec = from_spec(spec)
    stream = codec.encode(_test_image())
    data = np.frombuffer(stream, np.uint8).copy()
    n = data.size
    rng = np.random.default_rng(zlib.crc32(spec.encode()))
    outcomes = {"ok": 0, "raised": 0}

    def run(blob):
        outcomes[_check(codec, bytes(blob))] += 1

    # 1. truncations: every short prefix + a sweep of random cut points
    for cut in range(min(n, 40)):
        run(data[:cut])
    for cut in rng.integers(0, n, int(30 * scale)):
        run(data[:cut])

    # 2. single-bit flips at random positions
    for pos in rng.integers(0, n, int(120 * scale)):
        m = data.copy()
        m[pos] ^= 1 << int(rng.integers(0, 8))
        run(m)

    # 3. byte smashes: random position forced to adversarial values
    for pos in rng.integers(0, n, int(60 * scale)):
        for val in (0x00, 0xFF, 0x80):
            m = data.copy()
            m[pos] = val
            run(m)

    # 4. structure-aware: headers/length prefixes live in the first bytes —
    #    corrupt each of them to the classic traps (zero, max, off-by-one)
    for pos in range(min(n, 24)):
        for val in (0x00, 0xFF, (int(data[pos]) + 1) & 0xFF):
            m = data.copy()
            m[pos] = val
            run(m)

    # 5. random garbage streams (including empty)
    for ln in list(rng.integers(0, 400, int(25 * scale))) + [0, 1, 2, 3]:
        run(rng.integers(0, 256, int(ln)).astype(np.uint8))

    # 6. tail extension: valid stream + trailing junk
    for extra in (1, 7, 256):
        run(np.concatenate([data, rng.integers(0, 256, extra).astype(np.uint8)]))

    # sanity: the harness must have actually exercised both outcomes
    assert outcomes["raised"] > 0, "no mutation was ever rejected"
    assert _check(codec, bytes(data)) == "ok", "unmutated stream must decode"
