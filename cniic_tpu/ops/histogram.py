"""Color histogramming (reference utils.rs:4-16 `count_freqs` analog).

Colors are packed into u32 keys (r<<16 | g<<8 | b) and counted with a sort-
based unique. The reference builds a HashMap per pixel — here the whole image
is processed as one vectorized pass. (numpy's unique is a single C sort; a
device-side sort+segment variant is a drop-in upgrade for batched pipelines.)
"""

from __future__ import annotations

import numpy as np


def pack_colors(pixels: np.ndarray) -> np.ndarray:
    """(N, 3) uint8 -> uint32 keys r<<16 | g<<8 | b."""
    p = pixels.astype(np.uint32)
    return (p[:, 0] << 16) | (p[:, 1] << 8) | p[:, 2]


def unpack_colors(keys: np.ndarray) -> np.ndarray:
    """uint32 keys -> (N, 3) uint8."""
    keys = keys.astype(np.uint32)
    out = np.empty((keys.size, 3), dtype=np.uint8)
    out[:, 0] = (keys >> 16) & 0xFF
    out[:, 1] = (keys >> 8) & 0xFF
    out[:, 2] = keys & 0xFF
    return out


def color_histogram(pixels: np.ndarray):
    """Unique colors of an (N, 3) uint8 stream.

    Returns (colors uint8[u, 3], counts int64[u], inverse int32[N]) with
    ``colors[inverse] == pixels``. Unique order: ascending packed key.

    Implementation: native LSD radix sort + boundary pass (cniic_native.c
    hist_u32) — an order of magnitude faster than numpy's stable argsort on
    this class of host.
    """
    from .. import native

    uniq, counts, inverse = native.hist_rgb(np.ascontiguousarray(pixels))
    return unpack_colors(uniq.astype(np.uint32)), counts, inverse


def key_histogram(keys: np.ndarray):
    """(uniq keys asc, counts, inverse int32) for uint32 keys."""
    from .. import native

    n = keys.size
    if n == 0:
        return keys[:0], np.zeros(0, np.int64), np.zeros(0, np.int32)
    return native.hist_u32(keys)
