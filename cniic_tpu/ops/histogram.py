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
    """
    keys = pack_colors(pixels)
    uniq, inverse, counts = np.unique(keys, return_inverse=True, return_counts=True)
    return unpack_colors(uniq), counts, inverse.astype(np.int32)
