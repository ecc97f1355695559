"""The k-means codecs (reference src/codec/clusterc.rs).

`cluster-colors(n)`: weighted k-means over the image's *unique* colors
(weights = occurrence counts, distance ignores weights, means are
weight-averaged with integer truncation, clusterc.rs:74-113), every pixel
remapped to its cluster centroid, then delegated to the Hufman codec
(clusterc.rs:18-57). Decode IS Hufman decode.

`voronoi(n)`: k-means over all pixels as 5-D (x, y, r, g, b) points
(distance = sqrt(dx^2+dy^2+|drgb|^2), means integer-truncated,
clusterc.rs:206-247); only the dimensions and the k centroids are written
(19 bytes each: u32 x, u32 y, 11-byte Rgb; clusterc.rs:147-166). Decode
rebuilds each pixel from the nearest centroid by the wrapping-u32 2-D
distance (color ignored) — see ops/voronoi.py.
"""

from __future__ import annotations

import numpy as np

from .. import wire
from ..ops import histogram, kmeans, voronoi
from .base import Codec, pixels_row_major
from .hufman import Hufman


class ClusterColors(Codec):
    def __init__(self, n: int) -> None:
        self.n = int(n)

    def encode(self, img: np.ndarray) -> bytes:
        pixels = pixels_row_major(img)
        colors, counts, inverse = histogram.color_histogram(pixels)
        centroids, assignment, _ = kmeans.kmeans(
            colors.astype(np.int64), self.n, weights=counts.astype(np.int64))
        palette = centroids.astype(np.uint8)          # means stay in 0..255
        reduced = palette[assignment][inverse].reshape(img.shape)
        return Hufman().encode(reduced)

    def decode(self, data) -> np.ndarray:
        return Hufman().decode(data)

    @property
    def name(self) -> str:
        return f"cluster-colors_{self.n}"

    @property
    def is_lossless(self) -> bool:
        return False


class VoronoiCluster(Codec):
    def __init__(self, n: int) -> None:
        self.n = int(n)

    def encode(self, img: np.ndarray) -> bytes:
        h, w = img.shape[:2]
        pixels = pixels_row_major(img).astype(np.int64)
        xs = np.tile(np.arange(w, dtype=np.int64), h)
        ys = np.repeat(np.arange(h, dtype=np.int64), w)
        points = np.column_stack([xs, ys, pixels])
        centroids, _, _ = kmeans.kmeans(points, self.n)

        out = bytearray()
        out += wire.pack_u32(w)
        out += wire.pack_u32(h)
        out += wire.pack_u64(self.n)
        for cx, cy, r, g, b in centroids.tolist():
            out += wire.pack_u32(cx)
            out += wire.pack_u32(cy)
            out += wire.pack_rgb(r, g, b)
        return bytes(out)

    def decode(self, data) -> np.ndarray:
        r = wire.ByteReader(data)
        w, h = r.dims()
        k = r.u64()
        xy = np.empty((k, 2), dtype=np.uint32)
        colors = np.empty((k, 3), dtype=np.uint8)
        for i in range(k):
            xy[i, 0] = r.u32()
            xy[i, 1] = r.u32()
            colors[i] = r.rgb()
        return voronoi.reconstruct(xy, colors, w, h)

    @property
    def name(self) -> str:
        return f"voronoi_{self.n}"

    @property
    def is_lossless(self) -> bool:
        return False


def parse_cluster_colors(spec: str) -> ClusterColors:
    """Regex c(luster)?-?col(ors)?\\(N\\) (clusterc.rs:116-141)."""
    import re

    from .. import specs

    m = re.search(r"c(?:luster)?-?col(?:ors)?\((\d+)\)", spec)
    if not m:
        raise specs.OtherParseError("Regex doesn't match")
    return ClusterColors(int(m.group(1)))


def parse_voronoi(spec: str) -> VoronoiCluster:
    import re

    from .. import specs

    m = re.search(r"voronoi\((\d+)\)", spec)
    if not m:
        raise specs.OtherParseError("Regex doesn't match")
    return VoronoiCluster(int(m.group(1)))
