"""Codec registry and spec dispatch (reference src/codec.rs:111-127).

Alternatives are tried in the reference's fixed order: ClusterColors,
VoronoiCluster, Delta, Hilbert, Hufman, Zip (codec.rs:120-127) — the order
matters because several grammars overlap loosely.
"""

from __future__ import annotations

from .. import specs
from .base import Codec
from .clusterc import ClusterColors, VoronoiCluster, parse_cluster_colors, parse_voronoi
from .delta import Delta
from .hilbertc import Hilbert
from .hufman import Hufman
from .zipc import Zip
from . import delta as _delta, hilbertc as _hilbertc, hufman as _hufman, zipc as _zipc

__all__ = [
    "Codec", "ClusterColors", "VoronoiCluster", "Delta", "Hilbert",
    "Hufman", "Zip", "from_spec", "ALL_SPECS",
]

# one representative spec per codec family (the reference Makefile sweep)
ALL_SPECS = (
    "hufman",
    "zip(dict)",
    "zip(back)",
    "hilbert(rle)",
    "hilbert(zip)",
    "delta",
    "hilbert(rle(4))",
    "cluster-colors(64)",
    "voronoi(256)",
)


def from_spec(spec: str) -> Codec:
    """Parse a codec spec string (AnyCodec::from_str, codec.rs:43-57)."""
    return (
        specs.Alternatives(spec)
        .then_try("ClusterColors", parse_cluster_colors)
        .then_try("VoronoiCluster", parse_voronoi)
        .then_try("Delta", _delta.parse)
        .then_try("Hilbert", _hilbertc.parse)
        .then_try("Hufman", _hufman.parse)
        .then_try("Zip", _zipc.parse)
        .end()
    )
