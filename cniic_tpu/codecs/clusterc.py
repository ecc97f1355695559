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

from .. import native, wire
from ..ops import histogram, kmeans, voronoi
from .base import Codec, pixels_row_major
from .hufman import Hufman


def _palette_stream_parts(n: int, counts, inverse, centroids, assignment):
    """(ids, freq, leaf) for the Huffman stream of the reduced image.

    Built straight from the palette statistics — byte-identical to
    Hufman().encode(palette[assignment][inverse]) but skips re-histogramming
    the full reduced image. Distinct centroid colors can merge (several
    clusters, one color), so dedup first.
    """
    palette = centroids.astype(np.uint8)              # means stay in 0..255
    pal_keys = histogram.pack_colors(palette)
    uniq_keys, pal_rank = np.unique(pal_keys, return_inverse=True)
    cluster_w = np.bincount(assignment, weights=counts.astype(np.float64),
                            minlength=n)
    freq = np.zeros(uniq_keys.size, dtype=np.int64)
    np.add.at(freq, pal_rank, cluster_w.astype(np.int64))
    # drop colors whose clusters are all empty: they never appear in the
    # reduced image, so the delegate Hufman path would not emit a leaf
    # for them (ADVICE.md r1 — zero-freq leaves broke the byte-identity
    # claim and wasted ~13 bytes each)
    present = freq > 0
    if not present.all():
        remap = np.cumsum(present) - 1
        pal_rank = remap[pal_rank]
        uniq_keys = uniq_keys[present]
        freq = freq[present]
    leaf = np.frombuffer(
        wire.rgb_stream_to_wire(histogram.unpack_colors(uniq_keys.astype(np.uint32))),
        dtype=np.uint8).reshape(-1, wire.RGB_WIRE_SIZE)
    # per-pixel palette ids in one C gather (numpy fancy-index: 4 ms/MP)
    ids = native.gather_i32(inverse, pal_rank.astype(np.int32)[assignment])
    return ids, freq, leaf


class ClusterColors(Codec):
    def __init__(self, n: int) -> None:
        self.n = int(n)

    def encode(self, img: np.ndarray) -> bytes:
        from .. import huffman

        h, w = img.shape[:2]
        pixels = pixels_row_major(img)
        colors, counts, inverse = histogram.color_histogram(pixels)
        # w_bound: no color frequency can exceed the pixel count, so the
        # digit-plane compile keys are shape-driven, not content-driven
        # (ops/kmeans.py _prep_host_batch)
        centroids, assignment, _ = kmeans.kmeans(
            colors.astype(np.int64), self.n, weights=counts.astype(np.int64),
            w_bound=h * w)
        ids, freq, leaf = _palette_stream_parts(
            self.n, counts, inverse, centroids, assignment)
        stream = huffman.encode_stream(ids, freq, leaf)
        return wire.pack_dims(w, h) + stream

    def encode_batch(self, imgs) -> list[bytes]:
        """Batched: per-image host histograms (native radix), one lockstep
        device k-means over every image's unique colors (lanes freeze as
        they converge — results are bit-identical to `encode`), then one
        batched device bit-pack for all the Huffman payloads. This is the
        reference's rayon fan-out (bench.rs:22-27) as a batch axis.
        """
        from .. import huffman

        if len(imgs) <= 1:
            return [self.encode(img) for img in imgs]
        stats = [histogram.color_histogram(pixels_row_major(im)) for im in imgs]
        # Sort lanes by unique-color count before the lane-chunked batch
        # run: every lane in a chunk is padded to the chunk max and
        # iterates until the chunk's straggler converges, so one
        # natural-statistics lane (~500k uniques, r5 census) dragged
        # seven ~20k-unique lanes up to its 524288-row padding AND its
        # iteration count. Homogeneous chunks cut both wastes; per-lane
        # trajectories are independent, so results are bit-identical
        # under any grouping (the chunking contract, pinned by
        # tests/test_kmeans.py and test_clusterc.py).
        order = sorted(range(len(stats)),
                       key=lambda i: stats[i][0].shape[0], reverse=True)
        sorted_results = kmeans.kmeans_batch(
            [stats[i][0].astype(np.int64) for i in order], self.n,
            weights_list=[stats[i][1].astype(np.int64) for i in order],
            on_error="collect",
            w_bound=max(im.shape[0] * im.shape[1] for im in imgs))
        results: list = [None] * len(stats)
        for pos, i in enumerate(order):
            results[i] = sorted_results[pos]
        # a lane that failed the active-cluster floor yields its exception
        # in place of the stream: the runner isolates that image
        ok = [i for i, r in enumerate(results)
              if not isinstance(r, Exception)]
        parts = [
            _palette_stream_parts(self.n, stats[i][1], stats[i][2],
                                  results[i][0], results[i][1])
            for i in ok]
        streams = huffman.batch_encode_streams(
            [p[0] for p in parts], [p[1] for p in parts], [p[2] for p in parts])
        out: list = list(results)  # exceptions stay in place
        for i, s in zip(ok, streams):
            out[i] = wire.pack_dims(imgs[i].shape[1], imgs[i].shape[0]) + s
        return out

    def decode(self, data) -> np.ndarray:
        return Hufman().decode(data)

    @property
    def name(self) -> str:
        return f"cluster-colors_{self.n}"

    @property
    def is_lossless(self) -> bool:
        return False

    @property
    def pipeline_profitable(self) -> bool:
        return True  # long device k-means stages; measured win (base.py)


class VoronoiCluster(Codec):
    # at most this many encode-upload buckets stay pinned in HBM/host RAM:
    # the runner pipeline holds two groups in flight (group N decoding while
    # N+1 encodes in the worker thread), each with a handful of shape
    # buckets at most
    _DEV_CACHE_CAP = 4

    def __init__(self, n: int) -> None:
        self.n = int(n)
        # ((h, w), tuple(id(img))) -> (list of original np images, device
        # uint8[B, h, w, 3]): the encode upload kept alive so the fused
        # decode+MSE path can skip re-uploading the originals (3 B/pixel
        # over the ~35-50 MB/s tunnel was the whole decode budget). Keyed
        # per encode bucket and POPPED by decode_mse_batch (ADVICE r3:
        # clearing at encode start let the pipelined worker thread wipe
        # group N's entry before group N's decode read it). The cached list
        # holds strong refs, so while an entry lives its ids cannot be
        # reused — a key match implies object identity. FIFO-evicted at
        # _DEV_CACHE_CAP so stale shapes can't accumulate over a sweep.
        self._dev_imgs: dict = {}

    def _cache_put(self, key, value) -> None:
        # under the runner pipeline this runs in the worker thread while
        # decode_mse_batch pops from the main thread — eviction must
        # tolerate the oldest key vanishing between next(iter()) and pop
        self._dev_imgs[key] = value
        while len(self._dev_imgs) > self._DEV_CACHE_CAP:
            try:
                self._dev_imgs.pop(next(iter(self._dev_imgs)), None)
            except (StopIteration, RuntimeError):
                break

    def _serialize(self, w: int, h: int, centroids: np.ndarray) -> bytes:
        out = bytearray()
        out += wire.pack_dims(w, h)  # same bytes as u32(w)+u32(h), adds the 2^27 cap
        out += wire.pack_u64(self.n)
        for cx, cy, r, g, b in centroids.tolist():
            out += wire.pack_u32(cx)
            out += wire.pack_u32(cy)
            out += wire.pack_rgb(r, g, b)
        return bytes(out)

    def encode(self, img: np.ndarray) -> bytes:
        h, w = img.shape[:2]
        cents, dev = kmeans.voronoi_centroids_batch(
            img[None], self.n, return_device_imgs=True)
        if dev is not None:
            self._cache_put(((h, w), (id(img),)), ([img], dev))
        return self._serialize(w, h, cents[0])

    def encode_batch(self, imgs) -> list[bytes]:
        """Batched: images are bucketed by shape and each bucket runs one
        lockstep device k-means over its stacked (x, y, r, g, b) point sets
        (lanes freeze as they converge, so per-image centroids are
        bit-identical to `encode`). Only the uint8 images are uploaded and
        only the (k, 5) centroids come back."""
        buckets: dict[tuple[int, int], list[int]] = {}
        for i, im in enumerate(imgs):
            buckets.setdefault(im.shape[:2], []).append(i)
        out: list = [None] * len(imgs)
        for (h, w), idxs in buckets.items():
            cents, dev = kmeans.voronoi_centroids_batch(
                np.stack([imgs[i] for i in idxs]), self.n,
                on_error="collect", return_device_imgs=True)
            if dev is not None:
                key = ((h, w), tuple(id(imgs[i]) for i in idxs))
                self._cache_put(key, ([imgs[i] for i in idxs], dev))
            for i, c in zip(idxs, cents):
                # failed lanes carry their exception through to the runner
                out[i] = c if isinstance(c, Exception) else self._serialize(w, h, c)
        return out

    @staticmethod
    def _parse(data):
        r = wire.ByteReader(data)
        w, h = r.dims()
        k = r.u64()
        # each centroid costs exactly 19 wire bytes (u32 x, u32 y, 11-byte
        # Rgb): an untrusted k beyond what the stream can hold must die
        # before the (k, 2) allocation (fuzz harness: a corrupt count asked
        # for 4 EiB). k == 0 is equally malformed — no encoder produces it
        # (the k-means floor rejects k < 1) and decoding it would fabricate
        # an all-black image where the reference's min_by_key over an empty
        # centroid set panics (clusterc.rs:143-297)
        if k == 0 or k > r.remaining() // 19:
            raise wire.WireError(
                f"voronoi centroid count {k} invalid for stream capacity")
        xy = np.empty((k, 2), dtype=np.uint32)
        colors = np.empty((k, 3), dtype=np.uint8)
        for i in range(k):
            xy[i, 0] = r.u32()
            xy[i, 1] = r.u32()
            colors[i] = r.rgb()
        return w, h, xy, colors

    def decode(self, data) -> np.ndarray:
        w, h, xy, colors = self._parse(data)
        return voronoi.reconstruct(xy, colors, w, h)

    def decode_batch(self, blobs) -> list[np.ndarray]:
        """Shape-bucketed vmapped reconstruction: one device program + one
        image fetch per bucket instead of a tunnel round trip per image."""
        parsed = [self._parse(b) for b in blobs]
        buckets: dict[tuple[int, int], list[int]] = {}
        for i, (w, h, _, _) in enumerate(parsed):
            buckets.setdefault((w, h), []).append(i)
        out: list[np.ndarray | None] = [None] * len(blobs)
        for (w, h), idxs in buckets.items():
            imgs = voronoi.reconstruct_batch(
                [parsed[i][2] for i in idxs], [parsed[i][3] for i in idxs],
                w, h)
            for i, im in zip(idxs, imgs):
                out[i] = im
        return out

    def decode_mse_batch(self, blobs, originals):
        """Fused device decode + exact MSE (VERDICT r2 #6): reconstruction
        and the integer error sums run in one device program per shape
        bucket; only ~1 KB/image of block sums crosses the link. Returns
        (mses, fetch) where fetch() lazily pulls the reconstructed images
        for the PNG-save protocol (bench.rs:50-56) and each MSE equals
        runner.compute_error on the fetched image bit-for-bit."""
        parsed = [self._parse(b) for b in blobs]
        buckets: dict[tuple[int, int], list[int]] = {}
        for i, (w, h, _, _) in enumerate(parsed):
            if originals[i].shape[:2] != (h, w):
                raise ValueError("original/decoded shape mismatch")
            buckets.setdefault((w, h), []).append(i)
        mses: list = [None] * len(blobs)
        fetchers = []
        for (w, h), idxs in buckets.items():
            # reuse the encode upload when these exact images just went up:
            # pop our own entry (cached list holds strong refs, so a key
            # match implies the ids are the same live objects)
            key = ((h, w), tuple(id(originals[i]) for i in idxs))
            cached = self._dev_imgs.pop(key, None)
            if cached is not None:
                orig = cached[1]
            else:
                orig = np.stack([originals[i] for i in idxs])
            m, fetch = voronoi.reconstruct_mse_batch(
                [parsed[i][2] for i in idxs], [parsed[i][3] for i in idxs],
                w, h, orig)
            for i, v in zip(idxs, m):
                mses[i] = v
            fetchers.append((idxs, fetch))

        def fetch_all():
            out: list = [None] * len(blobs)
            for idxs, f in fetchers:
                for i, im in zip(idxs, f()):
                    out[i] = im
            return out

        return mses, fetch_all

    @property
    def name(self) -> str:
        return f"voronoi_{self.n}"

    @property
    def is_lossless(self) -> bool:
        return False

    @property
    def pipeline_profitable(self) -> bool:
        return True  # long device k-means stages; measured win (base.py)


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
