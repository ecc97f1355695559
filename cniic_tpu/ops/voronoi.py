"""Voronoi reconstruction kernel (reference src/codec/clusterc.rs:180-186).

For every pixel, the reference picks the centroid minimizing
``(c.x - x).pow(2) + (c.y - y).pow(2)`` in u32 arithmetic, which *wraps*
for centroids left of / above the pixel — but modular squaring undoes the
wrap (``(-d)^2 = d^2 mod 2^32``), so in release builds this is exactly the
plain 2-D squared distance for any image-sized coordinates. The real
semantic here is that **color is ignored in reconstruction** (each pixel
takes the color of the positionally-nearest centroid), which is why the
published voronoi MSE sits at 4,000-6,500. We use the same wrapping uint32
ops on device, so behavior is bit-identical either way; ties resolve to the
first (lowest index) centroid like Rust's ``min_by_key``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BLOCK = 32768


@functools.partial(jax.jit, static_argnames=("w", "h"))
def _reconstruct(cx, cy, colors, kmask, w: int, h: int):
    n = w * h
    n_pad = -(-n // _BLOCK) * _BLOCK
    idx = jnp.arange(n_pad, dtype=jnp.uint32)
    xs = idx % jnp.uint32(w)
    ys = idx // jnp.uint32(w)

    def block(args):
        x, y = args
        dx = cx[None, :] - x[:, None]   # uint32, wraps like the reference
        dy = cy[None, :] - y[:, None]
        d = dx * dx + dy * dy           # u32 mul/add wrap (mod 2^32)
        d = jnp.where(kmask[None, :], d, jnp.uint32(0xFFFFFFFF))
        return jnp.argmin(d, axis=1).astype(jnp.int32)

    nb = n_pad // _BLOCK
    best = jax.lax.map(block, (xs.reshape(nb, _BLOCK), ys.reshape(nb, _BLOCK))).reshape(-1)
    return colors[best[:n]]


_reconstruct_vmapped = functools.partial(jax.jit, static_argnames=("w", "h"))(
    jax.vmap(_reconstruct.__wrapped__, in_axes=(0, 0, 0, 0, None, None)))


def _pad_batch(centroids_list, colors_list):
    k_max = max(c.shape[0] for c in centroids_list)
    k_pad = max(-(-k_max // 128) * 128, 128)
    B = len(centroids_list)
    cx = np.zeros((B, k_pad), dtype=np.uint32)
    cy = np.zeros((B, k_pad), dtype=np.uint32)
    cols = np.zeros((B, k_pad, 3), dtype=np.uint8)
    kmask = np.zeros((B, k_pad), dtype=bool)
    for b, (cxy, cl) in enumerate(zip(centroids_list, colors_list)):
        k = cxy.shape[0]
        cx[b, :k] = cxy[:, 0]
        cy[b, :k] = cxy[:, 1]
        cols[b, :k] = cl
        kmask[b, :k] = True
    return cx, cy, cols, kmask


def reconstruct(centroids_xy: np.ndarray, colors: np.ndarray, w: int, h: int) -> np.ndarray:
    """centroids_xy uint32[k, 2], colors uint8[k, 3] -> uint8[h, w, 3]."""
    return reconstruct_batch([centroids_xy], [colors], w, h)[0]


def reconstruct_batch(centroids_list, colors_list, w: int, h: int):
    """Same-shape batch decode: one vmapped device program + one image
    fetch instead of a dispatch round trip per image (the tunnel costs
    ~0.1 s per sync, which dominated per-image voronoi decode).
    Returns a list of uint8[h, w, 3]."""
    cx, cy, cols, kmask = _pad_batch(centroids_list, colors_list)
    out = _reconstruct_vmapped(
        jnp.asarray(cx), jnp.asarray(cy), jnp.asarray(cols),
        jnp.asarray(kmask), w, h)
    arr = np.asarray(out).reshape(len(centroids_list), h, w, 3)
    return list(arr)


# --- fused decode + MSE (VERDICT r2 #6) -----------------------------------
#
# The runner/bench protocol needs the per-image MSE (bench.rs:95-104) and,
# for nonzero error, the decoded PNG. Fetching full reconstructed images
# over the ~35-50 MB/s tunnel just to compute a scalar made voronoi decode
# transfer-bound (3.8 MP/s in BENCH_r02). Here the reconstruction AND the
# exact integer error sums are computed in one device program; only the
# per-block int32 sums (~1 KB/image) cross the link on the timed path, and
# the reconstructed images stay in HBM behind a lazy fetch for the PNG save.

def _reconstruct_mse(cx, cy, colors, kmask, img_flat, w: int, h: int):
    """img_flat uint8[n, 3] (row-major). Returns (rec uint8[n, 3], hi, lo)
    where the exact sum of squared channel diffs is sum(hi)*2^15 + sum(lo):
    per-pixel error <= 3*255^2 and _BLOCK=32768 would push a single int32
    block sum past 2^31, so each block accumulates the quotient/remainder
    halves (by 2^15) separately and the host recombines them exactly."""
    n = w * h
    n_pad = -(-n // _BLOCK) * _BLOCK
    idx = jnp.arange(n_pad, dtype=jnp.uint32)
    xs = idx % jnp.uint32(w)
    ys = idx // jnp.uint32(w)
    img_pad = jnp.pad(img_flat.astype(jnp.int32), ((0, n_pad - n), (0, 0)))
    valid = (idx < n).astype(jnp.int32)

    def block(args):
        x, y, orig, va = args
        dx = cx[None, :] - x[:, None]   # uint32, wraps like the reference
        dy = cy[None, :] - y[:, None]
        d = dx * dx + dy * dy           # u32 mul/add wrap (mod 2^32)
        d = jnp.where(kmask[None, :], d, jnp.uint32(0xFFFFFFFF))
        best = jnp.argmin(d, axis=1).astype(jnp.int32)
        rec = colors[best]              # (bs, 3) uint8
        diff = rec.astype(jnp.int32) - orig
        perr = jnp.sum(diff * diff, axis=1, dtype=jnp.int32) * va  # <= 3*255^2
        hi = jnp.sum(perr >> 15, dtype=jnp.int32)  # <= 6*block < 2^31
        lo = jnp.sum(perr & 0x7FFF, dtype=jnp.int32)
        return rec, hi, lo

    nb = n_pad // _BLOCK
    rec, hi, lo = jax.lax.map(
        block, (xs.reshape(nb, _BLOCK), ys.reshape(nb, _BLOCK),
                img_pad.reshape(nb, _BLOCK, 3), valid.reshape(nb, _BLOCK)))
    return rec.reshape(n_pad, 3)[:n], hi, lo


_reconstruct_mse_vmapped = functools.partial(
    jax.jit, static_argnames=("w", "h"))(
    jax.vmap(_reconstruct_mse, in_axes=(0, 0, 0, 0, 0, None, None)))


def reconstruct_mse_batch(centroids_list, colors_list, w, h, originals):
    """Fused same-shape batch decode + exact MSE. originals: uint8[B, h, w, 3].
    Returns (mses list[float], fetch) where fetch() lazily pulls the
    reconstructed uint8[h, w, 3] images to host (for the PNG-save protocol)
    and the MSEs are bit-identical to runner.compute_error on the fetched
    images (integer sums, f64 division)."""
    B = len(centroids_list)
    cx, cy, cols, kmask = _pad_batch(centroids_list, colors_list)
    if isinstance(originals, jax.Array):
        # already in HBM (the encode upload, cached by the codec): the
        # timed decode path then moves only KBs over the link
        orig_dev = originals.reshape(B, h * w, 3)
    else:
        originals = np.ascontiguousarray(originals, dtype=np.uint8)
        orig_dev = jnp.asarray(originals.reshape(B, h * w, 3))
    rec_dev, hi, lo = _reconstruct_mse_vmapped(
        jnp.asarray(cx), jnp.asarray(cy), jnp.asarray(cols),
        jnp.asarray(kmask), orig_dev, w, h)
    # the small fetch is the sync point (block_until_ready is unreliable on
    # the axon stack); rec_dev stays in HBM until fetch() is called
    tot = (np.asarray(hi).astype(np.int64).sum(axis=1) << 15) + \
        np.asarray(lo).astype(np.int64).sum(axis=1)
    mses = [float(t) / (w * h) for t in tot]

    def fetch():
        return list(np.asarray(rec_dev).reshape(B, h, w, 3))

    return mses, fetch
