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


def reconstruct(centroids_xy: np.ndarray, colors: np.ndarray, w: int, h: int) -> np.ndarray:
    """centroids_xy uint32[k, 2], colors uint8[k, 3] -> uint8[h, w, 3]."""
    k = centroids_xy.shape[0]
    k_pad = max(-(-k // 128) * 128, 128)
    cx = np.zeros(k_pad, dtype=np.uint32)
    cy = np.zeros(k_pad, dtype=np.uint32)
    cx[:k] = centroids_xy[:, 0]
    cy[:k] = centroids_xy[:, 1]
    cols = np.zeros((k_pad, 3), dtype=np.uint8)
    cols[:k] = colors
    kmask = np.zeros(k_pad, dtype=bool)
    kmask[:k] = True
    out = _reconstruct(jnp.asarray(cx), jnp.asarray(cy), jnp.asarray(cols), jnp.asarray(kmask), w, h)
    return np.asarray(out).reshape(h, w, 3)
