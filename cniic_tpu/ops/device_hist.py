"""Batched device-side symbol statistics (sort + segment reductions).

The Huffman-family encoders need, per image: the set of distinct symbol
keys, their frequencies, and per-pixel symbol ids. On device this is one
batched radix/bitonic sort plus sorted-segment reductions; per-pixel ids are
recovered later inside the pack kernel as ``searchsorted(uniq, keys)`` so
the full-resolution id array never crosses the host boundary.

Padding convention: key streams are padded with 0xFFFFFFFF (greater than any
24/27-bit symbol key); the sentinel sorts to the tail and is dropped by the
host when it slices the per-image unique count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SENTINEL = np.uint32(0xFFFFFFFF)


@jax.jit
def sort_keys(keys):
    """keys uint32[B, n_pad] -> (sorted uint32[B, n_pad], n_uniq int32[B])."""
    sk = jnp.sort(keys, axis=1)
    n_uniq = 1 + jnp.sum((sk[:, 1:] != sk[:, :-1]).astype(jnp.int32), axis=1)
    return sk, n_uniq


@functools.partial(jax.jit, static_argnames=("u_pad",))
def segment_stats(sk, u_pad: int):
    """sorted keys uint32[B, n_pad] -> (uniq uint32[B, u_pad],
    counts int32[B, u_pad]); empty tail slots hold the sentinel."""

    def per_image(row):
        boundary = jnp.concatenate(
            [jnp.ones((1,), jnp.int32), (row[1:] != row[:-1]).astype(jnp.int32)])
        seg = jnp.cumsum(boundary, dtype=jnp.int32) - 1
        counts = jax.ops.segment_sum(jnp.ones_like(seg), seg, num_segments=u_pad,
                                     indices_are_sorted=True)
        uniq = jax.ops.segment_max(row, seg, num_segments=u_pad,
                                   indices_are_sorted=True)
        uniq = jnp.where(counts > 0, uniq, SENTINEL)
        return uniq, counts

    return jax.vmap(per_image)(sk)


def bucket(n: int, lo: int = 4096) -> int:
    if n <= lo:
        return lo
    b = 1 << (n - 1).bit_length()
    for frac in (b // 2 + b // 8, b // 2 + b // 4, b // 2 + 3 * b // 8, b):
        if n <= frac:
            return frac
    return b
