"""Fused k-means assignment (Pallas, TPU).

The XLA iteration materializes the (points x centroids) distance matrix in
HBM and re-reads it for argmin/min/gather (~300 MB per iteration at voronoi
sizes). This kernel streams point blocks through VMEM and keeps the running
(best, cur) scores in registers, so HBM traffic per iteration drops to the
point block reads + one index write.

Layout (Mosaic-friendly for tiny d):
  * points transposed to (8, n_pad) f32 — d <= 8 dims ride the sublane axis,
    points ride lanes; padding dims are zero;
  * centroids (8, k_pad) f32 + their squared norms (1, k_pad) f32, fully
    VMEM-resident (k_pad <= 2048: 64 KB); padded centroid columns carry a
    huge csq so they never win;
  * per-point state (cur, psq, out) is (n_pad, 1) — sublane-major so the
    per-point masked-lane reduction against the (block, 128) score tile
    works directly.

Exactness (decisions must match f64, see ops/kmeans.py): with per-dim
values <= 2048, d2 = (psq - 2*p.c) + csq keeps every partial below 2^24 in
magnitude (psq - 2pc is bounded by max(psq, csq) via AM-GM), and the MXU
product runs at Precision.HIGHEST, so scores are exact integers.

Tie semantics: per-tile argmin takes the lowest lane; across tiles a strict
< keeps the earliest tile — together that is the global lowest-index argmin,
identical to jnp.argmin; the stay-on-tie rule then compares against the
current assignment's exact score.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BS = 1024   # points per grid step


def _kernel(pts_ref, psq_ref, cur_ref, cents_ref, csq_ref, out_ref):
    k_pad = cents_ref.shape[1]
    p = pts_ref[...]            # (8, BS)
    psq = psq_ref[...]          # (BS, 1) f32
    cur = cur_ref[...]          # (BS, 1) i32
    lane = jax.lax.broadcasted_iota(jnp.int32, (BS, 128), 1)

    FBIG = jnp.float32(3e38)
    F2 = jnp.float32(2.0)
    I0 = jnp.int32(0)
    I128 = jnp.int32(128)

    def tile(kt, carry):
        best_d2, best_idx, cur_d2 = carry
        off = kt * I128
        ct = cents_ref[:, pl.ds(pl.multiple_of(off, 128), 128)]   # (8, 128)
        cs = csq_ref[:, pl.ds(pl.multiple_of(off, 128), 128)]     # (1, 128)
        prod = jax.lax.dot_general(
            p, ct, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                  # (BS, 128)
        score = (psq - F2 * prod) + cs                            # exact d2
        t_min = jnp.min(score, axis=1, keepdims=True)             # (BS, 1)
        # explicit int32 index dtype: under x64 jnp.argmin asks for int64
        # indices, which Mosaic cannot lower
        t_arg = jax.lax.argmin(score, axis=1, index_dtype=jnp.int32)[:, None]
        improved = t_min < best_d2
        best_idx = jnp.where(improved, t_arg + off, best_idx)
        best_d2 = jnp.where(improved, t_min, best_d2)

        rel = cur - off
        in_tile = jnp.logical_and(rel >= I0, rel < I128)
        sel = lane == rel                                         # (BS, 128)
        cur_here = jnp.sum(jnp.where(sel, score, jnp.float32(0.0)),
                           axis=1, keepdims=True, dtype=jnp.float32)
        cur_d2 = jnp.where(in_tile, cur_here, cur_d2)
        return best_d2, best_idx, cur_d2

    init = (jnp.full((BS, 1), FBIG, jnp.float32),
            jnp.zeros((BS, 1), jnp.int32),
            jnp.full((BS, 1), FBIG, jnp.float32))
    best_d2, best_idx, cur_d2 = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(k_pad // 128), tile, init)
    out_ref[...] = jnp.where(best_d2 < cur_d2, best_idx, cur)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _assign(ptsT, psq, cur, cents, csq, interpret: bool = False):
    n_pad = ptsT.shape[1]
    nb = n_pad // BS
    return pl.pallas_call(
        _kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, BS), lambda i: (i * 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((BS, 1), lambda i: (i, i * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BS, 1), lambda i: (i, i * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cents.shape[1]), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cents.shape[1]), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BS, 1), lambda i: (i, i * 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        interpret=interpret,
    )(ptsT, psq, cur, cents, csq)


def assign(pts_f, cur, cents_f, interpret: bool | None = None):
    """Drop-in assignment step: pts_f f32[n_pad, d], cur int32[n_pad],
    cents_f f32[k, d] -> new int32[n_pad]. n_pad must be a BS multiple."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_pad, d = pts_f.shape
    k = cents_f.shape[0]
    k_pad = max(-(-k // 128) * 128, 128)

    ptsT = jnp.zeros((8, n_pad), jnp.float32).at[:d, :].set(pts_f.T)
    psq = jnp.sum(pts_f * pts_f, axis=1, keepdims=True)
    centsT = jnp.zeros((8, k_pad), jnp.float32).at[:d, :k].set(cents_f.T)
    csq = jnp.full((1, k_pad), 3e38, jnp.float32).at[0, :k].set(
        jnp.sum(cents_f * cents_f, axis=1))
    new = _assign(ptsT, psq, cur[:, None].astype(jnp.int32), centsT, csq,
                  interpret=interpret)
    return new[:, 0]
