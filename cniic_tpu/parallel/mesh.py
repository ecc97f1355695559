"""Multi-chip scaling (SURVEY.md §2.4): batch-axis SPMD over a device mesh.

The reference's only parallelism is rayon threads over images
(bench.rs:22-27). The TPU equivalents implemented here:

* :func:`make_mesh` — a 1-D ``jax.sharding.Mesh`` over all (or n) devices,
  axis name ``"batch"``;
* :func:`sharded_kmeans_step` — one full k-means iteration with the point
  set sharded over the mesh: local MXU assignment + local integer segment
  sums, combined with ``psum`` over ICI, centroids replicated. This is the
  framework's "training step": the heaviest compute (cluster-colors /
  voronoi encode) scales linearly in chips with one small collective per
  iteration;
* :func:`sharded_mse` — batched round-trip error with images sharded over
  the mesh and a psum'd scalar reduction.

Everything compiles with ``xla_force_host_platform_device_count`` CPU
devices, so the sharding is CI-testable without hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 top-level API; the experimental path is deprecated
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

jax.config.update("jax_enable_x64", True)


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("batch",))


def sharded_kmeans_step(mesh: Mesh, k: int, block: int = 1024):
    """Build a jitted sharded k-means iteration.

    Returns step(pts_f, pts_i, w, cur, cents_f) ->
        (new_assign int32[n], cents int32[k, d], wsum int32[k], changed bool)
    with pts/w/cur sharded on the batch axis and centroids replicated.
    Same int64-free formulation as ops/kmeans.py: one-hot MXU matmuls over
    8-bit digit planes, int32 psum over ICI, base-256 long-division means.
    """

    def _local(pts_f, pts_i, w, cur, cents_f):
        n_loc, d = pts_f.shape
        nb = max(n_loc // block, 1)
        kids = jnp.arange(k, dtype=jnp.int32)

        prod = pts_i * w[:, None]
        cols = [(prod >> s) & 0xFF for s in (24, 16, 8, 0)]
        wcols = [((w >> s) & 0xFF)[:, None] for s in (24, 16, 8, 0)]
        feats = jnp.concatenate(cols + wcols, axis=1).astype(jnp.bfloat16)

        # exact MXU cross term via base-32 hi/lo bf16 split (see
        # ops/kmeans.py for the full exactness argument)
        c_hi = jnp.floor(cents_f / 32.0)
        c_lo = cents_f - c_hi * 32.0
        csq = jnp.sum(cents_f * cents_f, axis=1)
        c_mix = jnp.concatenate([c_lo, c_hi], axis=1)
        bf = jnp.bfloat16

        def assign_block(args):
            p, c, f = args
            p_hi = jnp.floor(p / 32.0)
            p_lo = p - p_hi * 32.0
            psq = jnp.sum(p * p, axis=1)
            m_hh = jnp.dot(p_hi.astype(bf), c_hi.astype(bf).T,
                           preferred_element_type=jnp.float32)
            m_mix = jnp.dot(jnp.concatenate([p_hi, p_lo], axis=1).astype(bf),
                            c_mix.astype(bf).T, preferred_element_type=jnp.float32)
            m_ll = jnp.dot(p_lo.astype(bf), c_lo.astype(bf).T,
                           preferred_element_type=jnp.float32)
            pc = 1024.0 * m_hh + 32.0 * m_mix + m_ll
            d2 = (psq[:, None] - pc) + (csq[None, :] - pc)
            best = jnp.argmin(d2, axis=1).astype(jnp.int32)
            best_d2 = jnp.min(d2, axis=1)
            cur_c = cents_f[c]
            cur_d2 = jnp.sum((p - cur_c) * (p - cur_c), axis=-1)
            new_b = jnp.where(best_d2 < cur_d2, best, c)
            onehot = (new_b[:, None] == kids[None, :]).astype(jnp.bfloat16)
            sums_b = jnp.dot(onehot.T, f, preferred_element_type=jnp.float32)
            return new_b, sums_b.astype(jnp.int32)

        new, sums_blocks = jax.lax.map(
            assign_block,
            (pts_f.reshape(nb, -1, d), cur.reshape(nb, -1),
             feats.reshape(nb, -1, 4 * d + 4)),
        )
        new = new.reshape(-1)
        changed_loc = jnp.any(new != cur)
        sums_loc = jnp.sum(sums_blocks, axis=0, dtype=jnp.int32)

        # ICI collectives: replicate the centroid statistics
        sums = jax.lax.psum(sums_loc, "batch")
        changed = jax.lax.psum(changed_loc.astype(jnp.int32), "batch") > 0

        wsum = sums[:, 4 * d] * 256 ** 3 + sums[:, 4 * d + 1] * 256 ** 2 \
            + sums[:, 4 * d + 2] * 256 + sums[:, 4 * d + 3]
        denom = jnp.maximum(wsum, 1)[:, None]
        # carry-normalize plane sums into base-256 digits, then base-16 long
        # division — same int32-exact scheme as ops/kmeans.py (exact while
        # total weight < 2^27; the old base-256 division overflowed at ~2^23)
        digits = []
        carry = jnp.zeros((k, d), jnp.int32)
        for i in reversed(range(4)):
            v = sums[:, i * d : (i + 1) * d] + carry
            digits.append(v & 0xFF)
            carry = v >> 8
        for _ in range(4):
            digits.append(carry & 0xFF)
            carry = carry >> 8
        rem = jnp.zeros((k, d), jnp.int32)
        out = jnp.zeros((k, d), jnp.int32)
        for dig in reversed(digits):
            for shift in (4, 0):
                cur_v = rem * 16 + ((dig >> shift) & 0xF)
                q = cur_v // denom
                rem = cur_v - q * denom
                out = out * 16 + q
        return new, out, wsum, changed

    sharded = shard_map(
        _local,
        mesh=mesh,
        in_specs=(P("batch", None), P("batch", None), P("batch"), P("batch"), P(None, None)),
        out_specs=(P("batch"), P(None, None), P(None), P()),
    )
    return jax.jit(sharded)


def sharded_mse(mesh: Mesh):
    """Batched MSE with the image batch sharded over chips.

    step(x uint8[b, h, w, 3], y uint8[b, h, w, 3]) -> f64[b] per-image MSE.
    """

    def _local(x, y):
        d = x.astype(jnp.float64) - y.astype(jnp.float64)
        per_img = jnp.sum(d * d, axis=(1, 2, 3)) / (x.shape[1] * x.shape[2])
        return per_img

    sharded = shard_map(
        _local, mesh=mesh,
        in_specs=(P("batch"), P("batch")),
        out_specs=P("batch"),
    )
    return jax.jit(sharded)


def sharded_voronoi_reconstruct(mesh: Mesh):
    """Voronoi decode with the pixel rows sharded over chips.

    step(xs u32[n], ys u32[n], cx u32[k], cy u32[k], kmask bool[k]) ->
    int32[n] nearest-centroid ids under the reference's wrapping-u32 metric.
    """

    def _local(xs, ys, cx, cy, kmask):
        dx = cx[None, :] - xs[:, None]
        dy = cy[None, :] - ys[:, None]
        d = dx * dx + dy * dy
        d = jnp.where(kmask[None, :], d, jnp.uint32(0xFFFFFFFF))
        return jnp.argmin(d, axis=1).astype(jnp.int32)

    sharded = shard_map(
        _local, mesh=mesh,
        in_specs=(P("batch"), P("batch"), P(None), P(None), P(None)),
        out_specs=P("batch"),
    )
    return jax.jit(sharded)
