"""Fused k-means assignment+statistics iteration (Pallas, TPU).

The XLA formulation in ops/kmeans.py is HBM-bound: each iteration
materializes several (points x k) f32 tiles (three partial-product matmuls,
the assembled distances, the packed min, the one-hot) — ~2 GB of traffic per
iteration at 590k x 128, measured 3.7 ms on v5e. This kernel fuses the whole
assignment step into one VMEM-resident pass per point block: the three
exact-split matmuls, the distance assembly, the packed argmin+min reduce,
the strict-move rule and the one-hot digit-plane statistics never leave
VMEM; HBM sees only the transposed point planes in and the new assignment
out (~25 MB/iteration at 590k x 128 x 5).

Exactness is inherited, not re-argued: the base-32 hi/lo bf16 split makes
every MXU partial product exact regardless of Mosaic's matmul precision
mode (the round-1 kernel failed because it relied on Precision.HIGHEST,
which Mosaic ignores — ROADMAP.md #3), the f32 accumulations stay below
2^24, and the packed min (d2*pk + idx, pk = next pow2 >= k with
d2_bound*pk < 2^31 guaranteed by the caller) reproduces argmin's
first-index tie rule. The statistics dot (one-hot^T @ digit planes)
accumulates 0/1 x <=255 values over <=2048-point blocks (< 2^24, exact in
f32) into an int32 VMEM scratch across grid steps.

Layouts are TPU-native: points ride transposed (d, n) so the lane dimension
is the point axis (128-multiples) and distances are (k, points) tiles. The
grid walks point blocks; the (small) image-batch axis is unrolled inside
each step because Mosaic requires the last two block dims to be 8/128
multiples or full — a leading lane axis in a 2-D block would be neither.

Parity: tests/test_kmeans_pallas.py pins kernel == _iteration bit-for-bit
(assignments, statistics, move counts) in interpret mode; the same check
runs on real hardware via scripts/experiments/profile_kmeans.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kmeans import _means_from_sums


def _kernel(n_ref, ptsT_ref, w_ref, cur_ref, cents_ref,
            new_ref, sums_ref, moved_ref, acc_ref, mv_ref,
            *, B: int, k: int, vp: int, wp: int, pk: int, bs: int, nb: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        for b in range(B):
            mv_ref[b] = jnp.int32(0)

    # explicitly-typed constants: under jax_enable_x64 python literals trace
    # as 64-bit weak types whose conversions Mosaic cannot lower
    F32TH = jnp.float32(1.0 / 32.0)
    F32 = jnp.float32(32.0)
    I0 = jnp.int32(0)
    IMAX = jnp.int32(2**31 - 1)
    PK = jnp.int32(pk)
    PKM = jnp.int32(pk - 1)
    PKSH = jnp.int32(pk.bit_length() - 1)  # pk is a power of two
    M8 = jnp.int32(0xFF)
    bf = jnp.bfloat16
    dn = (((1,), (0,)), ((), ()))          # (k,d) x (d,bs) contract d
    dnT = (((1,), (1,)), ((), ()))         # (k,bs) x (F,bs) contract bs

    pos = jnp.int32(bs) * i + jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)

    for b in range(B):  # static unroll over the (small) image-batch axis
        n = n_ref[b]
        p = ptsT_ref[b]                    # (d, bs) f32, integer-valued
        wv = w_ref[b : b + 1, :]           # (1, bs) int32 (0 on padding)
        cur = cur_ref[b : b + 1, :]        # (1, bs) int32 (0 on padding)
        c = cents_ref[b]                   # (k, d) f32, integer-valued

        # exact base-32 hi/lo split (see ops/kmeans.py for the argument)
        c_hi = jnp.floor(c * F32TH)
        c_lo = c - c_hi * F32
        csq = jnp.sum(c * c, axis=1, keepdims=True)        # (k, 1)
        p_hi = jnp.floor(p * F32TH)
        p_lo = p - p_hi * F32
        psq = jnp.sum(p * p, axis=0, keepdims=True)        # (1, bs)

        m_hh = jax.lax.dot_general(c_hi.astype(bf), p_hi.astype(bf), dn,
                                   preferred_element_type=jnp.float32)
        m_mix = jax.lax.dot_general(
            jnp.concatenate([c_lo, c_hi], axis=1).astype(bf),
            jnp.concatenate([p_hi, p_lo], axis=0).astype(bf), dn,
            preferred_element_type=jnp.float32)
        m_ll = jax.lax.dot_general(c_lo.astype(bf), p_lo.astype(bf), dn,
                                   preferred_element_type=jnp.float32)
        pc = jnp.float32(1024.0) * m_hh + F32 * m_mix + m_ll   # (k, bs)
        d2 = (psq - pc) + (csq - pc)                       # exact integers
        d2i = d2.astype(jnp.int32)

        kidx = jax.lax.broadcasted_iota(jnp.int32, (k, bs), 0)
        packed = jnp.min(d2i * PK + kidx, axis=0, keepdims=True)  # (1, bs)
        best = packed & PKM
        bestd = packed >> PKSH
        # current-centroid distance without a gather: select cur's d2 row
        curd = jnp.min(jnp.where(kidx == cur, d2i, IMAX), axis=0,
                       keepdims=True)
        new = jnp.where(bestd < curd, best, cur)           # strict move only
        new = jnp.where(pos < n, new, I0)
        new_ref[b : b + 1, :] = new
        # keepdims + scalar extract: a rank-0 jnp.sum emits an i64 convert
        # under x64 that Mosaic cannot lower
        mvs = jnp.sum((new != cur).astype(jnp.int32), axis=1, keepdims=True,
                      dtype=jnp.int32)
        mv_ref[b] = mv_ref[b] + mvs[0, 0]

        # one-hot digit-plane statistics, contracted over the point axis
        onehot = (kidx == new).astype(bf)                  # (k, bs)
        pi = p.astype(jnp.int32)
        prod = pi * wv                                     # (d, bs)
        rows = [(prod >> jnp.int32(8 * j)) & M8 for j in reversed(range(vp))]
        rows += [(wv >> jnp.int32(8 * j)) & M8 for j in reversed(range(wp))]
        featsT = jnp.concatenate(rows, axis=0).astype(bf)  # (F, bs)
        sums_blk = jax.lax.dot_general(onehot, featsT, dnT,
                                       preferred_element_type=jnp.float32)
        acc_ref[b] = acc_ref[b] + sums_blk.astype(jnp.int32)

    @pl.when(i == nb - 1)
    def _():
        sums_ref[...] = acc_ref[...]
        for b in range(B):
            moved_ref[b : b + 1, :] = jnp.full((1, 128), mv_ref[b], jnp.int32)


def _assign_stats(ptsT, w, cur, cents_f, n1, *, k: int, vp: int, wp: int,
                  pk: int, bs: int, interpret: bool):
    """One fused assignment+stats step over the whole batch.

    ptsT f32[B, d, n_pad], w int32[B, n_pad], cur int32[B, n_pad],
    cents_f f32[B, k, d], n1 int32[B].
    Returns (new int32[B, n_pad], sums int32[B, k, F], moved int32[B, 128]
    — per-lane move count broadcast along the trailing tile dim).
    """
    B, d, n_pad = ptsT.shape
    nb = n_pad // bs
    F = vp * d + wp
    kern = functools.partial(_kernel, B=B, k=k, vp=vp, wp=wp, pk=pk,
                             bs=bs, nb=nb)
    # index maps derive 0 from the (int32) grid index: literal 0 traces as
    # an i64 constant under x64, which the Mosaic legalizer rejects
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((B,), lambda i: (i * 0,),
                         memory_space=pltpu.SMEM),                  # n (B,)
            pl.BlockSpec((B, d, bs), lambda i: (i * 0, i * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, bs), lambda i: (i * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, bs), lambda i: (i * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, k, d), lambda i: (i * 0, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, bs), lambda i: (i * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, k, F), lambda i: (i * 0, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 128), lambda i: (i * 0, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((B, k, F), jnp.int32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, k, F), jnp.int32),
            pltpu.SMEM((B,), jnp.int32),
        ],
        interpret=interpret,
    )(n1, ptsT, w, cur, cents_f)


@jax.jit
def to_ptsT(pts_i):
    """(B, n_pad, d) int -> (B, d, n_pad) f32, the kernel's point layout."""
    return jnp.swapaxes(pts_i, 1, 2).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("k", "max_iters", "bs", "vp",
                                             "wp", "pk", "interpret"))
def kmeans_loop_pallas(ptsT, w, cur, cents_i, n, thresh, moved0, it0,
                       k: int, max_iters: int, bs: int, vp: int, wp: int,
                       pk: int, interpret: bool = False):
    """Drop-in replacement for ops.kmeans._kmeans_loop with the fused
    kernel as the iteration body (same freeze-on-threshold semantics; the
    means/empty-repair tail is the shared _means_from_sums)."""

    def cond(state):
        it, _, _, moved = state
        return jnp.logical_and(jnp.any(moved > thresh), it < it0 + max_iters)

    def body(state):
        it, cur, cents_i, moved = state
        new, sums, mv = _assign_stats(
            ptsT, w, cur, cents_i.astype(jnp.float32), n,
            k=k, vp=vp, wp=wp, pk=pk, bs=bs, interpret=interpret)

        def lane_means(sums_b, ptsT_b, n_b):
            return _means_from_sums(
                sums_b, jnp.swapaxes(ptsT_b, 0, 1).astype(jnp.int32),
                k, it, n_b, vp, wp)

        cents_new, _ = jax.vmap(lane_means)(sums, ptsT, n)
        act = moved > thresh
        cur = jnp.where(act[:, None], new, cur)
        cents_i = jnp.where(act[:, None, None], cents_new, cents_i)
        moved = jnp.where(act, mv[:, 0], moved)
        return it + 1, cur, cents_i, moved

    return jax.lax.while_loop(cond, body, (it0, cur, cents_i, moved0))


def pick_block(n_pad: int, k: int, batch: int = 1) -> int:
    """Largest kernel point-block that divides n_pad and keeps the per-lane
    (k, bs) f32 working tiles within the VMEM budget across the unrolled
    batch (B*k*bs <= 2^21, ~8 MB of f32 tiles before Mosaic reuse).
    Returns 0 when no candidate divides (caller falls back to XLA).
    CNIIC_PALLAS_KMEANS_BS overrides (tuning knob)."""
    import os

    env = os.environ.get("CNIIC_PALLAS_KMEANS_BS", "")
    if env:
        bs = int(env)
        return bs if n_pad % bs == 0 else 0
    for bs in (4096, 2048, 1024, 512, 256, 128):
        if n_pad % bs == 0 and batch * k * bs <= 1 << 21:
            return bs
    return 0
