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
which Mosaic ignores — ROADMAP.md #3). The cross term is ONE matmul over a
4d contraction with the x32 scale riding the operands (multiples of 32
below 2048 are exact bf16; all terms nonnegative, so every f32 prefix sum
is <= pc <= d2_bound < 2^24 and stays integral). Points are scored with
|p-c|^2 - |p|^2 + d2_bound (ordering-equivalent per point, two fewer
(k, bs) passes), and ONE packed min over score*2pk + tiebreak — with the
current centroid's tiebreak forced to 0 — implements argmin + the
strict-move/stay-on-tie rule in a single reduction (caller guarantees
(d2_bound+1)*4pk < 2^31). Lanes whose stop rule has fired skip their whole
block via pl.when. The statistics dot (one-hot^T @ digit planes)
accumulates 0/1 x <=255 values over point blocks of up to 16384 (255*bs
< 2^24, exact in f32) into an int32 VMEM scratch across grid steps.

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


def _kernel(n_ref, act_ref, ptsT_ref, w_ref, cur_ref, cents_ref,
            new_ref, sums_ref, moved_ref, acc_ref, mv_ref,
            *, B: int, k: int, vp: int, wp: int, pk: int, bs: int, nb: int,
            d2b: int, packed: bool):
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
    PK = jnp.int32(pk)
    PK2 = jnp.int32(2 * pk)
    PK2M = jnp.int32(2 * pk - 1)
    M8 = jnp.int32(0xFF)
    bf = jnp.bfloat16
    dn = (((1,), (0,)), ((), ()))          # (k,d) x (d,bs) contract d
    dnT = (((1,), (1,)), ((), ()))         # (k,bs) x (F,bs) contract bs

    pos = jnp.int32(bs) * i + jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)

    for b in range(B):  # static unroll over the (small) image-batch axis
      # frozen lanes (stop rule fired) skip their whole block — the while
      # body selects the carried state for them, so the unwritten outputs
      # are never observed
      @pl.when(act_ref[b] > 0)
      def _(b=b):
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

        # ONE matmul over a 4d contraction instead of three over d (each
        # pads its tiny contraction dim to the MXU anyway): the scale rides
        # the operands as 32*hi — a multiple of 32 below 2048, exact in
        # bf16 — every partial product is exact in f32, all terms are
        # nonnegative, and every prefix sum is <= pc <= d2b < 2^24, so the
        # accumulated cross term stays an exact integer.
        ca = jnp.concatenate([c_hi * F32, c_hi * F32, c_lo, c_lo], axis=1)
        pb = jnp.concatenate([p_hi * F32, p_lo, p_hi * F32, p_lo], axis=0)
        pc = jax.lax.dot_general(ca.astype(bf), pb.astype(bf), dn,
                                 preferred_element_type=jnp.float32)  # (k, bs)
        # |p|^2 is constant across centroids, so ordering (and the strict-
        # move comparison, which is within one point) is unchanged by
        # scoring with |p-c|^2 - |p|^2 = csq - 2*pc — two fewer (k, bs)
        # passes than assembling full d2. Exact: |values| <= d2b < 2^24
        # stay integral in f32; the packed key below works for NEGATIVE
        # scores too (si*2pk has zero low bits, so adding the tiebreak
        # sets them exactly even in two's complement).
        score = (csq - pc) - pc                            # (k, bs)
        si = score.astype(jnp.int32)

        # argmin + the strict-move rule via a (score, tiebreak) key with
        # the CURRENT centroid's tiebreak forced to 0: at equal score cur
        # wins (ties keep the cluster), otherwise the smallest index among
        # the winners — identical decisions to argmin-then-strictly-closer.
        kidx = jax.lax.broadcasted_iota(jnp.int32, (k, bs), 0)
        sel = jnp.where(kidx == cur, I0, PK + kidx)
        if packed:
            # single reduction; caller guarantees (d2b+1)*2*pk < 2^31 so
            # score*2pk + sel stays int32 (low bits exact even when
            # score*2pk is negative: two's complement addition)
            kmin = jnp.min(si * PK2 + sel, axis=0, keepdims=True)  # (1, bs)
            r = kmin & PK2M
        else:
            # large k: two reductions (min score, then min tiebreak among
            # the minimizers) — needs only d2b < 2^24 (f32 exactness)
            smin = jnp.min(si, axis=0, keepdims=True)              # (1, bs)
            wkey = jnp.where(si == smin, sel, jnp.int32(2**30))
            r = jnp.min(wkey, axis=0, keepdims=True)
        new = jnp.where(r >= PK, r - PK, cur)
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


def _assign_stats(ptsT, w, cur, cents_f, n1, act, *, k: int, vp: int,
                  wp: int, pk: int, bs: int, d2b: int, packed: bool,
                  interpret: bool):
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
                             bs=bs, nb=nb, d2b=d2b, packed=packed)
    # index maps derive 0 from the (int32) grid index: literal 0 traces as
    # an i64 constant under x64, which the Mosaic legalizer rejects
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((B,), lambda i: (i * 0,),
                         memory_space=pltpu.SMEM),                  # n (B,)
            pl.BlockSpec((B,), lambda i: (i * 0,),
                         memory_space=pltpu.SMEM),                  # act (B,)
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
    )(n1, act, ptsT, w, cur, cents_f)


@jax.jit
def to_ptsT(pts_i):
    """(B, n_pad, d) int -> (B, d, n_pad) f32, the kernel's point layout."""
    return jnp.swapaxes(pts_i, 1, 2).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("k", "max_iters", "bs", "vp",
                                             "wp", "pk", "d2b", "packed",
                                             "stall_lim", "interpret"))
def kmeans_loop_pallas(ptsT, w, cur, cents_i, n, thresh, moved0, best0,
                       stall0, it0,
                       k: int, max_iters: int, bs: int, vp: int, wp: int,
                       pk: int, d2b: int = 0, packed: bool = True,
                       stall_lim: int = 1 << 30, interpret: bool = False):
    """Drop-in replacement for ops.kmeans._kmeans_loop with the fused
    kernel as the iteration body (same freeze semantics — threshold stop +
    per-iteration plateau net; the means/empty-repair tail is the shared
    _means_from_sums)."""
    from .kmeans import _plateau_update

    def active(moved, stall):
        return jnp.logical_and(moved > thresh, stall < stall_lim)

    def cond(state):
        it, _, _, moved, _, stall = state
        return jnp.logical_and(jnp.any(active(moved, stall)),
                               it < it0 + max_iters)

    def body(state):
        it, cur, cents_i, moved, best, stall = state
        act = active(moved, stall)
        new, sums, mv = _assign_stats(
            ptsT, w, cur, cents_i.astype(jnp.float32), n,
            act.astype(jnp.int32),
            k=k, vp=vp, wp=wp, pk=pk, bs=bs, d2b=d2b, packed=packed,
            interpret=interpret)

        def lane_means(sums_b, ptsT_b, n_b):
            return _means_from_sums(
                sums_b, jnp.swapaxes(ptsT_b, 0, 1).astype(jnp.int32),
                k, it, n_b, vp, wp)

        cents_new, _ = jax.vmap(lane_means)(sums, ptsT, n)
        cur = jnp.where(act[:, None], new, cur)
        cents_i = jnp.where(act[:, None, None], cents_new, cents_i)
        new_moved = mv[:, 0]
        moved = jnp.where(act, new_moved, moved)
        best, stall = _plateau_update(act, new_moved, best, stall)
        return it + 1, cur, cents_i, moved, best, stall

    return jax.lax.while_loop(
        cond, body, (it0, cur, cents_i, moved0, best0, stall0))


def pick_block(n_pad: int, k: int, batch: int = 1) -> int:
    """Largest kernel point-block that divides n_pad and keeps the per-lane
    (k, bs) f32 working tiles within the VMEM budget across the unrolled
    batch (B*k*bs <= 2^23, ~32 MB of f32 tiles before Mosaic reuse — the
    r2 2^21 cap was conservative: raising it cut the grid-step count 4x
    and lifted voronoi(128) 1024^2x4 encode 4.3 -> 6.3 MP/s, measured r3;
    the one-hot stats stay f32-exact while 255*bs < 2^24, i.e. bs <=
    65536). Returns 0 when no candidate divides (caller falls back to
    XLA). CNIIC_PALLAS_KMEANS_BS overrides (tuning knob)."""
    import os

    env = os.environ.get("CNIIC_PALLAS_KMEANS_BS", "")
    if env:
        bs = int(env)
        return bs if n_pad % bs == 0 else 0
    # 32768 measured best for small-k (cluster-colors 13.5 -> 16.8 MP/s);
    # 65536 regressed slightly (VMEM pressure), so the ladder stops here
    for bs in (32768, 16384, 8192, 4096, 2048, 1024, 512, 256, 128):
        if n_pad % bs == 0 and batch * k * bs <= 1 << 23:
            return bs
    return 0


@functools.lru_cache(maxsize=64)
def kmeans_loop_pallas_sharded(mesh, k: int, max_iters: int, bs: int,
                               vp: int, wp: int, pk: int, d2b: int,
                               packed: bool, stall_lim: int,
                               interpret: bool):
    """shard_map the fused kernel over the mesh's batch (lane) axis
    (VERDICT r2 #7: under GSPMD the kernel doesn't auto-partition, so the
    sharded path used to fall back to the ~3x slower XLA body).

    Each device runs the SAME per-lane while_loop over its local lanes;
    lanes are independent (frozen lanes stop updating), so per-lane
    trajectories — and the streams built from them — are bit-identical to
    the single-device kernel path. A device whose lanes all freeze exits
    its burst early; the host continues with the max iteration count
    (devices with active lanes always run the full burst).

    Returns a jitted step: (ptsT, w, cur, cents_i, n, thresh, moved0,
    best0, stall0, it0) -> (it (ndev,), cur, cents_i, moved, best, stall).
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import shard_map_unchecked

    def _local(ptsT, w, cur, cents_i, n, thresh, moved0, best0, stall0, it0):
        it, cur, cents_i, moved, best, stall = kmeans_loop_pallas(
            ptsT, w, cur, cents_i, n, thresh, moved0, best0, stall0, it0,
            k=k, max_iters=max_iters, bs=bs, vp=vp, wp=wp, pk=pk, d2b=d2b,
            packed=packed, stall_lim=stall_lim, interpret=interpret)
        return jnp.reshape(it, (1,)), cur, cents_i, moved, best, stall

    lane = P("batch")
    sharded = shard_map_unchecked(
        _local, mesh,
        in_specs=(P("batch", None, None), P("batch", None), P("batch", None),
                  P("batch", None, None), lane, lane, lane, lane, lane, P()),
        out_specs=(lane, P("batch", None), P("batch", None, None),
                   lane, lane, lane),
    )
    return jax.jit(sharded)
