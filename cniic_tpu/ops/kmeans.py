"""K-means on the MXU (reference src/kmeans.rs rebuilt TPU-first).

The reference spends its time in a CPU-clever assign loop (neighbour graphs,
certainty radii, watermark-adaptive pruning, kmeans.rs:145-416). On TPU the
dense formulation wins outright: the assignment step is a (points x d) @
(d x centroids) matmul + argmin, blocked over points so the distance tile
stays in budget; the update step is an exact integer segment-sum.

Semantics preserved from the reference:

* init: the point vector is split into k equal contiguous chunks from the
  tail, the initial centroid is the first point of each chunk
  (kmeans.rs:61-108);
* a point moves only to a *strictly* closer centroid — ties keep the
  current cluster (kmeans.rs:349-389);
* means are integer-truncated (u64 division) — weighted for color counts
  (clusterc.rs:92-113), plain component-wise for 5-D pixels
  (clusterc.rs:221-247);
* iteration runs until no point changes cluster (kmeans.rs:21-39);
* empty clusters are repaired by stealing a point (kmeans.rs:110-137) —
  here a hash-of-(iteration, cluster) pick over all points, applied inside
  the device loop (documented divergence: the reference draws
  cluster-then-member from thread_rng; empties are an early-iteration
  transient either way).

Dropped (pure CPU optimizations, no effect on results): the neighbour-graph
pruning and certainty-radius early-outs.
"""

from __future__ import annotations

import functools
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

log = logging.getLogger(__name__)

_BLOCK = 16384


def _iteration(pts_f, pts_i, w, valid, cur, cents_f, k: int, it, n, bs: int, vp: int, wp: int, pk: int):
    """One assign+update step. Shapes: pts [n_pad, d] (f32 / int32),
    w int32[n_pad] (0 for padding), valid bool[n_pad], cur int32[n_pad],
    cents_f f32[k, d].

    Everything rides the MXU: the assignment is a distance matmul + argmin,
    and the centroid statistics are one-hot matmuls over 8-bit digit planes
    of the weighted values — per-block f32 sums stay exact (<= 255*block),
    cross-block accumulation is int32, and the integer-truncated mean is a
    base-256 long division. No scatters, no 64-bit ops (both are slow to
    compile and have crashed the worker on this stack at megapixel sizes).
    """
    n_pad, d = pts_f.shape
    nb = n_pad // bs
    kids = jnp.arange(k, dtype=jnp.int32)

    # digit planes of the weighted values + the weights themselves; the
    # static plane counts (vp, wp) come from the caller's value bounds so
    # the stats matmul carries no all-zero columns
    prod = pts_i * w[:, None]  # int32, bounded by the caller
    cols = [(prod >> (8 * i)) & 0xFF for i in reversed(range(vp))]
    wcols = [((w >> (8 * i)) & 0xFF)[:, None] for i in reversed(range(wp))]
    feats = jnp.concatenate(cols + wcols, axis=1).astype(jnp.bfloat16)  # (n, vp*d+wp)

    # EXACT f32 squared distances with the cross term on the MXU. TPU f32
    # matmuls are bf16x3 emulations that drop the lo*lo term (the resulting
    # noisy distances made boundary points limit-cycle), so p.c is computed
    # from an exact base-32 hi/lo split instead: per-dim values < 2048 give
    # hi < 64 and lo < 32, both exactly bf16-representable, every MXU
    # partial product is exact, and the f32 accumulations stay below 2^24
    # (the 1024-scaled hi.hi term is a multiple of 2^10, exact while
    # hi.hi < 2^24). d2 is assembled as (|p|^2 - p.c) + (|c|^2 - p.c) so
    # every intermediate is an integer within the d2 bound (<= 8.6M for
    # 2 coords + 3 colors) — decisions match f64 exactly, same contract as
    # the earlier fused diff-form, but the VPU only touches (bs, k) tiles
    # once (measured ~3.5x faster assignment on v5e at 590k x 128 x 5).
    c_hi = jnp.floor(cents_f / 32.0)
    c_lo = cents_f - c_hi * 32.0
    csq = jnp.sum(cents_f * cents_f, axis=1)  # (k,)
    c_mix = jnp.concatenate([c_lo, c_hi], axis=1)  # (k, 2d)
    bf = jnp.bfloat16

    def block(args):
        p, c, f = args
        p_hi = jnp.floor(p / 32.0)
        p_lo = p - p_hi * 32.0
        psq = jnp.sum(p * p, axis=1)  # (bs,)
        m_hh = jnp.dot(p_hi.astype(bf), c_hi.astype(bf).T,
                       preferred_element_type=jnp.float32)
        m_mix = jnp.dot(jnp.concatenate([p_hi, p_lo], axis=1).astype(bf),
                        c_mix.astype(bf).T, preferred_element_type=jnp.float32)
        m_ll = jnp.dot(p_lo.astype(bf), c_lo.astype(bf).T,
                       preferred_element_type=jnp.float32)
        pc = 1024.0 * m_hh + 32.0 * m_mix + m_ll  # (bs, k) exact integers
        d2 = (psq[:, None] - pc) + (csq[None, :] - pc)
        cur_c = cents_f[c]
        cur_d2 = jnp.sum((p - cur_c) * (p - cur_c), axis=-1)
        if pk:
            # single packed min-reduce = argmin + min in one pass. pk is the
            # next power of two >= k and the host guarantees
            # d2_bound * pk < 2^31, so d2*pk + idx is an exact int32 whose
            # min recovers (min d2, smallest index among ties) — the same
            # first-index tie rule as argmin.
            kidx = jnp.arange(k, dtype=jnp.int32)[None, :]
            packed = jnp.min(d2.astype(jnp.int32) * pk + kidx, axis=1)
            best = (packed % pk).astype(jnp.int32)
            new_b = jnp.where(packed // pk < cur_d2.astype(jnp.int32), best, c)
        else:
            best = jnp.argmin(d2, axis=1).astype(jnp.int32)
            best_d2 = jnp.min(d2, axis=1)
            new_b = jnp.where(best_d2 < cur_d2, best, c)
        onehot = (new_b[:, None] == kids[None, :]).astype(jnp.bfloat16)  # (bs, k)
        # exact: 0/1 x values<=255, block sums <= 255*bs < 2^24
        sums_b = jnp.dot(onehot.T, f, preferred_element_type=jnp.float32)
        return new_b, sums_b.astype(jnp.int32)

    new, sums_blocks = jax.lax.map(
        block,
        (pts_f.reshape(nb, bs, d), cur.reshape(nb, bs),
         feats.reshape(nb, bs, vp * d + wp)),
    )
    new = jnp.where(valid, new.reshape(-1), 0)
    moved = jnp.sum((new != cur).astype(jnp.int32), dtype=jnp.int32)
    sums = jnp.sum(sums_blocks, axis=0, dtype=jnp.int32)  # (k, vp*d+wp)

    wsum = jnp.zeros((k,), jnp.int32)
    for i in range(wp):
        wsum = wsum * 256 + sums[:, vp * d + i]
    denom = jnp.maximum(wsum, 1)[:, None]
    # The value-plane columns are *plane sums* (each <= 255*n), not digits.
    # Normalize them into true base-256 digits by carry propagation, then
    # long-divide in base 16 so every intermediate fits int32: the running
    # remainder stays < denom <= total weight and the host guards
    # total weight < 2^27, so rem*16 + nibble < 2^31. (The previous base-256
    # division overflowed once a cluster's weight crossed ~2^23 and silently
    # corrupted the palette — ADVICE.md round 1.)
    digits = []  # least-significant first
    carry = jnp.zeros((k, d), jnp.int32)
    for i in reversed(range(vp)):
        v = sums[:, i * d : (i + 1) * d] + carry
        digits.append(v & 0xFF)
        carry = v >> 8
    for _ in range(4):  # residual carry < 255*n/255 <= n <= 4M: 3 bytes + slack
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
    cents_i = out
    empty = wsum == 0

    # Empty-cluster repair on device (kmeans.rs:110-137 steals a random
    # point; here the "random" pick is a Weyl-sequence hash of (iteration,
    # cluster) over the valid points — documented RNG divergence, empties
    # are a transient of early iterations)
    mix = (it + 1) * jnp.int32(-1640531527) + jnp.arange(k, dtype=jnp.int32) * jnp.int32(40503)
    steal = (mix & jnp.int32(0x7FFFFFFF)) % jnp.maximum(n, 1)
    cents_i = jnp.where(empty[:, None], pts_i[steal], cents_i)
    return new, cents_i, empty, moved


@jax.jit
def _widen(pu, wu, cu):
    """Widen the narrow uploaded arrays to the loop's working set on device."""
    pi = pu.astype(jnp.int32)
    return pi.astype(jnp.float32), pi, wu.astype(jnp.int32), cu.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "max_iters", "bs", "vp", "wp", "pk"))
def _kmeans_loop(pts_f, pts_i, w, valid, cur, cents_i, n, it0, k: int, max_iters: int, bs: int = _BLOCK, vp: int = 4, wp: int = 4, pk: int = 0):
    """Iterate fully on device until no point moves or the burst cap (empty
    clusters are repaired in-iteration). Returns the last move count."""

    def cond(state):
        it, _, _, moved = state
        return jnp.logical_and(moved > 0, it < it0 + max_iters)

    def body(state):
        it, cur, cents_i, _ = state
        new, cents_new, empty, moved = _iteration(
            pts_f, pts_i, w, valid, cur, cents_i.astype(jnp.float32), k, it, n,
            bs, vp, wp, pk)
        return it + 1, new, cents_new, moved

    # do-while: seed with moved=1
    state = (it0, cur, cents_i, jnp.int32(1))
    it, cur, cents_i, moved = jax.lax.while_loop(cond, body, state)
    return it, cur, cents_i, moved


def kmeans(points: np.ndarray, k: int, weights: np.ndarray | None = None,
           seed: int = 0, max_iters: int = 10_000):  # seed kept for API compat
    """Cluster integer-valued points.

    points: (n, d) nonnegative integers (any dtype).
    weights: optional (n,) positive integers (frequency weights).
    Returns (centroids int64[k, d], assignment int32[n], n_iters).
    """
    points = np.asarray(points)
    n, d = points.shape
    if n < k:
        raise ValueError(f"k-means needs at least k points ({n} < {k})")
    ppc = n // k
    if ppc == 0:
        raise ValueError("points_per_cluster must be > 0 (kmeans.rs:68)")

    # --- init (tail-chunk split, kmeans.rs:61-78) ---
    assignment = np.empty(n, dtype=np.int32)
    tail_start = n - (k - 1) * ppc
    assignment[:tail_start] = k - 1
    if k > 1:
        j = np.arange(tail_start, n)
        assignment[tail_start:] = (n - 1 - j) // ppc
    centroids = np.empty((k, d), dtype=np.int32)
    for i in range(k - 1):
        centroids[i] = points[n - (i + 1) * ppc]
    centroids[k - 1] = points[0]

    # --- padding to the block size ---
    if n > 4_000_000:
        raise ValueError("kmeans int32 digit-plane means support <= 4M points")
    # bigger blocks amortize per-step dispatch overhead; cap the distance
    # tile at ~32MB (bs * k * 4B)
    bs = 65536 if k <= 512 else _BLOCK
    bs = int(os.environ.get("CNIIC_KMEANS_BS", bs))
    max_w = 1 if weights is None else max(int(np.max(weights)), 1)
    max_prod = int(points.max(initial=0)) * max_w
    vp = max(1, (max_prod.bit_length() + 7) // 8)
    wp = max(1, (max_w.bit_length() + 7) // 8)
    # packed argmin+min single-reduce: exact only while d2*pk + idx fits
    # int32 (d2 is bounded by the per-dim maxima; centroids are truncated
    # means or stolen points, so they stay within the same per-dim ranges)
    d2_bound = int(np.sum(points.max(axis=0, initial=0).astype(np.int64) ** 2))
    pkc = 1 << max(k - 1, 0).bit_length()
    pk = pkc if (d2_bound + 1) * pkc < 2**31 else 0
    n_pad = -(-n // bs) * bs
    pts_i = np.zeros((n_pad, d), dtype=np.int32)
    pts_i[:n] = points
    w = np.zeros(n_pad, dtype=np.int32)
    w[:n] = 1 if weights is None else weights
    if int(points.max(initial=0)) * int(w.max(initial=1)) >= 2**31:
        raise ValueError("kmeans weighted values must fit int32")
    if int(w[:n].astype(np.int64).sum()) >= 2**27:
        # the base-16 long division's remainder bound (see _iteration)
        raise ValueError("kmeans total weight must be < 2^27 (~134M pixels)")
    if int(points.max(initial=0)) > 2048:
        log.warning("kmeans: coordinates exceed 2048; f32 distances lose "
                    "exactness and convergence may slow")
    valid = np.zeros(n_pad, dtype=bool)
    valid[:n] = True
    cur = np.zeros(n_pad, dtype=np.int32)
    cur[:n] = assignment

    # Narrow uploads (the tunnel link, ~35-50 MB/s, is a real cost at
    # megapixel point counts): points as int16 (values are < 2048 per the
    # exactness contract), weights as uint8 when they fit, the initial
    # assignment as uint16; one tiny device program widens to the loop's
    # int32/f32 working set so the burst-loop signature stays stable.
    pts_up = pts_i.astype(np.int16) if int(points.max(initial=0)) <= 32767 else pts_i
    w_up = w.astype(np.uint8) if max_w < 256 else w
    cur_up = cur.astype(np.uint16) if k <= 65535 else cur
    pts_f, pts_i_dev, w_dev, cur_dev = _widen(
        jnp.asarray(pts_up), jnp.asarray(w_up), jnp.asarray(cur_up))
    valid_dev = jnp.asarray(valid)
    cents_dev = jnp.asarray(centroids)

    it = 0
    # The convergence loop runs on device in bounded bursts: a single XLA
    # execution spanning hundreds of iterations over megapixel point sets
    # trips the runtime watchdog, so each call is capped and the host checks
    # in between. Burst size scales down with point count to keep per-call
    # runtime in the seconds range.
    #
    # Practical convergence (documented divergence from the reference's
    # strict till-no-change, kmeans.rs:26): with integer-truncated means at
    # megapixel scale a small fraction of boundary points limit-cycles
    # indefinitely while the clustering cost is long flat, so the loop also
    # stops when the per-iteration move count stops improving.
    burst = max(4, min(64, (1 << 23) // max(n // 8, 1)))
    n_dev = jnp.int32(n)
    best_moved = n + 1
    stall = 0
    # CNIIC_KMEANS_STRICT=1 restores the reference's strict till-no-change
    # rule (kmeans.rs:26) — used to quantify the plateau stop's frontier
    # impact (PARITY.md has the measured table).
    strict = os.environ.get("CNIIC_KMEANS_STRICT", "") == "1"
    while it < max_iters:
        it_dev, cur_dev, cents_dev, moved = _kmeans_loop(
            pts_f, pts_i_dev, w_dev, valid_dev, cur_dev, cents_dev, n_dev,
            jnp.int32(it), k, burst, bs, vp, wp, pk)
        it = int(it_dev)
        moved = int(moved)
        if moved == 0:
            break
        if strict:
            continue
        if moved <= max(n >> 10, 0):  # < 0.1% of points still moving
            break
        if moved < best_moved * 0.98:  # require real progress, not jitter
            best_moved = moved
            stall = 0
        else:
            stall += 1
            if stall >= 3:
                log.info("k-means: move count plateaued at %d (%d iterations)",
                         moved, it)
                break

    centroids = np.array(cents_dev)
    assignment = np.asarray(cur_dev)[:n]
    centroids = centroids.astype(np.int64)
    active = np.unique(assignment).size
    min_required = min(n, int(0.99 * k))
    if active < min_required:
        # the reference fails hard here (assert!, kmeans.rs:41-57); the
        # runner's per-image continue-on-error is the analog of the panic
        # aborting that image. CNIIC_KMEANS_LAX=1 downgrades to a warning.
        msg = (f"Not enough active clusters: requested {k}, got {active} "
               f"(min allowed: {min_required})")
        if os.environ.get("CNIIC_KMEANS_LAX", "") == "1":
            log.warning("k-means: %s", msg)
        else:
            raise AssertionError(msg)
    log.info("k-means: %d iterations, %d active clusters", it, active)
    return centroids, assignment, it
