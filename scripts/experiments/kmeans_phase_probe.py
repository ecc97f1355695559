#!/usr/bin/env python
"""Split the cluster-colors k-means stage into its phases on real chunks.

BENCH_NOTES r5 recorded the stage split at north-star statistics (hist 2%,
k-means ~90%) but treated the k-means stage as one number. This probe
separates, per 8-lane call on the production path's exact inputs:

  prep    host-side validation + padding (numpy, no device)
  upload  jnp.asarray of the narrow arrays + _widen_init, synced by a
          1-element fetch (adds ~1 tunnel RTT to the reading, noted)
  burst   the _drive-equivalent convergence loop, per-burst wall +
          iteration counts -> an honest ms/iteration slope
  fetch   packed u16 result download

and prints the per-phase totals. The question it answers: is the leg
iteration-bound (kernel work), upload-bound (tunnel), or dispatch-bound
(per-call fixed costs) — each points at a different (or no) lever.

Usage: python scripts/experiments/kmeans_phase_probe.py [--lanes=8]
       [--k=32] [--groups=2] <pngs...>
"""

from __future__ import annotations

import glob as globlib
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from cniic_tpu import image_io  # noqa: E402
from cniic_tpu.codecs.base import pixels_row_major  # noqa: E402
from cniic_tpu.ops import histogram  # noqa: E402
from cniic_tpu.ops import kmeans as km  # noqa: E402


def _sync_small(arr):
    """Force completion: fetch one element (np.asarray of a tiny slice is
    the only reliable sync on the axon stack — CLAUDE.md)."""
    np.asarray(arr[(0,) * arr.ndim])


def probe_call(points_list, k, weights_list, w_bound):
    import jax.numpy as jnp

    t = {}
    t0 = time.perf_counter()
    # ---- prep (host): the body of _prep_host_batch up to the uploads ----
    B = len(points_list)
    points_list = [np.asarray(p) for p in points_list]
    d = points_list[0].shape[1]
    ns = np.array([p.shape[0] for p in points_list], np.int64)
    for p, wl in zip(points_list, weights_list):
        km._validate_lane(p, wl, k)
    max_val = max(int(p.max(initial=0)) for p in points_list)
    max_w = max(1 if wl is None else max(int(np.max(wl)), 1)
                for wl in weights_list)
    d2_bound = max(
        int(np.sum(p.max(axis=0, initial=0).astype(np.int64) ** 2))
        for p in points_list)
    plan = km.static_compile_key(int(ns.max()), max_val, max_w, d2_bound,
                                 k, B, w_bound=w_bound)
    bs, vp, wp, pk, pw, split, wide = (
        plan["bs"], plan["vp"], plan["wp"], plan["pk"], plan["pw"],
        plan["split"], plan["wide"])
    n_pad = plan["n_pad"]
    pts_i = np.zeros((B, n_pad, d), dtype=np.int32)
    w = np.zeros((B, n_pad), dtype=np.int32)
    for b, (p, wl) in enumerate(zip(points_list, weights_list)):
        n = p.shape[0]
        pts_i[b, :n] = p
        w[b, :n] = 1 if wl is None else wl
    pts_up = pts_i.astype({"u8": np.uint8, "i16": np.int16,
                           "i32": np.int32}[plan["pts_dtype"]])
    ovf = plan["w_dtype"] == "u16ovf"
    if ovf:
        wlo_up, ovf_lane, ovf_pos, ovf_hi = km._split_weights_u16(w)
        up_bytes = (pts_up.nbytes + wlo_up.nbytes + ovf_lane.nbytes
                    + ovf_pos.nbytes + ovf_hi.nbytes)
    else:
        w_up = w.astype(np.uint8) if plan["w_dtype"] == "u8" else w
        up_bytes = pts_up.nbytes + w_up.nbytes
    t["prep"] = time.perf_counter() - t0

    # ---- upload + widen (device), synced ----
    t0 = time.perf_counter()
    if ovf:
        (pts_f, pts_i_dev, w_dev, valid_dev, cur_dev,
         cents_dev) = km._widen_init_ovf(
            jnp.asarray(pts_up), jnp.asarray(wlo_up), jnp.asarray(ovf_lane),
            jnp.asarray(ovf_pos), jnp.asarray(ovf_hi),
            jnp.asarray(ns.astype(np.int32)), k)
    else:
        (pts_f, pts_i_dev, w_dev, valid_dev, cur_dev,
         cents_dev) = km._widen_init(
            jnp.asarray(pts_up), jnp.asarray(w_up),
            jnp.asarray(ns.astype(np.int32)), k)
    _sync_small(cents_dev)
    t["upload"] = time.perf_counter() - t0
    up_mb = up_bytes / 1e6

    # ---- bursts: replicate _drive with per-burst timing ----
    thresh = np.array([km._stop_threshold(int(n)) for n in ns], np.int32)
    d2b_key = km._pow2_ceil(d2_bound)
    burst = km._xla_burst(n_pad, B)
    thresh_dev = jnp.asarray(thresh)
    n_dev = jnp.asarray(ns.astype(np.int32))
    moved = ns.astype(np.int64) + 1
    stall_lim = km._STALL_LIMIT
    best_dev = jnp.asarray((ns + 1).astype(np.int32))
    stall_dev = jnp.asarray(np.zeros(B, np.int32))
    bs_p = 0 if (wide or pw != 8 or split != 32) else km._pallas_block(
        n_pad, k, B, d2_bound)
    cur, cents = cur_dev, cents_dev
    burst_times = []
    it = 0
    if bs_p:
        import jax

        from cniic_tpu.ops import kmeans_pallas

        t0 = time.perf_counter()
        ptsT = kmeans_pallas.to_ptsT(pts_i_dev)
        _sync_small(ptsT)
        t["transpose"] = time.perf_counter() - t0
        pkc = 1 << max(k - 1, 0).bit_length()
        packed = (d2_bound + 1) * 2 * pkc < 2**31
        burst = km._pallas_burst(n_pad, B, 1)
        interp = jax.default_backend() == "cpu"

        def run_burst(cur, cents, mseed, best_s, stall_s, it):
            return kmeans_pallas.kmeans_loop_pallas(
                ptsT, w_dev, cur, cents, n_dev, thresh_dev, mseed,
                best_s, stall_s, jnp.int32(it), k, burst, bs_p, vp, wp,
                pkc, d2b=d2b_key, packed=packed, stall_lim=stall_lim,
                interpret=interp)
    else:
        def run_burst(cur, cents, mseed, best_s, stall_s, it):
            return km._kmeans_loop(
                pts_f, pts_i_dev, w_dev, valid_dev, cur, cents, n_dev,
                thresh_dev, mseed, best_s, stall_s, jnp.int32(it), k, burst,
                bs=bs, vp=vp, wp=wp, pk=pk, pw=pw, split=split, wide=wide,
                stall_lim=stall_lim)

    stall = np.zeros(B, np.int64)
    while it < 10_000 and ((moved > thresh) & (stall < stall_lim)).any():
        t0 = time.perf_counter()
        it_dev, cur, cents, moved_dev, best_dev, stall_dev = run_burst(
            cur, cents, jnp.asarray(moved.astype(np.int32)), best_dev,
            stall_dev, it)
        new_it = int(it_dev)
        moved = np.asarray(moved_dev).astype(np.int64)
        stall = np.asarray(stall_dev).astype(np.int64)
        burst_times.append((new_it - it, time.perf_counter() - t0))
        it = new_it
    t["burst"] = sum(dt for _, dt in burst_times)

    # ---- fetch (same packing selection as kmeans_batch) ----
    t0 = time.perf_counter()
    pack = km._pack_results_u8 if (k <= 256 and max_val <= 255) \
        else km._pack_results_u16
    packed_res = np.asarray(pack(cur, cents, k))
    t["fetch"] = time.perf_counter() - t0

    return t, it, burst_times, up_mb, n_pad, bs_p, packed_res


def main() -> int:
    lanes, k, n_groups = 8, 32, 2
    paths = []
    for a in sys.argv[1:]:
        if a.startswith("--lanes="):
            lanes = int(a.split("=", 1)[1])
        elif a.startswith("--k="):
            k = int(a.split("=", 1)[1])
        elif a.startswith("--groups="):
            n_groups = int(a.split("=", 1)[1])
        else:
            paths.extend(sorted(globlib.glob(a)) or [a])
    need = lanes * (n_groups + 1)
    paths = sorted(paths)[:need]
    assert len(paths) == need, f"need {need} images, got {len(paths)}"

    import jax
    print(f"backend={jax.default_backend()} lanes={lanes} k={k}", flush=True)

    groups = [paths[i:i + lanes] for i in range(0, len(paths), lanes)]
    for gi, group in enumerate(groups):
        imgs = [image_io.load_image(p) for p in group]
        stats = [histogram.color_histogram(pixels_row_major(im))
                 for im in imgs]
        order = sorted(range(len(stats)),
                       key=lambda i: stats[i][0].shape[0], reverse=True)
        pts = [stats[i][0].astype(np.int64) for i in order]
        wts = [stats[i][1].astype(np.int64) for i in order]
        w_bound = max(im.shape[0] * im.shape[1] for im in imgs)
        label = "warmup" if gi == 0 else f"group{gi}"
        t, iters, bursts, up_mb, n_pad, bs_p, _ = probe_call(
            pts, k, wts, w_bound)
        tot = sum(t.values())
        per_it = t["burst"] / max(iters, 1) * 1e3
        print(f"{label}: uniq={[p.shape[0] for p in pts]} n_pad={n_pad} "
              f"pallas_bs={bs_p}", flush=True)
        print(f"  " + "  ".join(f"{k_}={v:.3f}s" for k_, v in t.items())
              + f"  total={tot:.3f}s", flush=True)
        print(f"  upload={up_mb:.1f} MB  iters={iters} "
              f"bursts={bursts}  -> {per_it:.2f} ms/iter", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
