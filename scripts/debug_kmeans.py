"""Per-burst k-means probe for the voronoi workload (run solo on the TPU).

Prints per-burst wall time and movement counts so convergence behavior and
device runtime are visible instead of hiding inside one opaque encode call.
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cniic_tpu import image_io
    from cniic_tpu.ops import kmeans as km

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    if side < 0:
        # non-repeating natural-ish synthetic (bench-style)
        import importlib.util
        spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
        bench = importlib.util.module_from_spec(spec); spec.loader.exec_module(bench)
        big = bench.synth_image(np.random.default_rng(1), -side, -side)
    else:
        img = image_io.load_image("/tmp/corpus/t1.png")
        big = np.tile(img, (5, 5, 1))[:1356, :2040]
        if side:
            big = big[:side, :side]
    h, w = big.shape[:2]
    px = big.reshape(-1, 3).astype(np.int32)
    xs = np.tile(np.arange(w, dtype=np.int32), h)
    ys = np.repeat(np.arange(h, dtype=np.int32), w)
    points = np.column_stack([xs, ys, px])
    n, d = points.shape
    print(f"n={n} d={d} k={k}", flush=True)

    ppc = n // k
    assignment = np.empty(n, dtype=np.int32)
    tail_start = n - (k - 1) * ppc
    assignment[:tail_start] = k - 1
    j = np.arange(tail_start, n)
    assignment[tail_start:] = (n - 1 - j) // ppc
    centroids = np.empty((k, d), dtype=np.int32)
    for i in range(k - 1):
        centroids[i] = points[n - (i + 1) * ppc]
    centroids[k - 1] = points[0]

    n_pad = -(-n // km._BLOCK) * km._BLOCK
    pts_i = np.zeros((n_pad, d), np.int32)
    pts_i[:n] = points
    wgt = np.zeros(n_pad, np.int32)
    wgt[:n] = 1
    valid = np.zeros(n_pad, bool)
    valid[:n] = True
    cur = np.zeros(n_pad, np.int32)
    cur[:n] = assignment

    pts_f = jnp.asarray(pts_i, jnp.float32)
    pts_i_d = jnp.asarray(pts_i)
    w_d = jnp.asarray(wgt)
    v_d = jnp.asarray(valid)
    cur_d = jnp.asarray(cur)
    cents_d = jnp.asarray(centroids)

    import jax.numpy as jnp2

    t0 = time.time()
    prev = np.asarray(cur_d)
    total = 0
    for burst in range(400):
        t = time.time()
        it_dev, cur_d, cents_d, changed = km._kmeans_loop(
            pts_f, pts_i_d, w_d, v_d, cur_d, cents_d, jnp2.int32(n),
            jnp2.int32(total), k, 5)
        steps = int(it_dev) - total
        total = int(it_dev)
        now = np.asarray(cur_d)
        moved = int((now != prev).sum())
        prev = now
        if burst % 10 == 0:
            asg = now[:n]
            counts = np.bincount(asg, minlength=k)
            empties = int((counts == 0).sum())
            cents = np.asarray(cents_d)
            samp = np.random.default_rng(0).integers(0, n, 20000)
            diff = points[samp][:, None, :].astype(np.float64) - cents[None, :, :]
            cost = float(np.sqrt((diff ** 2).sum(-1)).min(1).mean())
            print(f"burst {burst}: steps={steps} {time.time()-t:.2f}s moved={moved} "
                  f"empties={empties} sampled_cost={cost:.2f} total_it={total}", flush=True)
        if not bool(changed):
            break
    print(f"TOTAL {time.time()-t0:.1f}s, {total} iterations", flush=True)


if __name__ == "__main__":
    main()
