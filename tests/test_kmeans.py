"""K-means semantics (ported from kmeans.rs:446-581, nonnegative domain)."""

import numpy as np
import pytest

from cniic_tpu.ops import kmeans


def _square_centered_at(p):
    return [(p[0] + i, p[1] + j) for i in range(-1, 2) for j in range(-1, 2)]


def test_all_clusters_k_equals_n():
    # kmeans.rs:492-500: every point its own cluster
    data = np.array([(0, 0), (1, 1)], np.int64)
    cents, assign, _ = kmeans.kmeans(data, 2)
    assert sorted(map(tuple, cents.tolist())) == [(0, 0), (1, 1)]
    assert np.unique(assign).size == 2


def test_square1():
    # kmeans.rs:516-523 (shifted to a nonnegative domain)
    data = np.array(_square_centered_at((10, 10)), np.int64)
    cents, assign, _ = kmeans.kmeans(data, 1)
    assert cents.tolist() == [[10, 10]]
    assert (assign == 0).all()


def test_squares2():
    # kmeans.rs:526-539: two well-separated squares
    data = np.array(
        _square_centered_at((10, 50)) + _square_centered_at((210, 50)), np.int64)
    cents, assign, _ = kmeans.kmeans(data, 2)
    assert sorted(map(tuple, cents.tolist())) == [(10, 50), (210, 50)]
    # each square ends up in one cluster
    assert np.unique(assign[:9]).size == 1
    assert np.unique(assign[9:]).size == 1


def test_init_layout():
    """Init splits k equal chunks from the TAIL and the initial centroid is
    the FIRST point of each chunk (kmeans.rs:61-108). The point set below
    discriminates both choices:

    * tail-chunking fixes the label layout — cluster0 = pts[7:10],
      cluster1 = pts[4:7], cluster2 = pts[0:4] (head chunks would permute
      the final labels);
    * first-point centroids decide where pts[3]=35 goes on iteration 1 —
      with c1 = pts[4] = 40 it moves to cluster 1 (|35-40| = 5 < 35) and
      stays there; with a mean (74) or last-point (92) init it would stay
      in cluster 2 for good.
    """
    vals = [0, 1, 2, 35, 40, 90, 92, 150, 151, 152]
    pts = np.array([[v, 0] for v in vals], np.int64)
    cents, assign, _ = kmeans.kmeans(pts, 3)
    assert assign.tolist() == [2, 2, 2, 1, 1, 1, 1, 0, 0, 0]
    # converged truncated means of {35,40,90,92}, {0,1,2}, {150,151,152}
    assert cents.tolist() == [[151, 0], [64, 0], [1, 0]]


def test_weighted_mean_no_int32_overflow():
    """Regression for ADVICE.md r1: the base-256 long division overflowed
    once a cluster's total weight crossed ~2^23, silently corrupting the
    palette (all-[255]^3 with 2e7 total weight returned [40,40,40])."""
    pts = np.tile(np.array([[255, 255, 255]], np.int64), (4, 1))
    w = np.full(4, 5_000_000, np.int64)  # total weight 2e7 > 2^23
    cents, _, _ = kmeans.kmeans(pts, 1, weights=w)
    assert cents.tolist() == [[255, 255, 255]]
    # mixed-value truncation at scale: (255*15M + 0*5M) // 20M = 191
    pts = np.array([[255, 255, 255], [255, 255, 255], [255, 255, 255],
                    [0, 0, 0]], np.int64)
    cents, _, _ = kmeans.kmeans(pts, 1, weights=w)
    assert cents.tolist() == [[191, 191, 191]]


def test_total_weight_guard():
    with pytest.raises(ValueError, match="2\\^27"):
        kmeans.kmeans(np.zeros((2, 3), np.int64), 1,
                      weights=np.full(2, 2**26, np.int64))


def test_weighted_integer_mean():
    """ColorCount mean: sum(color*count)//sum(count) (clusterc.rs:92-113)."""
    colors = np.array([[0, 0, 0], [2, 2, 2]], np.int64)
    weights = np.array([1, 1], np.int64)
    cents, _, _ = kmeans.kmeans(colors, 1, weights=weights)
    assert cents.tolist() == [[1, 1, 1]]
    # weighted: (0*3 + 2*1) // 4 = 0
    weights = np.array([3, 1], np.int64)
    cents, _, _ = kmeans.kmeans(colors, 1, weights=weights)
    assert cents.tolist() == [[0, 0, 0]]


def test_truncated_division():
    pts = np.array([[0, 0], [0, 0], [1, 1]], np.int64)
    cents, _, _ = kmeans.kmeans(pts, 1)
    assert cents.tolist() == [[0, 0]]  # 1//3 = 0 truncation


def test_needs_enough_points():
    with pytest.raises(ValueError):
        kmeans.kmeans(np.zeros((2, 2), np.int64), 3)


def test_stay_on_tie():
    """A point equidistant to its own and another centroid must stay."""
    # two points at the same location, k=2: both centroids identical;
    # assignments must not oscillate
    pts = np.array([[5, 5], [5, 5]], np.int64)
    cents, assign, iters = kmeans.kmeans(pts, 2)
    assert iters <= 3


def test_packed_argmin_matches_plain():
    """The packed min-reduce (d2*pk + idx) must reproduce plain argmin's
    assignments and centroids exactly, including first-index tie breaking."""
    import cniic_tpu.ops.kmeans as km

    rng = np.random.default_rng(11)
    pts = np.column_stack([
        rng.integers(0, 512, 4096),
        rng.integers(0, 512, 4096),
        rng.integers(0, 256, 4096),
    ]).astype(np.int64)
    # duplicate many points so distance ties between centroids are common
    pts[2048:] = pts[:2048]

    c1, a1, i1 = km.kmeans(pts, 16)

    orig = km._kmeans_loop
    # force the plain-argmin fallback by rebinding pk=0 at the loop call
    # (the wrapper passes pk as the final positional argument)
    def no_pack(*args, **kwargs):
        if "pk" in kwargs:
            kwargs["pk"] = 0
        else:
            args = args[:-1] + (0,)
        return orig(*args, **kwargs)
    km._kmeans_loop = no_pack
    try:
        c2, a2, i2 = km.kmeans(pts, 16)
    finally:
        km._kmeans_loop = orig

    assert i1 == i2
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(c1, c2)


def test_kmeans_batch_lanes_match_single():
    """Lockstep lanes (different sizes, weighted + unweighted mix) must be
    bit-identical to running each point set alone: a lane is frozen the
    instant its own stop rule fires, regardless of its neighbours."""
    rng = np.random.default_rng(7)
    sets = [
        (rng.integers(0, 256, (500, 3)).astype(np.int64),
         rng.integers(1, 50, 500).astype(np.int64)),
        (rng.integers(0, 256, (1200, 3)).astype(np.int64), None),
        (rng.integers(0, 256, (37, 3)).astype(np.int64),
         np.ones(37, np.int64)),
    ]
    batched = kmeans.kmeans_batch([p for p, _ in sets], 8,
                                  weights_list=[w for _, w in sets])
    for (p, w), (bc, ba, _) in zip(sets, batched):
        sc, sa, _ = kmeans.kmeans(p, 8, weights=w)
        np.testing.assert_array_equal(bc, sc)
        np.testing.assert_array_equal(ba, sa)


def test_batch_mixed_dimensionality_raises(rng):
    """Mixed-d batches are a caller bug and must surface even in collect
    mode (ADVICE.md r2: the CrossLaneBoundError fallback used to swallow
    this and silently retry per-lane)."""
    p2 = rng.integers(0, 256, (64, 2)).astype(np.int64)
    p3 = rng.integers(0, 256, (64, 3)).astype(np.int64)
    with pytest.raises(ValueError, match="share dimensionality"):
        kmeans.kmeans_batch([p2, p3], 4, on_error="collect")


def test_batch_cross_lane_bound_falls_back_per_lane(rng):
    """The one legal per-lane retry: a global max_val*max_w overflow from
    mixing a high-value lane with a high-weight lane, each valid alone."""
    hi_val = rng.integers(0, 2048, (64, 3)).astype(np.int64)
    hi_val[0, 0] = 2100  # max_val 2100 * max_w 2^20 > 2^31 combined only
    hi_w = rng.integers(0, 256, (64, 3)).astype(np.int64)
    w_small = np.ones(64, np.int64)
    w_big = np.full(64, 2**20, np.int64)  # total weight 2^26 < 2^27 bound
    res = kmeans.kmeans_batch([hi_val, hi_w], 4,
                              weights_list=[w_small, w_big],
                              on_error="collect")
    assert all(not isinstance(r, Exception) for r in res)
    # per-lane results match running each lane alone
    solo = [kmeans.kmeans_batch([hi_val], 4, weights_list=[w_small])[0],
            kmeans.kmeans_batch([hi_w], 4, weights_list=[w_big])[0]]
    for r, s in zip(res, solo):
        np.testing.assert_array_equal(r[0], s[0])
        np.testing.assert_array_equal(r[1], s[1])


@pytest.mark.parametrize("n,k", [(64, 4), (64, 64), (17, 1), (100, 7), (9, 8)])
def test_device_init_matches_reference_formula(rng, n, k):
    """_widen_init's on-device init must equal an independent host replica
    of the reference's tail-chunk rule (kmeans.rs:61-78)."""
    import jax.numpy as jnp

    p = rng.integers(0, 256, (n, 3)).astype(np.int32)
    n_pad = -(-n // 8) * 8 + 8  # arbitrary padding
    pu = np.zeros((1, n_pad, 3), np.uint8)
    pu[0, :n] = p
    wu = np.zeros((1, n_pad), np.uint8)
    wu[0, :n] = 1
    _, _, _, valid, cur, cents = kmeans._widen_init(
        jnp.asarray(pu), jnp.asarray(wu),
        jnp.asarray(np.array([n], np.int32)), k)
    # host replica (straight from the reference's description)
    ppc = n // k
    tail = n - (k - 1) * ppc
    exp_cur = np.zeros(n_pad, np.int32)
    exp_cur[:tail] = k - 1
    for j in range(tail, n):
        exp_cur[j] = (n - 1 - j) // ppc
    exp_cents = np.array([p[n - (i + 1) * ppc] for i in range(k - 1)] + [p[0]])
    np.testing.assert_array_equal(np.asarray(valid)[0, :n], True)
    np.testing.assert_array_equal(np.asarray(valid)[0, n:], False)
    np.testing.assert_array_equal(np.asarray(cur)[0], exp_cur)
    np.testing.assert_array_equal(np.asarray(cents)[0], exp_cents)
