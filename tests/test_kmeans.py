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
    """Init splits chunks from the tail; centroid = first point of chunk
    (kmeans.rs:61-108)."""
    pts = np.arange(10, dtype=np.int64).reshape(-1, 1) * 0  # all identical -> no movement
    pts = np.column_stack([np.arange(10, dtype=np.int64) * 0, np.arange(10, dtype=np.int64) * 0])
    # use distinct points but huge k-distance so nothing moves in one iter
    pts = np.array([[i, 0] for i in range(10)], np.int64)
    cents, assign, iters = kmeans.kmeans(pts, 3, max_iters=1)
    # ppc = 3: cluster0 = pts[7..10), cluster1 = pts[4..7), cluster2 = pts[0..4)
    # initial centroids: first of each chunk = pts[7], pts[4], pts[0]
    # (after 1 iter means are computed; just sanity check shapes/labels)
    assert cents.shape == (3, 2)
    assert assign.shape == (10,)


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
