"""Fused Pallas k-means iteration: bit-exact parity with the XLA path.

The kernel must reproduce ops.kmeans._iteration exactly — assignments
(incl. the strict-move tie rule), digit-plane statistics, move counts —
so the full clustering trajectory is identical whichever path runs.
Interpret mode on the CPU backend; the Mosaic lowering is guarded in
test_tpu_lowering.py and hardware parity in scripts/experiments/.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cniic_tpu.ops import kmeans as km
from cniic_tpu.ops import kmeans_pallas as kp


def _mk_batch(rng, B, n, d, k, maxval, weighted):
    pts, ws = [], []
    for _ in range(B):
        p = rng.integers(0, maxval, (n, d)).astype(np.int64)
        p[n // 2:] = p[: n - n // 2]  # duplicates -> distance ties
        pts.append(p)
        ws.append(rng.integers(1, 200, n).astype(np.int64) if weighted else None)
    return pts, ws


@pytest.mark.parametrize("k,d,weighted", [(8, 3, True), (16, 5, False),
                                          (5, 2, False)])
def test_assign_stats_matches_iteration(k, d, weighted):
    rng = np.random.default_rng(3)
    B, n = 2, 300
    pts, ws = _mk_batch(rng, B, n, d, k, 256, weighted)
    (pts_f, pts_i, w, valid, cur, cents, ns, bs, vp, wp, pk, pw, split,
     wide, d2b) = km._prep_host_batch(pts, k, ws if weighted else None)
    assert pk, "packed argmin must be available at these bounds"
    bs_p = 128
    assert pts_i.shape[1] % bs_p == 0

    ptsT = kp.to_ptsT(pts_i)
    new_p, sums_p, mv_p = kp._assign_stats(
        ptsT, w, cur, cents.astype(jnp.float32),
        jnp.asarray(ns.astype(np.int32)),
        jnp.asarray(np.ones(B, np.int32)),
        k=k, vp=vp, wp=wp, pk=pk, bs=bs_p, d2b=d2b, packed=True,
        interpret=True)

    for b in range(B):
        new_x, cents_x, _, moved_x = km._iteration(
            pts_f[b], pts_i[b], w[b], valid[b], cur[b],
            cents[b].astype(jnp.float32), k, jnp.int32(0),
            jnp.int32(int(ns[b])), bs, vp, wp, pk)
        np.testing.assert_array_equal(np.asarray(new_p[b]), np.asarray(new_x))
        assert int(mv_p[b, 0]) == int(moved_x)
        # same statistics => same means: check through the shared tail
        cents_p, _ = km._means_from_sums(
            sums_p[b], pts_i[b], k, jnp.int32(0),
            jnp.int32(int(ns[b])), vp, wp)
        np.testing.assert_array_equal(np.asarray(cents_p), np.asarray(cents_x))


def test_full_kmeans_matches_xla_path(monkeypatch):
    """End-to-end: the Pallas loop (interpret) must yield the exact same
    centroids/assignments/iteration count as the XLA loop."""
    rng = np.random.default_rng(5)
    pts = rng.integers(0, 256, (700, 3)).astype(np.int64)
    wts = rng.integers(1, 9, 700).astype(np.int64)

    monkeypatch.setenv("CNIIC_PALLAS_KMEANS", "0")
    c_x, a_x, i_x = km.kmeans(pts, 12, weights=wts)
    monkeypatch.setenv("CNIIC_PALLAS_KMEANS", "1")
    monkeypatch.setenv("CNIIC_KMEANS_BS", "512")  # pad to a kernel-divisible size
    c_p, a_p, i_p = km.kmeans(pts, 12, weights=wts)

    assert i_x == i_p
    np.testing.assert_array_equal(a_x, a_p)
    np.testing.assert_array_equal(c_x, c_p)


def test_two_reduce_variant_matches_packed(monkeypatch):
    """The big-k two-reduction path must make the exact same decisions as
    the packed single-reduction key (and therefore as the XLA oracle)."""
    rng = np.random.default_rng(13)
    pts = rng.integers(0, 256, (700, 3)).astype(np.int64)

    monkeypatch.setenv("CNIIC_PALLAS_KMEANS", "1")
    monkeypatch.setenv("CNIIC_KMEANS_BS", "512")
    c1, a1, i1 = km.kmeans(pts, 12)

    # force the two-reduce variant: the wrapper below overrides
    # packed=False on every kernel call (the packed single-reduce key is
    # what's being cross-checked against)
    real_loop = kp.kmeans_loop_pallas

    def no_pack_loop(*args, **kwargs):
        kwargs["packed"] = False
        return real_loop(*args, **kwargs)

    monkeypatch.setattr(kp, "kmeans_loop_pallas", no_pack_loop)
    c2, a2, i2 = km.kmeans(pts, 12)
    assert i1 == i2
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(c1, c2)


def test_pick_block():
    assert kp.pick_block(65536, 128, 1) == 32768
    assert kp.pick_block(65536, 128, 4) == 16384  # VMEM cap: 4*128*bs <= 2^23
    assert kp.pick_block(65536, 32, 4) == 32768   # the cluster-colors shape
    assert kp.pick_block(65536, 2048, 2) == 2048  # VMEM-capped at large k
    assert kp.pick_block(100, 16, 1) == 0         # nothing divides


def test_codec_streams_identical_under_forced_kernel(monkeypatch, rng):
    """Codec-level: forcing the fused kernel (interpret off-TPU) must
    produce byte-identical streams to the XLA iteration for both k-means
    codecs — the full-stack version of the step-level parity pins."""
    from cniic_tpu.codecs import from_spec

    imgs = [rng.integers(0, 256, (32, 40, 3)).astype(np.uint8)
            for _ in range(2)]
    for spec in ("cluster-colors(8)", "voronoi(16)"):
        codec = from_spec(spec)
        monkeypatch.setenv("CNIIC_PALLAS_KMEANS", "0")
        xla = codec.encode_batch(imgs)
        monkeypatch.setenv("CNIIC_PALLAS_KMEANS", "1")
        kern = codec.encode_batch(imgs)
        assert xla == kern, spec
