"""Multi-chip sharding validated on virtual CPU devices."""

import jax
import numpy as np
import pytest

from cniic_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return pmesh.make_mesh(8)


def test_point_sharded_kmeans_bit_identical(mesh8, rng):
    """The point-sharded loop (psum'd digit-plane stats + masked-psum steal)
    must reproduce the single-device kmeans() bit-for-bit — same centroids,
    same assignment, same iteration count."""
    from cniic_tpu.ops import kmeans as km

    pts = rng.integers(0, 256, (700, 3)).astype(np.int64)
    wts = rng.integers(1, 9, 700).astype(np.int64)
    c1, a1, i1 = km.kmeans(pts, 12, weights=wts)
    c2, a2, i2 = pmesh.sharded_kmeans(mesh8, pts, 12, weights=wts, block=64)
    assert i1 == i2
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(c1, c2)

    # unweighted 5-D points (the voronoi shape)
    pts = rng.integers(0, 200, (512, 5)).astype(np.int64)
    c1, a1, i1 = km.kmeans(pts, 16)
    c2, a2, i2 = pmesh.sharded_kmeans(mesh8, pts, 16, block=64)
    assert i1 == i2
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(c1, c2)


def test_batch_sharded_codecs_bit_identical(mesh8, rng):
    """With 8 lanes on 8 devices the lockstep loop auto-shards the batch
    axis (ops.kmeans._drive); streams must equal the single-device ones."""
    import os

    from cniic_tpu.codecs import from_spec

    imgs = [rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
            for _ in range(8)]
    for spec in ("cluster-colors(4)", "voronoi(8)"):
        codec = from_spec(spec)
        sharded = codec.encode_batch(imgs)           # B=8 -> mesh path
        os.environ["CNIIC_MESH"] = "0"
        try:
            single = codec.encode_batch(imgs)        # forced single-device
        finally:
            os.environ.pop("CNIIC_MESH", None)
        assert sharded == single, spec


def test_sharded_mse(mesh8, rng):
    imgs = rng.integers(0, 256, (16, 8, 8, 3)).astype(np.uint8)
    noisy = imgs.copy()
    noisy[..., 0] ^= 3
    out = pmesh.sharded_mse(mesh8)(imgs, noisy)
    assert out.shape == (16,)
    # every pixel differs by xor 3 in one channel: MSE = mean of (diff^2)
    diff = imgs[..., 0].astype(np.int64) - noisy[..., 0].astype(np.int64)
    expect = (diff.astype(np.float64) ** 2).sum((1, 2)) / 64
    assert np.allclose(np.asarray(out), expect)


def test_dryrun_multichip_entry():
    import __graft_entry__ as g

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    g.dryrun_multichip(8)


def test_batch_sharded_pallas_kernel_bit_identical(mesh8, rng, monkeypatch):
    """VERDICT r2 #7: the fused Pallas kernel rides shard_map under a mesh
    (interpret mode on CPU) instead of falling back to the XLA body; the
    sharded-kernel streams must equal the single-device-kernel streams."""
    from cniic_tpu.codecs import from_spec

    monkeypatch.setenv("CNIIC_PALLAS_KMEANS", "1")
    imgs = [rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
            for _ in range(8)]
    for spec in ("cluster-colors(4)", "voronoi(8)"):
        codec = from_spec(spec)
        sharded = codec.encode_batch(imgs)           # B=8 -> mesh + kernel
        monkeypatch.setenv("CNIIC_MESH", "0")
        single = codec.encode_batch(imgs)            # single-device kernel
        monkeypatch.delenv("CNIIC_MESH")
        assert sharded == single, spec
