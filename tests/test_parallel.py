"""Multi-chip sharding validated on virtual CPU devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cniic_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return pmesh.make_mesh(8)


def test_sharded_kmeans_step_matches_single_device(mesh8, rng):
    k, d, n = 8, 5, 64 * 8
    points = rng.integers(0, 64, (n, d)).astype(np.int32)
    w = np.ones(n, np.int32)
    cur = np.zeros(n, np.int32)
    cents = points[:k].astype(np.float32)

    step = pmesh.sharded_kmeans_step(mesh8, k, block=64)
    new, out_cents, wsum, changed = step(points.astype(np.float32), points, w, cur, cents)
    assert int(np.asarray(wsum).sum()) == n
    assert bool(changed)

    # cross-check the assignment against a plain numpy argmin-with-stay
    d2 = ((points[:, None, :].astype(np.float64) - cents[None].astype(np.float64)) ** 2).sum(-1)
    best = d2.argmin(1)
    stay = d2[np.arange(n), cur] <= d2[np.arange(n), best]
    expect = np.where(stay, cur, best)
    assert np.array_equal(np.asarray(new), expect)

    # centroids: exact truncated means of the new assignment
    for c in range(k):
        members = points[expect == c]
        if len(members):
            exp_mean = members.sum(0) // len(members)
            assert np.array_equal(np.asarray(out_cents)[c], exp_mean)


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
