"""Hardware-free Mosaic/TPU lowering guards.

Pallas kernels can fail Mosaic lowering (e.g. 64-bit converts under
jax_enable_x64) even when interpret-mode tests pass. AOT cross-lowering for
the TPU platform from the CPU backend catches that class of regression
without claiming hardware.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _lower_tpu(jitted, *args):
    return jitted.trace(*args).lower(lowering_platforms=("tpu",))


def test_approx_rle_kernel_lowers_for_tpu():
    jax.config.update("jax_enable_x64", True)  # the production configuration
    from cniic_tpu.ops import approx_rle

    allow = jnp.asarray(np.asarray([2.0], np.float32))
    lens = jnp.asarray(np.zeros((approx_rle.LANES, 1), np.int32))
    rgb = jnp.asarray(np.zeros((approx_rle.LANES, approx_rle.BLOCK * 2), np.int32))
    f = jax.jit(functools.partial(approx_rle._run.__wrapped__, n_blocks=2, interpret=False))
    text = _lower_tpu(f, allow, lens, rgb).as_text()
    assert "tpu_custom_call" in text or "mosaic" in text.lower()


def test_bitpack_lowers_for_tpu():
    jax.config.update("jax_enable_x64", True)
    from cniic_tpu.ops import bitpack

    ids = jnp.asarray(np.zeros(4096, np.int32))
    hi = jnp.asarray(np.zeros(65, np.uint32))
    lo = jnp.asarray(np.zeros(65, np.uint32))
    lens = jnp.asarray(np.zeros(65, np.int32))
    f = jax.jit(functools.partial(bitpack._pack_device.__wrapped__, n_words=8194))
    _lower_tpu(f, ids, hi, lo, lens)


def test_kmeans_loop_lowers_for_tpu():
    jax.config.update("jax_enable_x64", True)
    from cniic_tpu.ops import kmeans as km

    n_pad = km._BLOCK
    B = 2
    pts_f = jnp.asarray(np.zeros((B, n_pad, 3), np.float32))
    pts_i = jnp.asarray(np.zeros((B, n_pad, 3), np.int32))
    w = jnp.asarray(np.ones((B, n_pad), np.int32))
    valid = jnp.asarray(np.ones((B, n_pad), bool))
    cur = jnp.asarray(np.zeros((B, n_pad), np.int32))
    cents = jnp.asarray(np.zeros((B, 4, 3), np.int32))
    n = jnp.asarray(np.full(B, n_pad, np.int32))
    thresh = jnp.asarray(np.zeros(B, np.int32))
    moved0 = jnp.asarray(np.full(B, n_pad, np.int32))
    f = jax.jit(functools.partial(km._kmeans_loop.__wrapped__, k=4, max_iters=10))
    _lower_tpu(f, pts_f, pts_i, w, valid, cur, cents, n, thresh, moved0,
               moved0, jnp.zeros_like(moved0), jnp.int32(0))


def test_kmeans_pallas_kernel_lowers_for_tpu():
    jax.config.update("jax_enable_x64", True)
    from cniic_tpu.ops import kmeans_pallas as kp

    B, d, n_pad, k = 2, 5, 4096, 128
    ptsT = jnp.asarray(np.zeros((B, d, n_pad), np.float32))
    w = jnp.asarray(np.ones((B, n_pad), np.int32))
    cur = jnp.asarray(np.zeros((B, n_pad), np.int32))
    cents = jnp.asarray(np.zeros((B, k, d), np.int32))
    n = jnp.asarray(np.full(B, n_pad, np.int32))
    thresh = jnp.asarray(np.zeros(B, np.int32))
    moved0 = jnp.asarray(np.full(B, n_pad, np.int32))
    f = jax.jit(functools.partial(
        kp.kmeans_loop_pallas.__wrapped__, k=k, max_iters=8, bs=2048,
        vp=2, wp=1, pk=128, d2b=1 << 21, stall_lim=64, interpret=False))
    text = _lower_tpu(f, ptsT, w, cur, cents, n, thresh, moved0,
                      moved0, jnp.zeros_like(moved0), jnp.int32(0)).as_text()
    assert "tpu_custom_call" in text or "mosaic" in text.lower()


def test_wide_approx_rle_kernel_lowers_for_tpu():
    import functools

    import jax.numpy as jnp

    from cniic_tpu.ops import approx_rle as ar

    f = jax.jit(functools.partial(ar._wrun.__wrapped__, n_blocks=2))
    allow = jnp.asarray([4.0], jnp.float32)
    lens = jnp.zeros((8, 128), jnp.int32)
    rgb = jnp.zeros((8, 2 * ar.WBP * 128), jnp.int32)
    text = _lower_tpu(f, allow, lens, rgb).as_text()
    assert "tpu_custom_call" in text or "mosaic" in text.lower()
