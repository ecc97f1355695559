#!/usr/bin/env python
"""Device histogram / device exact-RLE probes (VERDICT r2 weak #6).

SURVEY §2.1 rows 8 and 15 mapped frequency counting and exact RLE on-chip;
rounds 1-2 shipped them as host C (LSD radix `hist_rgb`, fused `rle_frame`)
on the division-of-labor argument but never recorded a refutation
measurement for THESE two stages the way bitpack/hufdec have one. This
script is that measurement: real device implementations (sort+segment
histogram; boundary-mask RLE), parity-asserted against the C paths, timed
end-to-end (upload + compute + download) on the same 2040x1356 image the
parity corpus uses.

Run on the TPU host: python scripts/experiments/device_hist_rle_probe.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

import jax
import jax.numpy as jnp

from cniic_tpu import hilbert, native
from cniic_tpu.ops import histogram, rle


@jax.jit
def _dev_hist(pix):
    """uint8[N, 3] -> (sorted keys, run-start mask, inverse int32[N]).
    Sort-based unique: the TPU sort is the fast primitive here
    (BENCH_NOTES r1); the u32 keys ride one sort with an index payload,
    segment ids come from a cumsum over boundary flags."""
    p = pix.astype(jnp.uint32)
    keys = (p[:, 0] << 16) | (p[:, 1] << 8) | p[:, 2]
    n = keys.shape[0]
    sk, pos = jax.lax.sort((keys, jnp.arange(n, dtype=jnp.int32)),
                           num_keys=1, is_stable=True)
    change = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
    seg = jnp.cumsum(change.astype(jnp.int32)) - 1
    inverse = jnp.zeros(n, jnp.int32).at[pos].set(seg)
    return sk, change, inverse


def device_color_histogram(pixels: np.ndarray):
    """Full device histogram; host only compacts the downloaded buffers."""
    sk, change, inverse = _dev_hist(jnp.asarray(pixels))
    sk_h = np.asarray(sk)
    change_h = np.asarray(change)
    inverse_h = np.asarray(inverse)            # 4 B/px download
    uniq = sk_h[change_h]
    counts = np.diff(np.append(np.flatnonzero(change_h), sk_h.size))
    return histogram.unpack_colors(uniq.astype(np.uint32)), counts, inverse_h


@jax.jit
def _dev_rle_mask(pix):
    """uint8[N, 3] -> run-boundary mask (the associative part on device)."""
    p = pix.astype(jnp.uint32)
    keys = (p[:, 0] << 16) | (p[:, 1] << 8) | p[:, 2]
    return jnp.concatenate([jnp.ones(1, bool), keys[1:] != keys[:-1]])


def device_rle(scan: np.ndarray):
    """Device boundary pass + host closed-form 255-cap splitting."""
    mask = np.asarray(_dev_rle_mask(jnp.asarray(scan)))  # 1 B/px download
    return rle.runs_to_records(np.flatnonzero(mask), scan.shape[0], scan)


def timed(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0] + "/scripts")
    from make_synth_corpus import synth_natural

    rng = np.random.default_rng(7)
    img = synth_natural(rng, 1356, 2040)
    mp = img.shape[0] * img.shape[1] / 1e6
    pixels = img.reshape(-1, 3)

    # --- histogram ---
    dcol, dcnt, dinv = device_color_histogram(pixels)  # warm + parity
    ccol, ccnt, cinv = histogram.color_histogram(pixels)
    assert np.array_equal(dcol, ccol) and np.array_equal(dcnt, ccnt)
    assert np.array_equal(dinv, cinv)
    print(f"histogram parity ok ({dcol.shape[0]} uniques)", flush=True)
    t_c, _ = timed(lambda: histogram.color_histogram(pixels))
    t_d, _ = timed(lambda: device_color_histogram(pixels))
    print(f"histogram: C radix {t_c:.3f}s ({mp/t_c:.1f} MP/s) vs device "
          f"sort+segment {t_d:.3f}s ({mp/t_d:.1f} MP/s)", flush=True)

    # --- exact RLE (on the Hilbert scan, the codec's real input) ---
    scan = hilbert.linearize(img)
    dc, dcl = device_rle(scan)  # warm + parity
    ref = native.rle_frame(scan)
    import cniic_tpu.codecs.hilbertc as hc

    assert hc._records_to_bytes(dc, dcl) == bytes(ref)
    print(f"rle parity ok ({dc.size} records)", flush=True)
    t_c, _ = timed(lambda: native.rle_frame(scan))
    t_d, _ = timed(lambda: device_rle(scan))
    print(f"exact RLE: fused C {t_c:.3f}s ({mp/t_c:.1f} MP/s) vs device "
          f"boundary pass {t_d:.3f}s ({mp/t_d:.1f} MP/s)", flush=True)


if __name__ == "__main__":
    main()
