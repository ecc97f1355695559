"""On-TPU diagnostic for the approx-RLE Pallas kernel (CNIIC_PALLAS_RLE).

1. Identity kernel using the same tile-load + masked-column-extract +
   accumulate-store pattern — isolates the memory-access pattern from the
   RLE math.
2. Record-level comparison of the full kernel vs the exact native engine:
   where is the first divergence, and is it a boundary-rounding flip
   (dist ~ allow) or structural?

Run in ONE process on the TPU: python scripts/debug_pallas_rle.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def identity_kernel(x_ref, o_ref, otile):
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    I0 = jnp.int32(0)

    def tile_step(t, carry):
        toff = t * jnp.int32(128)
        tile = x_ref[:, pl.ds(pl.multiple_of(toff, 128), 128)]

        def col_step(j, c2):
            sel = lane_ids == j
            col = jnp.sum(jnp.where(sel, tile, I0), axis=1, keepdims=True, dtype=jnp.int32)
            otile[...] = jnp.where(sel, col, otile[...])
            return c2

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(128), col_step, jnp.int32(0))
        o_ref[:, pl.ds(pl.multiple_of(toff, 128), 128)] = otile[...]
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(x_ref.shape[1] // 128), tile_step, jnp.int32(0))


def run_identity(n_cols=2048):
    x = np.arange(8 * n_cols, dtype=np.int32).reshape(8, n_cols)
    f = jax.jit(lambda v: pl.pallas_call(
        identity_kernel,
        out_shape=jax.ShapeDtypeStruct((8, n_cols), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
    )(v))
    out = np.asarray(f(jnp.asarray(x)))
    ok = np.array_equal(out, x)
    print("identity extract/accumulate pattern:", "OK" if ok else "MISMATCH")
    if not ok:
        bad = np.argwhere(out != x)
        print("first mismatches:", bad[:5], out[tuple(bad[0])], x[tuple(bad[0])])
    return ok


def run_record_compare():
    from cniic_tpu import native
    from cniic_tpu.ops import approx_rle

    rng = np.random.default_rng(3)
    L = 40000
    walk = rng.integers(-2, 3, (L, 3)).cumsum(0)
    scan = np.clip(10 + walk, 0, 255).astype(np.uint8)
    scans = scan[None]
    lens = np.array([L], np.int64)
    for allow in (1.0, 4.0, 16.0):
        (kc, kcol), = approx_rle.approx_rle_batch(scans, lens, allow, interpret=False)
        cc, ccol = native.approx_rle_encode(scan, allow)
        same = len(kc) == len(cc) and np.array_equal(kc, cc) and np.array_equal(kcol, ccol)
        print(f"allow={allow}: pallas records={len(kc)} native={len(cc)} identical={same}")
        if not same:
            m = min(len(kc), len(cc))
            d = np.flatnonzero((kc[:m] != cc[:m]))
            dcol = np.flatnonzero((kcol[:m] != ccol[:m]).any(axis=1))
            first = min(d[0] if d.size else m, dcol[0] if dcol.size else m)
            print(f"  first divergence at record {first}: "
                  f"pallas (cnt={kc[first]}, col={kcol[first].tolist()}) "
                  f"native (cnt={cc[first]}, col={ccol[first].tolist()})")
            # reconstruct pixel position of the divergence
            pos = int(cc[:first].astype(np.int64).sum())
            print(f"  pixel position ~{pos}; context px: {scan[max(0,pos-2):pos+3].tolist()}")


if __name__ == "__main__":
    ok = run_identity()
    run_record_compare()
    sys.exit(0 if ok else 1)
