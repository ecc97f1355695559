"""Lane-parallel approximate RLE (Pallas, TPU).

The running-average acceptance recurrence (reference hilbertc.rs:200-285) is
non-associative and strictly sequential *within* a stream, but independent
*across* streams. TPU formulation:

* up to 8 streams ride the sublane dimension of an (8, L) int32 array
  (packed 0x00RRGGBB), so the host→device transfer carries only real data;
* the grid walks length-blocks sequentially; run state (channel sums, count,
  pending emission) lives in VMEM scratch and carries across grid steps —
  the standard chunk+carry pattern;
* every loop step performs one dense write: the record of any run that
  ended at the *previous* position (a reject ends the run at i-1; a cap or
  stream-end at i-1 is carried as a pending record and written at i). The
  two cases are mutually exclusive, so each output column is written exactly
  once. One trailing block flushes the final runs.

Output: packed int32 per position, ``1<<24 | r<<16 | g<<8 | b`` where a run
ended at the previous position, else 0. Host compaction recovers the
(count, color) records; counts never exceed 255 because the cap emits
in-kernel.

Numerics: the acceptance test is evaluated in the count²-scaled form
``sum_c (s_c - cnt·x_c)² <= (allow·cnt)²`` whose terms are exact integers in
f32 (≤ 255·255), so decisions match the reference's f64 average-form at
exact-tie boundaries; divergence is possible only within ~1e-4·allow of the
boundary (the native C engine keeps the exact-f64 single-stream path and is
the conformance oracle). Measured on hardware: identical record streams at
allow=1 and allow=16; one record in ~2,700 differs at allow=4 — a case where
the kernel's exact rational comparison and the reference's rounded f64 one
legitimately disagree at the boundary.

Status: correct on hardware but gated behind CNIIC_PALLAS_RLE=1 — the
masked-column extraction costs ~128x redundant lane work per position, so
the kernel only wins over the native engine when ~128+ streams are packed;
the codec path defaults to the native engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 8          # streams per kernel call (sublane dimension)
BLOCK = 2048       # positions per grid step (last-dim tile, 128-multiple)
RUN_CAP = 255.0


def _kernel(allow_ref, len_ref, rgb_ref, out_ref, s0, s1, s2, cnt, pend, otile):
    gi = pl.program_id(0)

    @pl.when(gi == 0)
    def _():
        s0[...] = jnp.zeros_like(s0)
        s1[...] = jnp.zeros_like(s1)
        s2[...] = jnp.zeros_like(s2)
        cnt[...] = jnp.zeros_like(cnt)
        pend[...] = jnp.zeros_like(pend)

    allow = allow_ref[0]
    lengths = len_ref[...].astype(jnp.float32)  # (8, 1)
    base = (gi * BLOCK).astype(jnp.float32)

    # explicitly-typed constants: under jax_enable_x64 python literals trace
    # as 64-bit weak types whose conversions Mosaic cannot lower
    F0 = jnp.float32(0.0)
    F1 = jnp.float32(1.0)
    FH = jnp.float32(0.5)
    FCAP = jnp.float32(RUN_CAP)
    I0 = jnp.int32(0)
    IFLAG = jnp.int32(1 << 24)
    M8 = jnp.int32(0xFF)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (LANES, 128), 1)

    # Mosaic only allows lane-dim slices at 128-multiples, so the loop walks
    # (8, 128) tiles; columns are extracted with masked lane reductions and
    # the output tile accumulates in scratch before one aligned store.
    def tile_step(t, carry):
        toff = t * jnp.int32(128)
        tile = rgb_ref[:, pl.ds(pl.multiple_of(toff, 128), 128)]  # (8,128) i32

        def col_step(j, carry2):
            sel = lane_ids == j
            packed = jnp.sum(jnp.where(sel, tile, I0), axis=1, keepdims=True,
                             dtype=jnp.int32)  # (8,1)
            r = ((packed >> 16) & M8).astype(jnp.float32)
            g = ((packed >> 8) & M8).astype(jnp.float32)
            b = (packed & M8).astype(jnp.float32)
            pos = base + (toff + j).astype(jnp.float32)
            active = pos < lengths

            c = cnt[...]
            fresh = c == F0
            # count^2-scaled acceptance: exact-integer f32 terms
            t0 = s0[...] - c * r
            t1 = s1[...] - c * g
            t2 = s2[...] - c * b
            dist2 = t0 * t0 + t1 * t1 + t2 * t2
            ac = allow * c
            accept = jnp.logical_and(jnp.logical_not(fresh), dist2 <= ac * ac)
            reject = jnp.logical_and(jnp.logical_and(active, jnp.logical_not(fresh)),
                                     jnp.logical_not(accept))

            inv = F1 / jnp.maximum(c, F1)

            def pack_rgb(x0, x1, x2):
                return (
                    ((x0 + FH).astype(jnp.int32) << 16)
                    | ((x1 + FH).astype(jnp.int32) << 8)
                    | (x2 + FH).astype(jnp.int32)
                )

            reject_rec = IFLAG | pack_rgb(s0[...] * inv, s1[...] * inv, s2[...] * inv)
            rec = jnp.where(reject, reject_rec, pend[...])  # (8,1)
            otile[...] = jnp.where(sel, rec, otile[...])

            ns0 = jnp.where(accept, s0[...] + r, r)
            ns1 = jnp.where(accept, s1[...] + g, g)
            ns2 = jnp.where(accept, s2[...] + b, b)
            ncnt = jnp.where(accept, c + F1, F1)

            capped = ncnt >= FCAP
            last = jnp.logical_and(active, pos >= lengths - F1)
            close = jnp.logical_and(active, jnp.logical_or(capped, last))
            inv_n = F1 / jnp.maximum(ncnt, F1)
            close_rec = IFLAG | pack_rgb(ns0 * inv_n, ns1 * inv_n, ns2 * inv_n)
            pend[...] = jnp.where(close, close_rec, I0)

            keep = jnp.logical_and(active, jnp.logical_not(close))
            s0[...] = jnp.where(keep, ns0, F0)
            s1[...] = jnp.where(keep, ns1, F0)
            s2[...] = jnp.where(keep, ns2, F0)
            cnt[...] = jnp.where(keep, ncnt, F0)
            return carry2

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(128), col_step, jnp.int32(0))
        out_ref[:, pl.ds(pl.multiple_of(toff, 128), 128)] = otile[...]
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(BLOCK // 128), tile_step, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("n_blocks", "interpret"))
def _run(allow, lens, rgb, n_blocks: int, interpret: bool = False):
    return pl.pallas_call(
        _kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (i * 0,), memory_space=pltpu.SMEM),
            # index maps derive 0 from the (int32) grid index: literal 0
            # (including the default index map) traces as an i64 constant
            # under x64, which the Mosaic legalizer rejects
            pl.BlockSpec((LANES, 1), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, BLOCK), lambda i: (i * 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((LANES, BLOCK), lambda i: (i * 0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((LANES, n_blocks * BLOCK), jnp.int32),
        scratch_shapes=[pltpu.VMEM((LANES, 1), jnp.float32) for _ in range(4)]
        + [pltpu.VMEM((LANES, 1), jnp.int32), pltpu.VMEM((LANES, 128), jnp.int32)],
        interpret=interpret,
    )(allow, lens, rgb)


def approx_rle_batch(scans, lengths, allow: float, interpret: bool | None = None):
    """Encode a batch of streams, 8 lanes per kernel sweep.

    scans: (B, L, 3) uint8 (zero-padded); lengths: (B,). Returns a list of
    (counts uint8[R], colors uint8[R, 3]) per stream, identical to the
    reference recurrence up to f32-vs-f64 boundary rounding.
    """
    if interpret is None:
        # compiled on real hardware (the tunneled TPU platform is "axon");
        # interpreter only on the CPU test backend
        interpret = jax.default_backend() == "cpu"
    scans = np.ascontiguousarray(scans, dtype=np.uint8)
    B, L, _ = scans.shape
    n_blocks = (L + 1 + BLOCK - 1) // BLOCK
    lp = n_blocks * BLOCK
    out = []
    for start in range(0, B, LANES):
        chunk = scans[start : start + LANES].astype(np.int32)
        ln = np.asarray(lengths[start : start + LANES], dtype=np.int32)
        nb = chunk.shape[0]
        packed = np.zeros((LANES, lp), np.int32)
        packed[:nb, :L] = (chunk[..., 0] << 16) | (chunk[..., 1] << 8) | chunk[..., 2]
        lens = np.zeros((LANES, 1), np.int32)
        lens[:nb, 0] = ln
        allow_arr = np.asarray([allow], np.float32)

        recs = np.asarray(_run(jnp.asarray(allow_arr), jnp.asarray(lens),
                               jnp.asarray(packed), n_blocks, interpret=interpret))
        for j in range(nb):
            n_j = int(ln[j])
            col = recs[j, : n_j + 1]
            ends = np.flatnonzero(col >> 24)  # record at p => run ended at p-1
            counts = np.diff(np.concatenate([[0], ends])).astype(np.uint8)
            vals = col[ends]
            colors = np.stack([(vals >> 16) & 0xFF, (vals >> 8) & 0xFF, vals & 0xFF],
                              axis=1).astype(np.uint8)
            out.append((counts, colors))
    return out
