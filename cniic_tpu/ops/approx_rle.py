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


# --------------------------------------------------------------------------
# wide-lane variant: up to 1024 streams as (sublane, lane) = (8, 128) tiles
# --------------------------------------------------------------------------
#
# VERDICT r2 #2 / the r2 lane-economics analysis: the 8-lane kernel above
# spends ~128x redundant lane work extracting one column per step. This
# layout instead packs stream s at (s // 128, s % 128) of an (8, 128) tile
# and walks positions along the array's column blocks, so every VPU op in
# the loop serves 1024 streams at once — the intended consumer is the
# speculative ~1024-chunk split of ONE image's scan (approx_rle_chunked).
#
# Unlike the f32 8-lane kernel, the acceptance test here is EXACT integer
# arithmetic equal to the mathematical (rational) test, which the
# reference's f64 recurrence (hilbertc.rs:251-285) also decides correctly
# everywhere except exact boundary ties:
#
#   accept  <=>  sum_c (S_c - cnt*x_c)^2 <= (allow*cnt)^2
#
# All terms are int32-exact: S_c <= 255*255, cnt*x_c <= 255*255; |t_c| is
# clamped at 16384 before squaring (a clamped term alone already exceeds
# the max threshold 16.6M, so clamping never changes the decision) keeping
# the sum < 2^31. The reference's f64 evaluation has absolute error far
# below one integer unit in this scaled form, so its decision can differ
# from the exact test ONLY when dist2 == thresh exactly (the f64 sqrt then
# lands on either side of `allow`). Likewise the emitted rounded average:
# q + (2r > cnt) equals f64 round() except when 2r == cnt exactly. Both
# ambiguous cases set the stream's FLAG; a flagged stream must be re-run
# through the exact-f64 native engine (approx_rle_chunked does).
#
# Records carry bit 24 (run ended at previous position) and bit 25 (run
# closed by stream end, not by reject/cap — the marker the seam stitcher
# needs to drop speculative force-closes at chunk seams).

WIDE = 1024        # streams per call: one full (8, 128) tile
WBP = 256          # positions per grid step


def _wkernel(allow_ref, len_ref, rgb_ref, out_ref, flag_ref,
             s0, s1, s2, cnt, pend, flg, *, nb: int):
    gi = pl.program_id(0)

    @pl.when(gi == 0)
    def _():
        s0[...] = jnp.zeros_like(s0)
        s1[...] = jnp.zeros_like(s1)
        s2[...] = jnp.zeros_like(s2)
        cnt[...] = jnp.zeros_like(cnt)
        pend[...] = jnp.zeros_like(pend)
        flg[...] = jnp.zeros_like(flg)

    allow = allow_ref[0]                              # int32
    lengths = len_ref[...]                            # (8, 128) int32
    base = gi * jnp.int32(WBP)

    I0 = jnp.int32(0)
    I1 = jnp.int32(1)
    I2 = jnp.int32(2)
    ICAP = jnp.int32(int(RUN_CAP))
    ICL = jnp.int32(16384)
    IFLAG = jnp.int32(1 << 24)
    ILAST = jnp.int32(1 << 25)
    M8 = jnp.int32(0xFF)

    def pos_step(t, carry):
        toff = t * jnp.int32(128)
        packed = rgb_ref[:, pl.ds(pl.multiple_of(toff, 128), 128)]  # (8,128)
        r = (packed >> 16) & M8
        g = (packed >> 8) & M8
        b = packed & M8
        pos = base + t
        active = pos < lengths

        c = cnt[...]
        fresh = c == I0
        t0 = s0[...] - c * r
        t1 = s1[...] - c * g
        t2 = s2[...] - c * b
        t0 = jnp.minimum(jnp.abs(t0), ICL)
        t1 = jnp.minimum(jnp.abs(t1), ICL)
        t2 = jnp.minimum(jnp.abs(t2), ICL)
        dist2 = t0 * t0 + t1 * t1 + t2 * t2
        thresh = (allow * c) * (allow * c)
        accept = jnp.logical_and(jnp.logical_not(fresh), dist2 <= thresh)
        reject = jnp.logical_and(
            jnp.logical_and(active, jnp.logical_not(fresh)),
            jnp.logical_not(accept))

        def round_avg(s, n):
            # floor(S/n) via f32 (both <= 2^24, quotient gaps >= 1/255
            # dwarf f32 rounding), then round-half-away in integers (the
            # exact-half case S/n = k+1/2 is exactly representable in f64,
            # so the reference's round() deterministically rounds up too)
            nn = jnp.maximum(n, I1)
            q = jnp.floor(s.astype(jnp.float32) / nn.astype(jnp.float32)
                          ).astype(jnp.int32)
            r = s - q * n
            # S/n is f64-exact iff n/gcd(S, n) is a power of two (<= 128
            # for n <= 255), i.e. iff n divides 128*r; r*128 <= 2^15 and
            # the f32 quotient's ulp is far below the 1/255 gap
            r128 = r << jnp.int32(7)
            q128 = jnp.floor(r128.astype(jnp.float32)
                             / nn.astype(jnp.float32)).astype(jnp.int32)
            return (q + (I2 * r >= n).astype(jnp.int32),
                    r128 - q128 * n == I0)

        # reject: emit the PREVIOUS run (state before this pixel).
        # e0..e2 report f64-exact channel averages (the denominator after
        # reduction is a power of two): a boundary tie with ALL averages
        # exact is decided identically by the reference's all-exact f64
        # evaluation (accept on <=), so only ties with an inexact average
        # need the flag.
        q0, e0 = round_avg(s0[...], c)
        q1, e1 = round_avg(s1[...], c)
        q2, e2 = round_avg(s2[...], c)
        ambig = jnp.logical_and(
            jnp.logical_and(
                jnp.logical_and(active, jnp.logical_not(fresh)),
                dist2 == thresh),
            jnp.logical_not(jnp.logical_and(jnp.logical_and(e0, e1), e2)))
        reject_rec = IFLAG | (q0 << 16) | (q1 << 8) | q2
        rec = jnp.where(reject, reject_rec, pend[...])       # (8, 128)
        out_ref[:, pl.ds(pl.multiple_of(toff, 128), 128)] = rec

        ns0 = jnp.where(accept, s0[...] + r, r)
        ns1 = jnp.where(accept, s1[...] + g, g)
        ns2 = jnp.where(accept, s2[...] + b, b)
        ncnt = jnp.where(accept, c + I1, I1)

        capped = ncnt >= ICAP
        last = jnp.logical_and(active, pos >= lengths - I1)
        close = jnp.logical_and(active, jnp.logical_or(capped, last))
        p0, _ = round_avg(ns0, ncnt)
        p1, _ = round_avg(ns1, ncnt)
        p2, _ = round_avg(ns2, ncnt)
        close_rec = (IFLAG
                     | jnp.where(jnp.logical_and(last,
                                                 jnp.logical_not(capped)),
                                 ILAST, I0)
                     | (p0 << 16) | (p1 << 8) | p2)
        pend[...] = jnp.where(close, close_rec, I0)

        flg[...] = flg[...] | ambig.astype(jnp.int32)

        keep = jnp.logical_and(active, jnp.logical_not(close))
        s0[...] = jnp.where(keep, ns0, I0)
        s1[...] = jnp.where(keep, ns1, I0)
        s2[...] = jnp.where(keep, ns2, I0)
        cnt[...] = jnp.where(keep, ncnt, I0)
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(WBP), pos_step, jnp.int32(0))

    @pl.when(gi == nb - 1)
    def _():
        flag_ref[...] = flg[...]


@functools.partial(jax.jit, static_argnames=("n_blocks", "interpret"))
def _wrun(allow, lens, rgb, n_blocks: int, interpret: bool = False):
    kern = functools.partial(_wkernel, nb=n_blocks)
    return pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (i * 0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 128), lambda i: (i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, WBP * 128), lambda i: (i * 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, WBP * 128), lambda i: (i * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (i * 0, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, n_blocks * WBP * 128), jnp.int32),
            jax.ShapeDtypeStruct((8, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32) for _ in range(6)],
        interpret=interpret,
    )(allow, lens, rgb)


def approx_rle_wide(scans, lengths, allow: float,
                    interpret: bool | None = None):
    """Encode up to 1024 streams in one kernel sweep (wide layout).

    scans: (B, L, 3) uint8 (zero-padded); lengths: (B,). allow must be a
    nonnegative integer (the reference's sweep configs are 1..16; the
    exact-integer acceptance relies on it). Returns a list of
    (counts uint8[R], colors uint8[R, 3], last_forced bool, flagged bool)
    per stream: `last_forced` marks a final record closed by stream end
    (what a chunk stitcher drops at seams); `flagged` marks a stream that
    hit an exact boundary tie where the reference's f64 recurrence is not
    predicted by exact arithmetic — re-run those through the native engine.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    allow_i = int(allow)
    if allow_i != allow or allow_i < 0:
        raise ValueError("wide kernel needs an integer allowance")
    if allow_i > 64:
        # The in-kernel ICL=16384 clamp preserves accept/reject decisions
        # only while allow*count < 16384 (count <= 255 => allow <= 64, the
        # same bound the native C fast path enforces); beyond that a
        # clamped term can flip a decision and (allow*c)^2 overflows int32
        # from allow >= 183. Callers must use the exact-f64 native engine.
        raise ValueError("wide kernel supports integer allow <= 64 only "
                         "(ICL clamp bound; use native.approx_rle_encode)")
    scans = np.ascontiguousarray(scans, dtype=np.uint8)
    B, L, _ = scans.shape
    assert B <= WIDE, "wide kernel packs at most 1024 streams"
    n_blocks = (L + 1 + WBP - 1) // WBP
    lp = n_blocks * WBP
    packed = np.zeros((WIDE, lp), np.int32)
    ch = scans.astype(np.int32)
    packed[:B, :L] = (ch[..., 0] << 16) | (ch[..., 1] << 8) | ch[..., 2]
    lens = np.zeros(WIDE, np.int32)
    lens[:B] = np.asarray(lengths, np.int32)
    # stream s -> (sublane s // 128, lane s % 128), positions along columns
    rgb_t = np.ascontiguousarray(
        packed.reshape(8, 128, lp).transpose(0, 2, 1).reshape(8, lp * 128))
    lens_t = lens.reshape(8, 128)
    allow_arr = np.asarray([allow_i], np.int32)

    recs_t, flags_t = _wrun(jnp.asarray(allow_arr), jnp.asarray(lens_t),
                            jnp.asarray(rgb_t), n_blocks,
                            interpret=interpret)
    recs = np.asarray(recs_t).reshape(8, lp, 128).transpose(0, 2, 1).reshape(
        WIDE, lp)
    flags = np.asarray(flags_t).reshape(WIDE)
    out = []
    for j in range(B):
        n_j = int(lens[j])
        col = recs[j, : n_j + 1]
        ends = np.flatnonzero(col >> 24)
        counts = np.diff(np.concatenate([[0], ends])).astype(np.uint8)
        vals = col[ends]
        colors = np.stack([(vals >> 16) & 0xFF, (vals >> 8) & 0xFF,
                           vals & 0xFF], axis=1).astype(np.uint8)
        last_forced = bool(ends.size and (col[ends[-1]] >> 25) & 1)
        out.append((counts, colors, last_forced, bool(flags[j])))
    return out


# --------------------------------------------------------------------------
# chunked single-stream encode: speculative chunks + exact seam stitching
# --------------------------------------------------------------------------

def approx_rle_chunked(scan: np.ndarray, allow: float, chunk: int = 1024,
                       interpret: bool | None = None):
    """Byte-exact approx-RLE of ONE stream via ~1024 speculative chunks
    (VERDICT r2 #2). The wide kernel encodes every chunk as if it started a
    fresh run; the stitcher walks the truth: wherever the true parse has a
    run START at a position where an (unflagged) speculative chunk also
    starts a run, the chunk's remaining records ARE the truth (the
    recurrence is deterministic from identical state), so they are adopted
    wholesale; the gaps between sync points (runs crossing seams, flagged
    chunks, dropped force-closed records) are replayed through the exact-f64
    native engine in bounded windows. Output == native.approx_rle_encode.
    """
    from .. import native

    scan = np.ascontiguousarray(scan, dtype=np.uint8)
    n = scan.shape[0]
    if n == 0:
        return (np.zeros(0, np.uint8), np.zeros((0, 3), np.uint8))
    if not float(allow).is_integer() or not 0 <= allow <= 64:
        # outside the wide kernel's exact-decision envelope (see
        # approx_rle_wide): the native engine IS the byte-exact answer
        return native.approx_rle_encode(scan, allow)
    n_chunks = -(-n // chunk)
    if n_chunks > WIDE:
        chunk = -(-n // WIDE)
        n_chunks = -(-n // chunk)
    L = chunk
    scans = np.zeros((n_chunks, L, 3), np.uint8)
    lens = np.empty(n_chunks, np.int64)
    for j in range(n_chunks):
        part = scan[j * chunk : (j + 1) * chunk]
        scans[j, : part.shape[0]] = part
        lens[j] = part.shape[0]
    spec = approx_rle_wide(scans, lens, allow, interpret=interpret)

    # per-chunk absolute run-start positions (sync points) and record lists
    starts: list[np.ndarray] = []
    for j, (counts, colors, forced, flagged) in enumerate(spec):
        if flagged:
            starts.append(np.zeros(0, np.int64))
            continue
        ends = j * chunk + np.cumsum(counts.astype(np.int64))
        starts.append(np.concatenate([[j * chunk], ends[:-1]]))

    out_counts: list[np.ndarray] = []
    out_colors: list[np.ndarray] = []
    p = 0
    while p < n:
        j = p // chunk
        counts, colors, forced, flagged = spec[j]
        # the last chunk's stream end IS the true stream end: its
        # force-close is genuine, not speculative
        forced = forced and j < n_chunks - 1
        sync = starts[j]
        k = np.searchsorted(sync, p)
        if not flagged and k < sync.size and sync[k] == p:
            # adopt chunk j's records from this run start on, minus the
            # force-closed tail (its run truly continues across the seam)
            keep = counts[k:]
            keepc = colors[k:]
            if forced and keep.size:
                keep, keepc = keep[:-1], keepc[:-1]
            if keep.size:
                out_counts.append(keep)
                out_colors.append(keepc)
                p += int(keep.astype(np.int64).sum())
                if not forced:
                    continue  # landed exactly on the chunk seam, fresh
            # fall through to replay (forced tail or empty adoption)
        # replay a window with the exact engine until a sync point is hit
        W = chunk + 512
        while p < n:
            sub = scan[p : p + W]
            cc, ccol = native.approx_rle_encode(sub, allow)
            full = p + sub.shape[0] == n
            if not full and cc.size:
                cc, ccol = cc[:-1], ccol[:-1]  # window-forced close
            if not cc.size:
                W *= 2  # a single run longer than the window: widen
                continue
            ends = p + np.cumsum(cc.astype(np.int64))
            # earliest record end that is a sync point of its chunk
            hit = -1
            for i, q in enumerate(ends.tolist()):
                if q >= n:
                    hit = i
                    break
                sj = starts[q // chunk]
                kq = np.searchsorted(sj, q)
                if kq < sj.size and sj[kq] == q:
                    hit = i
                    break
            if hit >= 0:
                out_counts.append(cc[: hit + 1])
                out_colors.append(ccol[: hit + 1])
                p = int(ends[hit])
                break
            out_counts.append(cc)
            out_colors.append(ccol)
            p = int(ends[-1])
        # loop back to try chunk adoption at the new p

    counts = np.concatenate(out_counts) if out_counts else np.zeros(0, np.uint8)
    colors = (np.concatenate(out_colors) if out_colors
              else np.zeros((0, 3), np.uint8))
    return counts.astype(np.uint8), colors.astype(np.uint8)
