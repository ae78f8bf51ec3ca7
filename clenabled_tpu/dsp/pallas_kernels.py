"""Pallas TPU kernels for the hot streaming ops.

The XLA formulations in dsp/ are already vectorized, but the PFB
channelizer's W shifted multiply-adds re-read the packed stream W times from
HBM.  This kernel does the whole channelizer front-end in ONE pass:

  HBM → VMEM tile (once) → W in-VMEM shifted MACs (VPU)
      → one [TILE,128]×[128,128] matmul (MXU) = the per-group 16-point
        inverse DFT for every antenna × (re,im) lane group
      → VMEM → HBM tile (once)

Lane packing: the stream is laid out [nblk, G·M] with G = antennas ×
(re, im) groups of M=16 lanes (see channelizer._branch_sums_critical_batched).
The inverse DFT across each group's 16 lanes — including the re/im cross
terms — is expressed as a single 128×128 block matrix, so the MXU does the
entire FFT stage in one shot.

Falls back to the XLA path automatically for shapes it does not cover
(pipelines call `pfb_channelize_packed` only for the critical-sampled,
lane-packed case).
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


@lru_cache(maxsize=None)
def _idft_block_matrix(m: int, num_antennas: int) -> np.ndarray:
    """[G·M, G·M] real matrix computing the unscaled inverse DFT for every
    antenna's (re, im) lane pair.

    Input lane layout: group g = a for re, g = A + a for im (matching
    jnp.concatenate([re, im]) ordering in the packed pipeline); within a
    group, lane j = subfilter j.  Output layout identical.  For antenna a:
        z_re = acc_re @ Frᵀ − acc_im @ Fiᵀ
        z_im = acc_re @ Fiᵀ + acc_im @ Frᵀ
    with F[k, n] = exp(+2πi·k·n/m) (unscaled inverse kernel).
    """
    a = num_antennas
    g = 2 * a
    k = np.arange(m)
    ang = 2.0 * np.pi * np.outer(k, k) / m
    fr = np.cos(ang)
    fi = np.sin(ang)
    mat = np.zeros((g * m, g * m), np.float32)
    for ai in range(a):
        re_sl = slice(ai * m, ai * m + m)
        im_sl = slice((a + ai) * m, (a + ai) * m + m)
        # out[:, k] = Σ_n in[:, n]·F?[k, n]  →  right-multiply by F?ᵀ
        mat[re_sl, re_sl] = fr.T
        mat[im_sl, re_sl] = -fi.T
        mat[re_sl, im_sl] = fi.T
        mat[im_sl, im_sl] = fr.T
    return mat


def _fir_kernel(x_hbm, taps_ref, out_ref, scratch, sem, *, tile_rows, halo_rows,
                ntaps):
    """Direct FIR as in-VMEM shifted MACs.

    Layout: the padded stream is [rows, 128]; output row block i needs input
    rows [i·R − H, i·R + R) (H halo rows of history above).  A shift by k =
    q·128 + r samples decomposes into a lane roll by r and a row shift by q
    (plus one extra row when the roll wraps), so the kernel does ≤128 lane
    rolls and ntaps masked MACs — one HBM pass total, vs the XLA conv
    lowering that managed only ~10 Msps.
    """
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * tile_rows, tile_rows + halo_rows), :], scratch, sem)
    dma.start()
    dma.wait()
    h = halo_rows
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 1)
    acc = jnp.zeros((tile_rows, LANES), jnp.float32)
    for r in range(min(LANES, ntaps)):
        rolled = pltpu.roll(scratch[:, :], r, 1) if r else scratch[:, :]
        mask = lane >= r
        for q in range((ntaps - r + LANES - 1) // LANES):
            k = q * LANES + r
            if k >= ntaps:
                continue
            # x[n−k] for output rows: same-row part (lane ≥ r) comes from
            # row i−q; wrapped part (lane < r) from row i−q−1
            same = rolled[h - q : h - q + tile_rows, :]
            prev = rolled[h - q - 1 : h - q - 1 + tile_rows, :]
            acc = acc + taps_ref[0, k] * jnp.where(mask, same, prev)
    out_ref[:, :] = acc


def fir_direct(x, taps, tile_rows: int = 256, interpret: bool = False):
    """Direct-form FIR y[n] = Σ_k taps[k]·x[n+K−1−k] over a float32 stream
    with K−1 history samples at the front (same convention as
    dsp.fir_filter.fir_filter), via the single-pass Pallas kernel.

    x: [K-1 + n] float32 (n a multiple of 128·tile_rows after padding by the
    caller); returns [n] float32.
    """
    taps = jnp.asarray(taps, jnp.float32)
    ntaps = int(taps.shape[-1])
    n = x.shape[-1] - (ntaps - 1)
    if n % (LANES * tile_rows):
        raise ValueError(
            f"frame length {n} must be a multiple of {LANES * tile_rows}")
    rows = n // LANES
    # halo rows rounded to the f32 sublane multiple (8) keeps every VMEM
    # shape and slice aligned for Mosaic
    halo_rows = -(-(-(-(ntaps - 1) // LANES) + 1) // 8) * 8
    # row-align so output sample 0 sits at row halo_rows, lane 0:
    # prepend zeros so total = (halo_rows*128 - (ntaps-1)) + len(x)
    lead = halo_rows * LANES - (ntaps - 1)
    xp = jnp.concatenate([jnp.zeros((lead,), jnp.float32), x])
    xp = xp.reshape(rows + halo_rows, LANES)
    # y[n] = Σ_k taps[k]·x_in[n+K−1−k] = Σ_k taps[k]·z[n−k] with z the
    # history-aligned stream — the kernel's shift-k coefficient is taps[k]
    taps_k = taps[None, :]
    grid = rows // tile_rows
    return pl.pallas_call(
        partial(_fir_kernel, tile_rows=tile_rows, halo_rows=halo_rows,
                ntaps=ntaps),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalar tap reads
        ],
        out_specs=pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_rows + halo_rows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ntaps,
            bytes_accessed=4 * (x.size + n),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, taps_k).reshape(n)


def _atan2_poly(y, x):
    """atan2 via an odd minimax polynomial on [0, 1] (~1e-5 rad max
    error) — Mosaic has no atan2 primitive (round-4 probe: lowering
    raises Unimplemented).  Well inside the reference's own fast_atan2f
    LUT envelope (measured < 2.5e-3, tests/golden streaming_golden).
    atan2(0, 0) := 0; the −0.0 branch returns +π (irrelevant for
    product-of-samples inputs)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    z = lo / jnp.where(hi == 0.0, jnp.float32(1.0), hi)
    s = z * z
    r = ((((jnp.float32(-0.0117212) * s + jnp.float32(0.05265332)) * s
           - jnp.float32(0.11643287)) * s + jnp.float32(0.19354346)) * s
         - jnp.float32(0.33262347)) * s + jnp.float32(0.99997726)
    r = r * z
    r = jnp.where(ay > ax, jnp.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0.0, jnp.float32(np.pi) - r, r)
    return jnp.where(y < 0.0, -r, r)


def _fir_mxu_kernel(x_hbm, mq_ref, out_ref, scratch, sems, *, tile_rows,
                    nq):
    """Banded-matmul direct FIR (round 4): the flagship's branch-stage
    trick applied to the plain FIR — y tile = Σ_q feed[q:q+tile] @ M_q
    with M_q the banded shift-and-scale matrices (_fx_band_matrices at
    m=1).  Moves the ~2·ntaps MACs/sample from the VPU (fir_direct's
    roll/select chain, the measured floor at deep taps) onto the MXU;
    double-buffered tile DMA so tile i+1's read overlaps tile i's dots."""
    i = pl.program_id(0)
    num = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)

    def copy(j, s):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(j * tile_rows, tile_rows + nq), :],
            scratch.at[s], sems.at[s])

    @pl.when(i == 0)
    def _():
        copy(0, 0).start()

    multi = not isinstance(num, int) or num > 1
    if multi:
        @pl.when(i + 1 < num)
        def _():
            copy(i + 1, 1 - slot).start()

    @pl.when(i == 0)
    def _():
        copy(0, 0).wait()

    if multi:
        @pl.when(i > 0)
        def _():
            copy(i, slot).wait()

    for s in range(2):                    # static slot unroll (see fx v2)
        @pl.when(slot == s)
        def _(s=s):
            if nq <= 8:
                acc = jnp.dot(scratch[s, 0:tile_rows], mq_ref[0],
                              preferred_element_type=jnp.float32)
                for q in range(1, nq):
                    acc = acc + jnp.dot(scratch[s, q:q + tile_rows],
                                        mq_ref[q],
                                        preferred_element_type=jnp.float32)
            else:
                # deep taps: fori with dynamic f32 sublane starts (lowers
                # for f32 memrefs; the unrolled form crashes the remote
                # Mosaic build at deep nq — round-3/4 envelope)
                def body(q, a):
                    return a + jnp.dot(
                        scratch[s, pl.ds(q, tile_rows), :], mq_ref[q],
                        preferred_element_type=jnp.float32)

                acc = jax.lax.fori_loop(
                    0, nq, body,
                    jnp.zeros((tile_rows, LANES), jnp.float32))
            out_ref[:, :] = acc


def fir_direct_mxu(x, taps, tile_rows: int = 512, interpret: bool = False,
                   precision=None):
    """Direct-form FIR on the MXU: y[n] = Σ_k taps[k]·x[n+K−1−k] over a
    float32 stream with K−1 history samples at the front (fir_direct's
    contract) — but as nq = ⌈(K−1)/128⌉+1 banded [128,128] matmuls per
    tile instead of K VPU shifted MACs.  Measured (round 4, job 327):
    **17.8 GSPS @ 241 taps (vs ~5 VPU), 17.2 @ 1600 (vs 0.83 — 21-32×)**
    — tap-count-independent, DMA-bound.

    Precision: like every MXU path, the default runs f32 dots as one
    bf16-operand pass (~3e-3 rel vs the VPU kernel's exact-f32 MACs —
    measured 2.4e-3 on-chip); pass precision="float32" for exact
    multi-pass sums (see fx_correlate_streams_v2's audit).

    x: [K−1 + n] float32, n a multiple of 128·tile_rows (after the
    caller's padding); returns [n] float32.
    """
    taps = np.asarray(taps, np.float32)
    ntaps = int(taps.shape[-1])
    n = x.shape[-1] - (ntaps - 1)
    if n <= 0 or n % LANES:
        # mirror fir_direct's check — a misaligned stream would otherwise
        # die later in an opaque reshape (and n < LANES in a /0)
        raise ValueError(f"frame length {n} must be a positive multiple "
                         f"of {LANES}")
    rows = n // LANES
    tile = min(tile_rows, rows)
    while rows % tile:
        tile //= 2
    # band matrices at m=1: acc[r·128+λ] = Σ_c taps[c]·feed[r·128+λ+(K−1−c)]
    # — exactly the fir_direct definition with feed = x (no realignment)
    band = jnp.asarray(_fx_band_matrices(taps[:, None], 1))
    nq = band.shape[0]
    pad = (rows + nq) * LANES - x.shape[-1]
    xp = jnp.concatenate([x, jnp.zeros((pad,), jnp.float32)])
    xp = xp.reshape(rows + nq, LANES)
    if precision is not None:
        # binds at trace time, like fx_correlate_streams_v2's kwarg
        with jax.default_matmul_precision(precision):
            return _fir_mxu_call(xp, band, tile, nq, rows, n, x.size,
                                 interpret)
    return _fir_mxu_call(xp, band, tile, nq, rows, n, x.size, interpret)


def _fir_mxu_call(xp, band, tile, nq, rows, n, xsize, interpret):
    return pl.pallas_call(
        partial(_fir_mxu_kernel, tile_rows=tile, nq=nq),
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tile + nq, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * LANES * nq,
            bytes_accessed=4 * (xsize + n),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, band).reshape(n)


def _qdemod_kernel(last_ref, xr_ref, xi_ref, o_ref, carry, *, gain):
    """Fused quadrature demod: y[n] = gain·atan2(im, re) of
    x[n]·conj(x[n−1]).  The one-sample shift is a lane roll + row carry
    in VMEM (the XLA concat-based shift materializes full shifted copies
    — the elementwise table's only outlier, BENCH_TPU.md round 4); the
    single sample crossing each tile boundary rides an SMEM scalar
    (TPU grids run sequentially, so tile i always sees tile i−1's last
    sample).  Reference: lib/clQuadratureDemod_impl.cc:108-181."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[0] = last_ref[0]
        carry[1] = last_ref[1]

    xr = xr_ref[:, :]
    xi = xi_ref[:, :]
    rows = xr.shape[0]
    rr = pltpu.roll(xr, 1, 1)          # rr[r, λ] = xr[r, λ−1] (λ=0 wraps)
    ri = pltpu.roll(xi, 1, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    top_r = jnp.full((1, LANES), carry[0], jnp.float32)
    top_i = jnp.full((1, LANES), carry[1], jnp.float32)
    dn_r = jnp.concatenate([top_r, rr[:-1]], axis=0)   # row r−1's wrap
    dn_i = jnp.concatenate([top_i, ri[:-1]], axis=0)
    pr = jnp.where(lane >= 1, rr, dn_r)
    pi_ = jnp.where(lane >= 1, ri, dn_i)
    cr = xr * pr + xi * pi_
    ci = xi * pr - xr * pi_
    o_ref[:, :] = jnp.float32(gain) * _atan2_poly(ci, cr)
    carry[0] = xr[rows - 1, LANES - 1]
    carry[1] = xi[rows - 1, LANES - 1]


def qdemod_fused(xr, xi, last_r, last_i, gain: float,
                 tile_rows: int = 512, interpret: bool = False):
    """Fused FM discriminator over a planar stream: xr/xi [n] float32
    (n a multiple of 1024), last_r/last_i scalar carried samples (the
    previous frame's last sample; reference set_history(2)).  Returns
    y [n] float32 — equals demod.quadrature_demod_planar's XLA form to
    ~1e-5 rad·gain (in-kernel polynomial atan2, _atan2_poly — Mosaic has
    no atan2 primitive; still ~100x tighter than the reference's own
    fast_atan2f LUT; tests/test_siggen_demod.py)."""
    n = xr.shape[-1]
    if n % LANES:
        raise ValueError(f"frame length {n} must be a multiple of {LANES}")
    rows = n // LANES
    tile = min(tile_rows, rows)
    while rows % tile:
        tile //= 2
    if tile < 8:
        raise ValueError(f"frame length {n} needs rows divisible by a "
                         f"tile of >= 8 rows (n multiple of 1024)")
    last = jnp.stack([jnp.asarray(last_r, jnp.float32).reshape(()),
                      jnp.asarray(last_i, jnp.float32).reshape(())])
    y = pl.pallas_call(
        partial(_qdemod_kernel, gain=float(gain)),
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, LANES), lambda i: (i, 0)),
            pl.BlockSpec((tile, LANES), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tile, LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        scratch_shapes=[pltpu.SMEM((2,), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=8 * n, bytes_accessed=12 * n, transcendentals=n),
        interpret=interpret,
    )(last, xr.reshape(rows, LANES).astype(jnp.float32),
      xi.reshape(rows, LANES).astype(jnp.float32))
    return y.reshape(n)


def _fft_batched_consts(n: int, sign: int, v: int):
    """Constants for the fused batched FFT kernel: n = n2·128 decomposed
    with m1 = n mod 128 on the LANES and m2 = n // 128 on the sublanes —
    so stage 1 (DFT_n2 over rows) is a block-diagonal left matmul, the
    twiddle is an elementwise [n2, 128] tile, and stage 2 (DFT_128 over
    lanes) is a right matmul.  Output index k = n2·k1 + k2 means
    out_flat = transpose(z[n2, 128]).ravel() per vector — done in-VMEM.
    All in float64 on host, cast to f32."""
    n2 = n // LANES
    ang1 = sign * 2.0 * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2
    w2r, w2i = np.cos(ang1), np.sin(ang1)
    bd_r = np.zeros((v * n2, v * n2), np.float32)
    bd_i = np.zeros((v * n2, v * n2), np.float32)
    for b in range(v):
        bd_r[b * n2:(b + 1) * n2, b * n2:(b + 1) * n2] = w2r
        bd_i[b * n2:(b + 1) * n2, b * n2:(b + 1) * n2] = w2i
    angt = sign * 2.0 * np.pi * np.outer(np.arange(n2), np.arange(LANES)) / n
    tw_r = np.tile(np.cos(angt).astype(np.float32), (v, 1))
    tw_i = np.tile(np.sin(angt).astype(np.float32), (v, 1))
    ang2 = sign * 2.0 * np.pi * np.outer(np.arange(LANES),
                                         np.arange(LANES)) / LANES
    w1r = np.cos(ang2).astype(np.float32)
    w1i = np.sin(ang2).astype(np.float32)
    return (jnp.asarray(bd_r), jnp.asarray(bd_i), jnp.asarray(tw_r),
            jnp.asarray(tw_i), jnp.asarray(w1r), jnp.asarray(w1i))


def _fft_batched_kernel(bdr_ref, bdi_ref, twr_ref, twi_ref, w1r_ref,
                        w1i_ref, win_ref, xr_ref, xi_ref, or_ref, oi_ref,
                        ztr_scr, zti_scr, *, n2, v, windowed):
    """One tile = v vectors of n = n2·128 samples ([v·n2, 128] blocks).
    stage1 block-diag left matmul (DFT_n2 over rows) → twiddle → stage2
    right matmul (DFT_128 over lanes) → per-vector [n2,128]→[128,n2]
    transpose + flat view (output order k = n2·k1 + k2)."""
    xr = xr_ref[:, :]
    xi = xi_ref[:, :]
    if windowed:
        xr = xr * win_ref[:, :]
        xi = xi * win_ref[:, :]
    bdr = bdr_ref[:, :]
    bdi = bdi_ref[:, :]
    yr = (jnp.dot(bdr, xr, preferred_element_type=jnp.float32)
          - jnp.dot(bdi, xi, preferred_element_type=jnp.float32))
    yi = (jnp.dot(bdi, xr, preferred_element_type=jnp.float32)
          + jnp.dot(bdr, xi, preferred_element_type=jnp.float32))
    twr = twr_ref[:, :]
    twi = twi_ref[:, :]
    tr_ = yr * twr - yi * twi
    ti_ = yr * twi + yi * twr
    w1r = w1r_ref[:, :]
    w1i = w1i_ref[:, :]
    # stage 2 with the output transpose FOLDED INTO the matmul: contract
    # the feed's LANE dim against W128's m1 dim, so the result arrives as
    # zt[k1, tile-row] = z[k2, k1] already transposed (Mosaic cannot
    # lower the [v,128,n2]→[v·n2,128] shape cast, and dot_general with
    # arbitrary contracting dims runs at full MXU width — the rhs keeps
    # v·n2 result columns)
    dg = lambda a, b: jax.lax.dot_general(
        a, b, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ztr = dg(w1r, tr_) - dg(w1i, ti_)      # [128 (k1), v·n2]
    zti = dg(w1i, tr_) + dg(w1r, ti_)
    # final flat order k = n2·k1 + k2: out[b·n2 + r, n2·t + c] =
    # zt[tc·r + t, b·n2 + c] — stage zt through VMEM (strided loads are
    # a Mosaic primitive, strided slices on VALUES are not; the strided
    # load's base memref must be 128-lane minor, hence the segmented
    # [segs, 128, 128] scratch) then sublane-strided REF reads +
    # contiguous n2-lane block stores
    tile = v * n2
    for seg in range(ztr_scr.shape[0]):
        wdt = min(LANES, tile - seg * LANES)
        ztr_scr[seg, :, :wdt] = ztr[:, seg * LANES:seg * LANES + wdt]
        zti_scr[seg, :, :wdt] = zti[:, seg * LANES:seg * LANES + wdt]
    tc = LANES // n2
    per_seg = max(1, LANES // n2)          # vectors per 128-lane segment
    for seg in range(ztr_scr.shape[0]):
        for t in range(tc):
            # ONE full-lane strided load per (seg, t) (the primitive
            # requires lane offset 0), then contiguous value slices
            fr = ztr_scr[seg, t::tc, :]    # [n2, 128]
            fi = zti_scr[seg, t::tc, :]
            for j in range(per_seg):
                b = seg * per_seg + j
                if b >= v:
                    break
                lo = j * n2
                or_ref[b * n2:(b + 1) * n2, n2 * t:n2 * (t + 1)] = \
                    fr[:, lo:lo + n2]
                oi_ref[b * n2:(b + 1) * n2, n2 * t:n2 * (t + 1)] = \
                    fi[:, lo:lo + n2]


def fft_batched_fused(xr, xi, fft_size: int, inverse: bool = False,
                      window=None, interpret: bool = False):
    """Fused batched FFT over a planar stream chopped into fft_size
    vectors: ONE Pallas pass (optional window → two-stage DFT on the MXU
    → in-VMEM output reorder), so each sample crosses HBM exactly once
    in and once out — the XLA two-stage path round-trips its inter-stage
    intermediates (round-4 probe: 14.0 GSPS standalone vs a ~24.7 GSPS
    two-stage-traffic roofline; this kernel's io roofline is ~49).
    Unscaled in both directions (the framework's clFFT convention).

    xr/xi: [n] float32, n a multiple of fft_size; fft_size = n2·128 with
    n2 a power of two in [2, 128].  Returns (yr, yi) [n] float32.
    """
    n = xr.shape[-1]
    if fft_size % LANES:
        raise ValueError(f"fft_size must be a multiple of {LANES}")
    n2 = fft_size // LANES
    if n2 < 2 or n2 > 128 or (n2 & (n2 - 1)):
        raise ValueError("fft_size/128 must be a power of two in [2, 128]")
    if n % fft_size:
        raise ValueError("stream length must be a multiple of fft_size")
    nvec = n // fft_size
    v = max(1, min(nvec, 256 // n2))      # ≤256 rows per block-diag dot
    while nvec % v:
        v //= 2
    sign = 1 if inverse else -1
    consts = _fft_batched_consts(fft_size, sign, v)
    if window is not None:
        win = jnp.tile(jnp.asarray(window, jnp.float32).reshape(n2, LANES),
                       (v, 1))
        windowed = True
    else:
        win = jnp.zeros((v * n2, LANES), jnp.float32)
        windowed = False
    rows = n // LANES
    tile = v * n2
    yr, yi = pl.pallas_call(
        partial(_fft_batched_kernel, n2=n2, v=v, windowed=windowed),
        grid=(rows // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7
        + [pl.BlockSpec((tile, LANES), lambda i: (i, 0)),
           pl.BlockSpec((tile, LANES), lambda i: (i, 0))],
        out_specs=(pl.BlockSpec((tile, LANES), lambda i: (i, 0)),
                   pl.BlockSpec((tile, LANES), lambda i: (i, 0))),
        out_shape=(jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((rows, LANES), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((-(-tile // LANES), LANES, LANES), jnp.float32),
            pltpu.VMEM((-(-tile // LANES), LANES, LANES), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * n * (n2 + LANES),
            bytes_accessed=16 * n,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*consts, win, xr.reshape(rows, LANES), xi.reshape(rows, LANES))
    return yr.reshape(n), yi.reshape(n)


def _fx_band_matrices(taps_rm, m: int):
    """Banded shift matrices M_q folding the ENTIRE polyphase branch stage
    into MXU matmuls: acc[r, λ] = Σ_c hr[c, λ]·flat[r·128 + λ + (w−1−c)·m]
    = Σ_q (feed[r+q, :] @ M_q)[λ], with M_q[j, λ] = hr[c, λ] whenever
    λ + (w−1−c)·m = q·128 + j.  Density is 1/m·(w/nq) — low, but the MXU
    has ~40× the VPU's FLOPs, and this removes every roll/select/MAC from
    the VPU path (measured: the roll+merge stage, not the MACs, is the
    VPU floor of the fused kernel)."""
    t_np = np.asarray(taps_rm, np.float32)            # [w, m]
    w = t_np.shape[0]
    hr = np.tile(t_np[:, ::-1], (1, LANES // m))      # [w, 128]
    nq = ((w - 1) * m + LANES - 1) // LANES + 1
    mq = np.zeros((nq, LANES, LANES), np.float32)
    for c in range(w):
        d = (w - 1 - c) * m
        for lam in range(LANES):
            j_full = lam + d
            mq[j_full // LANES, j_full % LANES, lam] += hr[c, lam]
    return mq


def _fx_constants(taps_rm, m: int):
    """Tap lane pattern + stage-1/2 block DFT matrices for the fused
    flagship kernels (all jnp constants baked into the jitted program).

    hr[c, λ] = taps[c·m + (m−1−λ%m)], identical per m-lane block; the
    stage-1 block DFT has the input reversal folded in
    (B[jr, k] = F[m−1−jr, k]); stage 2 is the unreversed inverse DFT.

    The complex matmul z = (aR + j·aI)·(Fr + j·Fi) is emitted in the
    3-multiplication (Karatsuba) form — p1 = (aR+aI)·Fr, p2 = aI·(Fr+Fi),
    p3 = aR·(Fi−Fr), zr = p1−p2, zi = p1+p3 — so each stage returns
    (Fr, Fr+Fi, Fi−Fr) rather than (Fr, Fi): 25%% less MXU work."""
    t_np = np.asarray(taps_rm, np.float32)           # [w, m]
    hr_np = np.tile(t_np[:, ::-1], (1, LANES // m))  # [w, 128]
    ang = 2.0 * np.pi * np.outer(np.arange(m), np.arange(m)) / m
    f1r = np.cos(ang).astype(np.float32)
    f1i = np.sin(ang).astype(np.float32)

    def blockdiag(b):
        out = np.zeros((LANES, LANES), np.float32)
        for bi in range(LANES // m):
            out[bi * m : (bi + 1) * m, bi * m : (bi + 1) * m] = b
        return out

    def karat(fr, fi):
        return (jnp.asarray(blockdiag(fr)), jnp.asarray(blockdiag(fr + fi)),
                jnp.asarray(blockdiag(fi - fr)))

    return ((jnp.asarray(hr_np),) + karat(f1r[::-1, :], f1i[::-1, :])
            + karat(f1r, f1i))


def _fx_tile_math(i, num, read_group, hr_ref, m1_ref, m2_ref, m3_ref,
                  n1_ref, n2_ref, n3_ref, fd_out, xe_out, fd_acc, xe_acc, *,
                  tile_rows, w, a, m, fd_pairs, xe_pairs, karatsuba=False,
                  mxu_dtype=jnp.float32, mq_ref=None, read_group_dyn=None,
                  wide_ref=None, win_ref=None):
    """Shared per-tile math of the fused flagship kernels.

    read_group(gi) must return the [tile_rows + halo, 128] VMEM feed block
    for component group gi (antenna gi re for gi<a, antenna gi−a im else).
    A branch shift of c rows in sample space is m·(w−1−c) samples = a lane
    roll (multiple of m) + row carry, so the polyphase MACs run as ≤128/m
    lane rolls + w masked MACs per group.  Row r then holds 128/m
    interleaved output groups (m reversed channels each); three
    [·,128]×[128,128] Karatsuba matmuls per antenna apply the inverse DFT
    (reversal folded in; m1/m2/m3 = Fr, Fr+Fi, Fi−Fr and n1/n2/n3 the
    stage-2 equivalents), and the FD/X-Engine reductions fold the lane
    blocks with strided adds outside the kernel.  i/num are the grid
    position/size (passed in: pl.program_id may not be called inside a
    pl.when branch under the CPU interpreter)."""
    g = 2 * a

    def branch_sums(gi):
        """acc[r, λ] = Σ_c taps[c·m + (m−1−λ%m)] · feed[r·128 + λ + (w−1−c)·m]

        The lane-wrap row-carry select is hoisted out of the tap loop: per
        roll amount s, ONE merged array combines the same-row and next-row
        views, then each tap contributes a plain mul-add."""
        sc = read_group(gi)
        if sc.dtype != jnp.float32:
            sc = sc.astype(jnp.float32)
        rows = sc.shape[0]
        lane_full = jax.lax.broadcasted_iota(jnp.int32, (rows - 1, LANES), 1)
        acc = jnp.zeros((tile_rows, LANES), jnp.float32)
        for s in range(0, LANES, m):          # the distinct roll amounts
            rolled = pltpu.roll(sc, LANES - s, 1) if s else sc
            if s:
                merged = jnp.where(lane_full < LANES - s,
                                   rolled[:-1, :], rolled[1:, :])
            else:
                merged = rolled[:-1, :]
            cs = [c for c in range(w) if ((w - 1 - c) * m) % LANES == s]
            for c in cs:
                q = ((w - 1 - c) * m) // LANES
                acc = acc + hr_ref[c, :] * merged[q : q + tile_rows, :]
        return acc

    md = jnp.dtype(mxu_dtype)
    narrow = md != jnp.dtype(jnp.float32)

    def to_md(x):
        return x.astype(md) if narrow else x

    if mq_ref is not None and mq_ref.ndim == 2:
        # round-5 DEEP strategy: im2col window build + ONE deep MXU dot.
        # mq_ref is the band matrices pre-flattened [nq·128, 128] (in the
        # operand dtype); the kernel copies the nq row-shifted views of
        # the feed into a [tile, nq·128] VMEM window with STATIC slices —
        # static sublane starts lower for every ingest dtype, so the
        # narrow paths need neither the f32 widening pass nor the fori's
        # dynamic loads — then contracts the whole branch stage in one
        # [tile, nq·128] @ [nq·128, 128] matmul (same FLOPs as the nq
        # separate dots, one accumulation chain on the MXU).
        nq = mq_ref.shape[0] // LANES

        def branch_sums_mm(gi):
            sc = read_group(gi)
            for q in range(nq):
                blk = sc[q : q + tile_rows, :]
                if blk.dtype != md:
                    blk = blk.astype(md)
                win_ref[:, q * LANES : (q + 1) * LANES] = blk
            return jnp.dot(win_ref[:, :], mq_ref[:, :],
                           preferred_element_type=jnp.float32)

        accs = [branch_sums_mm(gi) for gi in range(g)]
    elif mq_ref is not None:
        # polyphase branch stage on the MXU: acc = Σ_q feed[q:q+T] @ M_q
        # (banded shift-and-scale matrices, see _fx_band_matrices) — one
        # operand cast per group replaces the roll/select/MAC VPU chain
        nq = mq_ref.shape[0]
        if nq <= 8 or read_group_dyn is None:
            mats = [to_md(mq_ref[q]) for q in range(nq)]

            def branch_sums_mm(gi):
                sc = read_group(gi)
                scm = sc if sc.dtype == md else sc.astype(md)
                acc = jnp.dot(scm[0:tile_rows], mats[0],
                              preferred_element_type=jnp.float32)
                for q in range(1, nq):
                    acc = acc + jnp.dot(scm[q : q + tile_rows], mats[q],
                                        preferred_element_type=jnp.float32)
                return acc
        else:
            # deep prototypes (nq > 8): fori over the banded groups with
            # dynamic ref loads — the fully-unrolled form crashes the axon
            # backend's remote Mosaic build at nq ≥ ~11, exactly as in the
            # OS-PFB kernel (round-3 envelope); this form compiles and
            # runs at every depth probed there.  NARROW (i8/bf16) feeds
            # first widen into an f32 VMEM scratch (wide_ref): Mosaic
            # rejects dynamic sublane starts on narrow memrefs ("cannot
            # statically prove index is a multiple of 8" — round-4 probe,
            # job 314) but accepts them on f32; the widen is one VPU pass
            # per group and the HBM DMA stays narrow.
            def branch_sums_mm(gi):
                if wide_ref is not None:
                    wide_ref[:, :] = read_group(gi).astype(jnp.float32)

                def body(q, acc):
                    if wide_ref is not None:
                        sl = wide_ref[pl.ds(q, tile_rows), :]
                    else:
                        sl = read_group_dyn(gi, q)
                    if sl.dtype != md:
                        sl = sl.astype(md)
                    mat = mq_ref[q]
                    if mat.dtype != md:
                        mat = mat.astype(md)
                    return acc + jnp.dot(sl, mat,
                                         preferred_element_type=jnp.float32)

                return jax.lax.fori_loop(
                    0, nq, body,
                    jnp.zeros((tile_rows, LANES), jnp.float32))

        accs = [branch_sums_mm(gi) for gi in range(g)]
    else:
        accs = [branch_sums(gi) for gi in range(g)]
    if not karatsuba:
        # reconstruct Fi = ((Fr+Fi) − Fr) once per tile — the 4-mult form
        # pipelines better on the MXU than Karatsuba here (measured).  The
        # subtraction runs in f32 (exact) BEFORE any narrowing cast.
        fi1 = to_md(m2_ref[:, :] - m1_ref[:, :])
        fi2 = to_md(n2_ref[:, :] - n1_ref[:, :])
        m1t = to_md(m1_ref[:, :])
        n1t = to_md(n1_ref[:, :])
    # mxu_dtype=bfloat16 halves/quarters MXU passes (bf16×bf16→f32 is a
    # single systolic pass); operands are cast AFTER the f32 branch MACs,
    # accumulation stays f32.  Exactness matches ≤8-bit quantized ingest
    # (the reference's IChar mode runs -cl-fast-relaxed-math anyway,
    # lib/clXEngine_impl.cc:816).
    accs_m = [to_md(x) for x in accs]
    zs = []
    for ai in range(a):
        if karatsuba:
            p1 = jnp.dot(to_md(accs[ai] + accs[a + ai]), to_md(m1_ref[:, :]),
                         preferred_element_type=jnp.float32)
            p2 = jnp.dot(accs_m[a + ai], to_md(m2_ref[:, :]),
                         preferred_element_type=jnp.float32)
            p3 = jnp.dot(accs_m[ai], to_md(m3_ref[:, :]),
                         preferred_element_type=jnp.float32)
            zs.append((p1 - p2, p1 + p3))
        else:
            zr = (jnp.dot(accs_m[ai], m1t,
                          preferred_element_type=jnp.float32)
                  - jnp.dot(accs_m[a + ai], fi1,
                            preferred_element_type=jnp.float32))
            zi = (jnp.dot(accs_m[ai], fi1,
                          preferred_element_type=jnp.float32)
                  + jnp.dot(accs_m[a + ai], m1t,
                            preferred_element_type=jnp.float32))
            zs.append((zr, zi))

    @pl.when(i == 0)
    def _():
        fd_acc[:, :] = jnp.zeros_like(fd_acc)
        xe_acc[:, :] = jnp.zeros_like(xe_acc)

    for fidx, (pref, psig) in enumerate(fd_pairs):
        re0, im0 = zs[pref]
        rp, ip = zs[psig]
        pr = re0 * rp + im0 * ip
        pi = im0 * rp - re0 * ip
        prm, pim = to_md(pr), to_md(pi)
        # second-stage (lag) inverse DFT uses the UNREVERSED block matrix —
        # spectra are already in normal channel order
        if karatsuba:
            q1 = jnp.dot(to_md(pr + pi), to_md(n1_ref[:, :]),
                         preferred_element_type=jnp.float32)
            q2 = jnp.dot(pim, to_md(n2_ref[:, :]),
                         preferred_element_type=jnp.float32)
            q3 = jnp.dot(prm, to_md(n3_ref[:, :]),
                         preferred_element_type=jnp.float32)
            zfr = q1 - q2
            zfi = q1 + q3
        else:
            zfr = (jnp.dot(prm, n1t,
                           preferred_element_type=jnp.float32)
                   - jnp.dot(pim, fi2, preferred_element_type=jnp.float32))
            zfi = (jnp.dot(prm, fi2, preferred_element_type=jnp.float32)
                   + jnp.dot(pim, n1t,
                             preferred_element_type=jnp.float32))
        mag = jnp.sum(jnp.sqrt(zfr * zfr + zfi * zfi), axis=0)  # [128]
        fd_acc[fidx, :] = fd_acc[fidx, :] + mag

    for k, (s1, s2) in enumerate(xe_pairs):
        r1, i1 = zs[s1]
        r2, i2 = zs[s2]
        gr = jnp.sum(r1 * r2 + i1 * i2, axis=0)
        gi2 = jnp.sum(i1 * r2 - r1 * i2, axis=0)
        xe_acc[2 * k, :] = xe_acc[2 * k, :] + gr
        xe_acc[2 * k + 1, :] = xe_acc[2 * k + 1, :] + gi2

    @pl.when(i == num - 1)
    def _():
        fd_out[:, :] = fd_acc[:, :]
        xe_out[:, :] = xe_acc[:, :]


def _fx_stream_kernel(x_hbm, hr_ref, m1_ref, m2_ref, m3_ref, n1_ref,
                      n2_ref, n3_ref, fd_out, xe_out, scratch, fd_acc,
                      xe_acc, sems, *, tile_rows, halo, w, a, m, fd_pairs,
                      xe_pairs):
    """Transpose-free fused flagship kernel (flat layout, serial DMA).

    Each component group g (antenna × re/im) is a FLAT [rows, 128] stream
    view — no host packing at all.  Everything HBM-side is 128-lane
    aligned."""
    i = pl.program_id(0)
    g = 2 * a
    dmas = []
    for gi in range(g):
        d = pltpu.make_async_copy(
            x_hbm.at[gi, pl.ds(i * tile_rows, tile_rows + halo), :],
            scratch.at[gi], sems.at[gi])
        d.start()
        dmas.append(d)
    for d in dmas:
        d.wait()

    _fx_tile_math(i, pl.num_programs(0), lambda gi: scratch[gi], hr_ref,
                  m1_ref, m2_ref, m3_ref, n1_ref, n2_ref, n3_ref, fd_out,
                  xe_out, fd_acc, xe_acc, tile_rows=tile_rows, w=w, a=a,
                  m=m, fd_pairs=fd_pairs, xe_pairs=xe_pairs)


def fx_correlate_streams(comps, hist, taps_rm, num_antennas: int, m: int,
                         tile_rows: int = 64, interpret: bool = False,
                         fd_pairs=None, xe_pairs=None):
    """Transpose-free fused flagship step (flat-layout kernel).

    Args:
      comps: [G, n] float32 — this frame's samples, G = 2·A groups
        (stream re parts then im parts; a "stream" is an antenna, or an
        antenna×pol pseudo-station for npol=2).  n must be a multiple of
        128·tile_rows.
      hist: [G, W·m − 1] float32 — carried stream history (taps must be
        branch-padded so ntaps == W·m, which _pfb_constants guarantees when
        the prototype is zero-padded to a multiple of m).
      taps_rm: [W, m] float32 — branch-major prototype taps.
      fd_pairs: (ref, sig) stream pairs for the lag-domain correlator
        (default: every stream vs stream 0).
      xe_pairs: (s1, s2) stream pairs for the Gram integration (default:
        xGPU triangular order over the streams; pass explicit pairs for
        dual-pol XX/XY/YX/YY products incl. auto-correlation cross-pol).

    Returns (fd_sum [len(fd_pairs), m] lag-domain magnitude sums — divide
    by n/m for the mean, fftshift outside — and gram [len(xe_pairs), 2m]
    re|im).  The only HBM-side data movement is one history+frame concat
    per group.
    """
    from clenabled_tpu.dsp import xengine as dsp_xengine

    a = num_antennas
    g = 2 * a
    w = taps_rm.shape[0]
    n = comps.shape[-1]
    if comps.shape[0] != g:
        raise ValueError(f"expected {g} component streams")
    if hist.shape != (g, w * m - 1):
        raise ValueError(f"hist shape {hist.shape} != {(g, w * m - 1)}")
    if n % (LANES * tile_rows):
        raise ValueError(
            f"frame length {n} must be a multiple of {LANES * tile_rows}")
    out_rows = n // LANES
    halo = 8
    feed_rows = out_rows + halo
    pad = feed_rows * LANES - (w * m - 1) - n
    feed = jnp.concatenate(
        [hist, comps, jnp.zeros((g, pad), jnp.float32)], axis=-1)
    feed = feed.reshape(g, feed_rows, LANES)

    consts = _fx_constants(taps_rm, m)
    if xe_pairs is None:
        xe_pairs = tuple(map(tuple, dsp_xengine.baseline_stations(a)))
    else:
        xe_pairs = tuple(map(tuple, xe_pairs))
    if fd_pairs is None:
        fd_pairs = tuple((0, p) for p in range(1, a))
    else:
        fd_pairs = tuple(map(tuple, fd_pairs))
    nb = len(xe_pairs)
    nfd = len(fd_pairs)
    fd_rows = max(8, nfd)
    xe_rows = max(8, 2 * nb)
    fd, xe = pl.pallas_call(
        partial(_fx_stream_kernel, tile_rows=tile_rows, halo=halo, w=w,
                a=a, m=m, fd_pairs=fd_pairs, xe_pairs=xe_pairs),
        grid=(out_rows // tile_rows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=(
            pl.BlockSpec((fd_rows, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((xe_rows, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((fd_rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((xe_rows, LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((g, tile_rows + halo, LANES), jnp.float32),
            pltpu.VMEM((fd_rows, LANES), jnp.float32),
            pltpu.VMEM((xe_rows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((g,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * g * (w + 2 * m),
            bytes_accessed=4 * feed.size,
            transcendentals=n * (a - 1),
        ),
        interpret=interpret,
    )(feed, *consts)
    # fold the 8 interleaved lane blocks (different output groups)
    fd_sum = fd[:nfd].reshape(nfd, LANES // m, m).sum(axis=1)
    xef = xe[: 2 * nb].reshape(nb, 2, LANES // m, m).sum(axis=2)
    gram = jnp.concatenate([xef[:, 0, :], xef[:, 1, :]], axis=-1)
    return fd_sum, gram


def _fx_stream_kernel_v2(xr_hbm, xi_hbm, tr_ref, ti_ref, hr_ref, m1_ref,
                         m2_ref, m3_ref, n1_ref, n2_ref, n3_ref, mq_ref,
                         fd_out, xe_out, scratch, fd_acc, xe_acc, sems,
                         *rest_scratch, tile_rows, halo, w, a, m, fd_pairs,
                         xe_pairs, karatsuba=False, mxu_dtype=jnp.float32,
                         branch_mxu=False):
    """Concat-free fused flagship kernel: reads the frame's re/im component
    arrays straight from HBM (no host-side packing or history concat) and
    double-buffers the tile DMAs so tile i+1's HBM reads overlap tile i's
    compute.  The carried history is a row-aligned halo·128-sample tail
    (previous frame's last rows), loaded once into VMEM via tr/ti.
    xr/xi may be float32, bfloat16, or int8 (the reference's IChar mode,
    lib/clXEngine_impl.cc:831-858): the DMA moves the narrow dtype and the
    VPU widens to f32 after the copy, halving/quartering HBM traffic."""
    i = pl.program_id(0)
    num = pl.num_programs(0)
    g = 2 * a
    slot = jax.lax.rem(i, 2)

    def tile_copy(gi, j, s, first: bool):
        """DMA descriptor for group gi of tile j into scratch slot s.
        Tile 0's feed is tail rows (VMEM, copied separately) + frame rows
        [0, tile); later tiles read frame rows [j·tile − halo, j·tile +
        tile)."""
        src = xr_hbm if gi < a else xi_hbm
        row = gi if gi < a else gi - a
        if first:
            return pltpu.make_async_copy(
                src.at[row, pl.ds(0, tile_rows), :],
                scratch.at[s, gi, pl.ds(halo, tile_rows), :],
                sems.at[s, gi])
        # halo divides tile_rows, so the start is halo-aligned — the hint
        # lets Mosaic prove sublane-tile divisibility for bf16/int8 sources
        start = pl.multiple_of(j * tile_rows - halo, halo)
        return pltpu.make_async_copy(
            src.at[row, pl.ds(start, tile_rows + halo), :],
            scratch.at[s, gi], sems.at[s, gi])

    @pl.when(i == 0)
    def _():
        for gi in range(g):
            tile_copy(gi, 0, 0, first=True).start()
        for gi in range(g):
            tref = tr_ref if gi < a else ti_ref
            row = gi if gi < a else gi - a
            scratch[0, gi, 0:halo, :] = tref[row, :, :]

    # a statically single-tile grid must not even TRACE the steady-state
    # branches: their (tile_rows + halo)-row slices exceed the frame
    multi = not isinstance(num, int) or num > 1

    if multi:
        @pl.when(i + 1 < num)
        def _():
            for gi in range(g):
                tile_copy(gi, i + 1, 1 - slot, first=False).start()

    # batch waits up front (per-group waits interleaved with the MACs
    # measured ~0.2 ms SLOWER — they fence Mosaic's load scheduling)
    @pl.when(i == 0)
    def _():
        for gi in range(g):
            tile_copy(gi, 0, 0, first=True).wait()

    if multi:
        @pl.when(i > 0)
        def _():
            for gi in range(g):
                tile_copy(gi, i, slot, first=False).wait()

    # the math is unrolled per slot: dynamic scratch[slot] indexing defeats
    # Mosaic's vector-load lowering (measured ~1.6× slower); two static
    # branches keep every VMEM access at a compile-time base address
    def make_read(s):
        return lambda gi: scratch[s, gi]

    def make_read_dyn(s):
        return lambda gi, q: scratch[s, gi, pl.ds(q, tile_rows), :]

    # the deep-prototype extra scratch is the im2col window when the band
    # consts arrive pre-flattened (round-5 window strategy), else the f32
    # widening buffer of the legacy fori path
    extra = rest_scratch[0] if rest_scratch else None
    is_window = branch_mxu and mq_ref.ndim == 2
    win_ref = extra if is_window else None
    wide_ref = None if is_window else extra
    for s in range(2):
        @pl.when(slot == s)
        def _(s=s):
            _fx_tile_math(i, num, make_read(s), hr_ref, m1_ref, m2_ref,
                          m3_ref, n1_ref, n2_ref, n3_ref, fd_out, xe_out,
                          fd_acc, xe_acc, tile_rows=tile_rows, w=w, a=a,
                          m=m, fd_pairs=fd_pairs, xe_pairs=xe_pairs,
                          karatsuba=karatsuba, mxu_dtype=mxu_dtype,
                          mq_ref=mq_ref if branch_mxu else None,
                          read_group_dyn=make_read_dyn(s),
                          wide_ref=wide_ref, win_ref=win_ref)


FX_TAIL_LEN = 8 * LANES  # carried-history samples per stream (float32)

_HALO_ROWS = {"float32": 8, "bfloat16": 16, "int8": 32}


def fx_tail_len(dtype, m: int | None = None, ntaps: int | None = None) -> int:
    """Carried-tail samples per stream for fx_correlate_streams_v2 with the
    given input dtype.  The halo row count is at least the dtype's VMEM
    sublane tile (f32 8, bf16 16, i8 32) so every DMA slice stays
    tile-aligned, and — when the prototype (m, ntaps) is given — grows to
    the next power of two covering the tap reach (round 4: the fixed-depth
    ceiling removed, mirroring os_tail_len; power-of-two halos keep the
    halo | tile_rows divisibility the kernel's DMA start hints rely on).
    Callers with prototypes deeper than ~1 k samples MUST pass (m, ntaps)
    and size their carried tails with the result — the kernel derives its
    halo from the tail it is handed."""
    name = jnp.dtype(dtype).name
    if name not in _HALO_ROWS:
        raise ValueError(f"unsupported input dtype {name}; "
                         f"use float32/bfloat16/int8")
    rows = _HALO_ROWS[name]
    if ntaps is not None:
        if m is None:
            raise ValueError("pass both m and ntaps (or neither)")
        w = -(-ntaps // m)
        need = ((w - 1) * m) // LANES + 2
        while rows < need:
            rows *= 2
    return rows * LANES


def fx_correlate_streams_v2(xr, xi, tail_r, tail_i, taps_rm,
                            num_antennas: int, m: int, tile_rows: int = 256,
                            interpret: bool = False, fd_pairs=None,
                            xe_pairs=None, karatsuba: bool = False,
                            mxu_dtype=None, branch_mxu=None,
                            precision=None, deep_strategy: str = "window"):
    """Concat-free fused flagship step (flat-layout kernel, v2).

    Unlike fx_correlate_streams, the frame is NOT host-concatenated with
    the history: the kernel reads xr/xi directly from HBM (each input
    sample crosses HBM exactly once, full stop) and the carried state is a
    row-aligned fx_tail_len(dtype)-sample tail of the previous frame.
    Outputs therefore lag the frame end by H = fx_tail_len(dtype) samples:
    step k emits the channelizer/correlator products for stream positions
    [k·n − H, (k+1)·n − H) — a fixed pipeline latency, exactly equivalent
    to the v1 step on an H−(W·m−1)-shifted stream (see
    tests/test_pallas_kernels.py).

    Args:
      xr, xi: [A, n] float32, bfloat16, or int8 — this frame's planar
        components per stream (int8 = the reference's IChar sample format,
        used raw: outputs scale by the square of the quantization step).
        n must be a multiple of 128·tile_rows.
      tail_r, tail_i: [A, fx_tail_len(dtype)] in the same dtype — previous
        frame's last samples (zeros for the first step).
      taps_rm: [W, m] float32 — branch-major prototype taps (W·m = ntaps).
      fd_pairs / xe_pairs: as in fx_correlate_streams.
      mxu_dtype: operand dtype for the DFT/lag matmuls (accumulation is
        always float32).  Default: bfloat16 for bf16/int8 ingest (a single
        MXU pass; operand rounding sits below the ≤8-bit input quantization
        floor, and the reference's IChar path compiles with
        -cl-fast-relaxed-math anyway — lib/clXEngine_impl.cc:816), float32
        for f32 ingest.  Pass jnp.float32/jnp.bfloat16 to override.
      precision: matmul precision for every in-kernel dot (a
        jax.default_matmul_precision name; Mosaic lowers only the default
        and "float32"/HIGHEST — "tensorfloat32" raises NotImplementedError).
        MEASURED (round 3, TPU-vs-interpreter parity probe):
        with the backend default, Mosaic executes f32×f32 dots as a SINGLE
        bf16-operand MXU pass — mxu_dtype=float32 outputs are bit-identical
        to mxu_dtype=bfloat16 and ~3e-3 rel from exact-f32 sums.  Pass
        "float32" for genuinely f32-exact dots (measured ~1.7e-7 rel vs
        the exact-f32 interpreter; multi-pass, 3.0× the step time — 5.01
        vs 1.66 ms on the flagship shape).  None = backend default.

    Returns (fd_sum [len(fd_pairs), m], gram [len(xe_pairs), 2m]) — same
    post-processing contract as fx_correlate_streams.
    """
    from clenabled_tpu.dsp import xengine as dsp_xengine

    a = num_antennas
    g = 2 * a
    w = taps_rm.shape[0]
    n = xr.shape[-1]
    # the tail the caller hands us SETS the halo depth (round 4 — like
    # pfb_oversampled_fused): size it with fx_tail_len(dtype, m, ntaps)
    tail_len = tail_r.shape[-1]
    min_tail = fx_tail_len(xr.dtype)
    halo = tail_len // LANES
    if xr.shape != (a, n) or xi.shape != (a, n):
        raise ValueError(f"expected xr/xi of shape {(a, n)}")
    if xi.dtype != xr.dtype:
        raise ValueError("xr/xi dtypes must match")
    if (tail_r.shape != (a, tail_len) or tail_i.shape != (a, tail_len)
            or tail_len % min_tail or halo & (halo - 1)):
        raise ValueError(
            f"tails must be [{a}, fx_tail_len({xr.dtype}, m, ntaps)] "
            f"(a power-of-two multiple of {min_tail}); got {tail_r.shape}")
    if tail_r.dtype != xr.dtype or tail_i.dtype != xr.dtype:
        raise ValueError("tail dtypes must match the frame dtype")
    if n % (LANES * tile_rows):
        raise ValueError(
            f"frame length {n} must be a multiple of {LANES * tile_rows}")
    if ((w - 1) * m) // LANES + 2 > halo:
        raise ValueError(
            f"tap reach (w={w}, m={m}) exceeds the {halo}-row halo — size "
            f"tails with fx_tail_len(dtype, m, ntaps)")
    if tile_rows < halo or tile_rows % halo:
        raise ValueError(
            f"tile_rows ({tile_rows}) must be a multiple of the {halo}-row "
            f"halo (tile 1 reads frame rows [tile_rows - halo, ...) and the "
            f"DMA start hint needs halo | tile_rows)")
    out_rows = n // LANES
    xr3 = xr.reshape(a, out_rows, LANES)
    xi3 = xi.reshape(a, out_rows, LANES)
    tr3 = tail_r.reshape(a, halo, LANES)
    ti3 = tail_i.reshape(a, halo, LANES)

    consts = _fx_constants(taps_rm, m)
    if xe_pairs is None:
        xe_pairs = tuple(map(tuple, dsp_xengine.baseline_stations(a)))
    else:
        xe_pairs = tuple(map(tuple, xe_pairs))
    if fd_pairs is None:
        fd_pairs = tuple((0, p) for p in range(1, a))
    else:
        fd_pairs = tuple(map(tuple, fd_pairs))
    nb = len(xe_pairs)
    nfd = len(fd_pairs)
    fd_rows = max(8, nfd)
    xe_rows = max(8, 2 * nb)
    if mxu_dtype is None:
        mxu_dtype = (jnp.float32 if jnp.dtype(xr.dtype) == jnp.float32
                     else jnp.bfloat16)
    if branch_mxu is None:
        # default ON: the VPU roll/select stage is the fused kernel's
        # compute floor, and the banded-matmul branch stage beats it for
        # every ingest dtype (measured f32 3.87→2.89 ms, int8 2.99→2.21 ms
        # per 2^23-sample step).  NOTE (round-3 correction): with f32
        # ingest and the default precision, Mosaic runs these dots as one
        # bf16-operand MXU pass (~3e-3 rel from exact f32, bit-identical
        # to mxu_dtype=bfloat16 — measured); pass precision="float32" for
        # exact multi-pass f32 sums.  Narrow ingest uses bf16 operands
        # (exact feed, taps rounded below the 8-bit quantization floor).
        branch_mxu = True
    band = _fx_band_matrices(taps_rm, m)
    nq_band = band.shape[0]
    # deep prototypes (nq > 8): "window" (round 5, default) builds an
    # im2col [tile, nq·128] VMEM window with static slices and runs ONE
    # deep matmul — no dynamic loads, no f32 widening for narrow ingest;
    # "fori" keeps the round-4 dynamic-load loop (A/B surface)
    use_window = (branch_mxu and nq_band > 8 and deep_strategy == "window")
    if use_window:
        consts = consts + (jnp.asarray(
            band.reshape(nq_band * LANES, LANES)).astype(mxu_dtype),)
    else:
        consts = consts + (jnp.asarray(band),)
    # narrow deep prototypes: the fori branch path needs an f32 widening
    # scratch (dynamic sublane starts on narrow memrefs fail to lower)
    need_wide = (branch_mxu and nq_band > 8 and not use_window
                 and jnp.dtype(xr.dtype) != jnp.float32)
    call = pl.pallas_call(
        partial(_fx_stream_kernel_v2, tile_rows=tile_rows, halo=halo, w=w,
                a=a, m=m, fd_pairs=fd_pairs, xe_pairs=xe_pairs,
                karatsuba=karatsuba, mxu_dtype=mxu_dtype,
                branch_mxu=branch_mxu),
        grid=(out_rows // tile_rows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=(
            pl.BlockSpec((fd_rows, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((xe_rows, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((fd_rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((xe_rows, LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, g, tile_rows + halo, LANES), xr.dtype),
            pltpu.VMEM((fd_rows, LANES), jnp.float32),
            pltpu.VMEM((xe_rows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, g)),
        ] + ([pltpu.VMEM((tile_rows, nq_band * LANES), mxu_dtype)]
             if use_window else
             [pltpu.VMEM((tile_rows + halo, LANES), jnp.float32)]
             if need_wide else []),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * g * (w + 2 * m),
            bytes_accessed=jnp.dtype(xr.dtype).itemsize * g * n,
            transcendentals=n * max(1, nfd),
        ),
        interpret=interpret,
    )
    if precision is not None:
        # applies to every jnp.dot traced inside the kernel body (the
        # kernel is traced at invocation): "float32" forces multi-pass
        # exact-f32 MXU sums instead of Mosaic's default single
        # bf16-operand pass
        with jax.default_matmul_precision(precision):
            fd, xe = call(xr3, xi3, tr3, ti3, *consts)
    else:
        fd, xe = call(xr3, xi3, tr3, ti3, *consts)
    fd_sum = fd[:nfd].reshape(nfd, LANES // m, m).sum(axis=1)
    xef = xe[: 2 * nb].reshape(nb, 2, LANES // m, m).sum(axis=2)
    gram = jnp.concatenate([xef[:, 0, :], xef[:, 1, :]], axis=-1)
    return fd_sum, gram


# ---------------------------------------------------------------------------
# Fused oversampled (R < M) PFB channelizer.
#
# The XLA phase-split path (channelizer._pfb_oversampled_planar) re-reads the
# packed stream W times per phase from HBM; this kernel reads each input
# sample once.  Output phase decomposition for R | M (L = M/R phases):
# global output group i = p + L·u has commutator window start i·R =
# p·R + u·M, so each phase is the critically-sampled banded-matmul branch
# stage with a constant extra sample offset p·R folded into the band
# matrices, and the oversampling rotation (j + i·(M−R)) mod M is constant
# within a phase (L·(M−R) ≡ 0 mod M) — folded into per-phase rotated block
# DFT matrices.  Reference semantics: lib/clPolyphaseChannelizer_impl.cc
# :156-167 (filterpfb2 commutator + rotation), :208-225 (batched reverse
# FFT, scale 1.0).
# ---------------------------------------------------------------------------

OS_TAIL_LEN = 8 * LANES  # default carried-history samples (float32 path)


def os_tail_len(m: int, r: int, ntaps: int) -> int:
    """Carried-tail length for an oversampled-PFB config: the default
    OS_TAIL_LEN (1024) unless the tap reach needs a deeper halo (round 3 —
    production-size prototypes like 1600 taps at M=64 reach ~1.6k
    samples).  Always a multiple of 128; the kernel derives its halo from
    the tail arrays' length, so callers just size state with this."""
    w = -(-ntaps // m)
    reach = (w - 1) * m + (m // r - 1) * r
    return max(OS_TAIL_LEN, (reach // LANES + 2) * LANES)


def _pfb_os_constants(taps_rm, m: int, r: int, i_offset: int = 0):
    """Whole-channelizer banded matrices for the fused oversampled kernel.

    The PFB branch stage and the rotated inverse DFT are both linear, so
    they collapse into ONE banded family per output-row class f:
        out_f = Σ_q feed[q : q+T] @ E[q, f]
    with E[q, f] = Σ_p mq[p, q] @ D[p, f], where

    * mq[p, q, j, λ] = hr[c, λ] whenever λ + (w−1−c)·m + p·r = q·128 + j
      (hr[c, λ] = taps[c·m + (m−1−λ%m)]) — the phase-p branch sums;
    * D[p, f] = phase p's rotated inverse-DFT block matrix (lane reversal
      + static oversampling rotation folded in) with COLUMNS permuted so
      out_f lands in the final phase-INTERLEAVED row layout: out row
      or = L·t + f holds global groups i = g·or + k (g = 128/M lane
      groups per row), whose phase is (g·f + k) mod L and whose source
      slot in acc row t is (g·f + k) // L — always < g, so every output
      row draws from its own acc row.  (Round 3 generalized this from the
      L | g special case, where the phase reduces to k mod L — the
      restriction was never structural.)

    Collapsing the stages cuts the per-tile f32 MXU call count ~40% (the
    kernel is MXU-pass-bound: a separate branch+DFT formulation measured
    0.98 GSPS, the XLA-side interleave one 0.53) and removes every
    intermediate VMEM tensor.  Returns (er, ei): [nq, L, 128, 128] each."""
    t_np = np.asarray(taps_rm, np.float32)            # [w, m]
    w = t_np.shape[0]
    ell = m // r
    hr = np.tile(t_np[:, ::-1], (1, LANES // m))      # [w, 128]
    reach = (w - 1) * m + (ell - 1) * r
    nq = (reach + LANES - 1) // LANES + 1
    mq = np.zeros((ell, nq, LANES, LANES), np.float32)
    for p in range(ell):
        for c in range(w):
            d = (w - 1 - c) * m + p * r
            for lam in range(LANES):
                jf = lam + d
                mq[p, jf // LANES, jf % LANES, lam] += hr[c, lam]

    k_ = np.arange(m)
    ang = 2.0 * np.pi * np.outer(k_, k_) / m          # F[j,k] = e^{+i·ang}
    nlg = LANES // m                                  # lane groups per row
    dr = np.zeros((ell, ell, LANES, LANES), np.float32)
    di = np.zeros((ell, ell, LANES, LANES), np.float32)
    for p in range(ell):
        s = ((p + i_offset) * (m - r)) % m
        # lane jr holds subfilter j = m−1−jr; rotated channel (j+s) mod m
        rows = (np.arange(m)[::-1] + s) % m
        br_ = np.cos(ang)[rows, :]
        bi_ = np.sin(ang)[rows, :]
        for f in range(ell):
            for k in range(nlg):
                if (nlg * f + k) % ell != p:
                    continue
                src = (nlg * f + k) // ell
                dr[p, f, src * m : (src + 1) * m, k * m : (k + 1) * m] = br_
                di[p, f, src * m : (src + 1) * m, k * m : (k + 1) * m] = bi_
    er = np.einsum("pqjl,pflc->qfjc", mq, dr).astype(np.float32)
    ei = np.einsum("pqjl,pflc->qfjc", mq, di).astype(np.float32)
    return jnp.asarray(er), jnp.asarray(ei)


def _pfb_os_kernel(xr_hbm, xi_hbm, tr_ref, ti_ref, er_ref, ei_ref,
                   out_re, out_im, scratch, sems, obuf, osems,
                   *rest_scratch, tile_rows, halo, ell, nq, mxu_dtype):
    i = pl.program_id(0)
    num = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)

    def tile_copy(p, j, s, first: bool):
        src = (xr_hbm, xi_hbm)[p]
        if first:
            return pltpu.make_async_copy(
                src.at[pl.ds(0, tile_rows), :],
                scratch.at[s, p, pl.ds(halo, tile_rows), :], sems.at[s, p])
        start = pl.multiple_of(j * tile_rows - halo, halo)
        return pltpu.make_async_copy(
            src.at[pl.ds(start, tile_rows + halo), :],
            scratch.at[s, p], sems.at[s, p])

    def out_copy(s, j, comp):
        # obuf holds the tile's output rows ALREADY phase-interleaved
        # (row t·L + f = family f's t-th group row — the final stream
        # order), so this is ONE fully contiguous DMA per component per
        # tile.  Round-3 probe history: a [rows, L, 128] strided-destination
        # DMA cost ~3.4 ms/step of per-row stride setup; family-major
        # contiguous planes fixed that but needed an XLA moveaxis epilogue
        # (+0.37 ms) and tempted callers into the [n/r, m] 16-lane-minor
        # reshape (~8× padded relayout, +3.3 ms — the round-2 "3-4× off
        # roof" gap in its entirety).  The strided SUBLANE store into obuf
        # (see below) costs ~0.4 ms and eliminates both.
        dst = (out_re, out_im)[comp]
        return pltpu.make_async_copy(
            obuf.at[s, comp],
            dst.at[pl.ds(j * tile_rows * ell, tile_rows * ell), :],
            osems.at[s, comp])

    @pl.when(i == 0)
    def _():
        for p in range(2):
            tile_copy(p, 0, 0, first=True).start()
        scratch[0, 0, 0:halo, :] = tr_ref[:, :]
        scratch[0, 1, 0:halo, :] = ti_ref[:, :]

    multi = not isinstance(num, int) or num > 1
    if multi:
        @pl.when(i + 1 < num)
        def _():
            for p in range(2):
                tile_copy(p, i + 1, 1 - slot, first=False).start()

    @pl.when(i == 0)
    def _():
        for p in range(2):
            tile_copy(p, 0, 0, first=True).wait()

    if multi:
        @pl.when(i > 0)
        def _():
            for p in range(2):
                tile_copy(p, i, slot, first=False).wait()

        @pl.when(i > 1)            # reclaim this slot's output buffers
        def _():
            for comp in range(2):
                out_copy(slot, i - 2, comp).wait()

    md = jnp.dtype(mxu_dtype)
    narrow = md != jnp.dtype(jnp.float32)
    # round 5: deep prototypes take the im2col WINDOW strategy (flat
    # [ell, nq·128, 128] consts + a [2, tile, nq·128] window scratch) —
    # one window build per tile, ONE deep matmul per (component, family)
    # instead of the fori's nq dynamic-load dots (the flagship measured
    # 2.2-2.4× from the same change, job 358)
    window = er_ref.ndim == 3
    win_ref = rest_scratch[0] if rest_scratch else None
    unrolled = nq <= 8 and not window
    if unrolled:
        # operand loads hoisted OUT of the slot branches: inside pl.when
        # they re-issue per branch and fence Mosaic's load scheduling
        erv = [[er_ref[q, f].astype(md) if narrow else er_ref[q, f]
                for f in range(ell)] for q in range(nq)]
        eiv = [[ei_ref[q, f].astype(md) if narrow else ei_ref[q, f]
                for f in range(ell)] for q in range(nq)]
    for s in range(2):                 # static slot unroll (see v2 kernel)
        @pl.when(slot == s)
        def _(s=s):
            if unrolled:
                fr = scratch[s, 0][:, :]
                fi = scratch[s, 1][:, :]
                if narrow:
                    fr = fr.astype(md)
                    fi = fi.astype(md)
            elif window:
                # im2col the row-shifted feed views in CHUNKS of up to 8
                # banded groups (static slices; a whole-nq window OOMs
                # Mosaic's scoped VMEM at nq ≥ ~32), every family reusing
                # each chunk before the next is built; per-family
                # accumulators ride the unrolled chunk loop as values
                wq = win_ref.shape[-1] // LANES
                zacc = [None] * ell
                for q0 in range(0, nq, wq):
                    qn = min(wq, nq - q0)
                    for comp in range(2):
                        sc = scratch[s, comp]
                        for qq in range(qn):
                            blk = sc[q0 + qq : q0 + qq + tile_rows, :]
                            if narrow:
                                blk = blk.astype(md)
                            win_ref[comp, :,
                                    qq * LANES : (qq + 1) * LANES] = blk
                    wr = win_ref[0, :, : qn * LANES]
                    wi = win_ref[1, :, : qn * LANES]
                    for f in range(ell):
                        e_r = er_ref[f, q0 * LANES : (q0 + qn) * LANES, :]
                        e_i = ei_ref[f, q0 * LANES : (q0 + qn) * LANES, :]
                        zr_c = (jnp.dot(wr, e_r,
                                        preferred_element_type=jnp.float32)
                                - jnp.dot(wi, e_i,
                                          preferred_element_type=jnp.float32))
                        zi_c = (jnp.dot(wr, e_i,
                                        preferred_element_type=jnp.float32)
                                + jnp.dot(wi, e_r,
                                          preferred_element_type=jnp.float32))
                        if zacc[f] is None:
                            zacc[f] = (zr_c, zi_c)
                        else:
                            zacc[f] = (zacc[f][0] + zr_c,
                                       zacc[f][1] + zi_c)
            for f in range(ell):
                if unrolled:
                    zr = (jnp.dot(fr[0:tile_rows], erv[0][f],
                                  preferred_element_type=jnp.float32)
                          - jnp.dot(fi[0:tile_rows], eiv[0][f],
                                    preferred_element_type=jnp.float32))
                    zi = (jnp.dot(fr[0:tile_rows], eiv[0][f],
                                  preferred_element_type=jnp.float32)
                          + jnp.dot(fi[0:tile_rows], erv[0][f],
                                    preferred_element_type=jnp.float32))
                    for q in range(1, nq):
                        sr = fr[q : q + tile_rows]
                        si = fi[q : q + tile_rows]
                        zr = (zr + jnp.dot(sr, erv[q][f],
                                           preferred_element_type=jnp.float32)
                              - jnp.dot(si, eiv[q][f],
                                        preferred_element_type=jnp.float32))
                        zi = (zi + jnp.dot(sr, eiv[q][f],
                                           preferred_element_type=jnp.float32)
                              + jnp.dot(si, erv[q][f],
                                        preferred_element_type=jnp.float32))
                elif window:
                    zr, zi = zacc[f]
                else:
                    # deep prototypes, legacy fori path (kept as the A/B
                    # surface): dynamic ref loads, ~30% slower than
                    # unrolled at nq=8, but the unrolled kernel crashes
                    # the axon backend's remote Mosaic build at nq ≥ ~11
                    # (round-3 envelope) — compiles at every depth
                    # probed (nq=17: 3,587 Msps)
                    def body(q, z, s=s, f=f):
                        zr, zi = z
                        sr = scratch[s, 0, pl.ds(q, tile_rows), :]
                        si = scratch[s, 1, pl.ds(q, tile_rows), :]
                        if narrow:
                            sr = sr.astype(md)
                            si = si.astype(md)
                        e_r = er_ref[q, f]
                        e_i = ei_ref[q, f]
                        if narrow:
                            e_r = e_r.astype(md)
                            e_i = e_i.astype(md)
                        zr = (zr + jnp.dot(sr, e_r,
                                           preferred_element_type=jnp.float32)
                              - jnp.dot(si, e_i,
                                        preferred_element_type=jnp.float32))
                        zi = (zi + jnp.dot(sr, e_i,
                                           preferred_element_type=jnp.float32)
                              + jnp.dot(si, e_r,
                                        preferred_element_type=jnp.float32))
                        return (zr, zi)

                    z0 = (jnp.zeros((tile_rows, LANES), jnp.float32),
                          jnp.zeros((tile_rows, LANES), jnp.float32))
                    zr, zi = jax.lax.fori_loop(0, nq, body, z0)
                # strided sublane store: family f lands on rows f, f+L,
                # f+2L, … of the slot's [tile_rows·L, 128] staging buffer —
                # the tile's rows leave VMEM already in final stream order
                obuf[s, 0, f::ell, :] = zr
                obuf[s, 1, f::ell, :] = zi

    for comp in range(2):
        out_copy(slot, i, comp).start()

    @pl.when(i == num - 1)             # drain the final tile's output DMAs
    def _():
        for comp in range(2):
            out_copy(slot, i, comp).wait()

    if multi:
        @pl.when((i == num - 1) & (i > 0))
        def _():
            for comp in range(2):
                out_copy(1 - slot, i - 1, comp).wait()


def pfb_oversampled_fused(xr, xi, tail_r, tail_i, taps_rm, m: int, r: int,
                          tile_rows: int = 256, i_offset: int = 0,
                          interpret: bool = False, mxu_dtype=jnp.float32,
                          flat_output: bool = False, precision=None,
                          deep_strategy: str = "window"):
    """Fused oversampled (R < M, R | M) PFB channelizer step.

    For the virtual stream v = tail ++ frame, output group i's commutator
    window is v[i·r .. i·r + W·m − 1]: out[i, j] = Σ_c taps[c·m+j] ·
    v[i·r + W·m − 1 − j − c·m], followed by the oversampling rotation
    (j + (i + i_offset·L)·(m−r)) mod m and the unscaled inverse DFT — the
    exact reference pipeline (clPolyphaseChannelizer_impl.cc:156-167,
    :208-225) minus the trailing ch_map selection (caller's slice).
    Outputs therefore lag the frame end by OS_TAIL_LEN samples, exactly
    like fx_correlate_streams_v2; streaming callers stagger the feed so
    GR history semantics hold (blocks layer).

    Args:
      xr, xi: [n] float32, n a multiple of 128·tile_rows AND of r·L
        (L = m/r, so rotation phases stay call-invariant).
      tail_r, tail_i: [os_tail_len(m, r, ntaps)] float32 — previous
        frame's last samples (zeros first call).  The tail length sets
        the kernel's halo depth (OS_TAIL_LEN default; deeper for long
        prototypes).
      taps_rm: [W, m] branch-major prototype taps (ntaps = W·m).
      i_offset: global PHASE-GROUP offset (units of L output groups) for
        time-sharded callers.

    Returns (zr, zi) each [n/r, m] float32 — rotated, inverse-DFT'd
    channel spectra in output-group order.

    precision: as fx_correlate_streams_v2 — the backend default runs the
    f32 banded matmuls as one bf16-operand MXU pass; "float32" forces
    exact multi-pass f32 sums.
    """
    w = taps_rm.shape[0]
    n = xr.shape[-1]
    if m % r:
        raise ValueError("fused oversampled kernel requires R | M")
    ell = m // r
    if ell < 2:
        raise ValueError("use the critical-sampled kernels for R == M")
    if LANES % m:
        raise ValueError(f"m must divide {LANES}")
    if tail_r.shape != tail_i.shape or tail_r.ndim != 1 \
            or tail_r.shape[0] % LANES:
        raise ValueError("tails must be 1-D, equal-length, multiple of 128")
    halo = tail_r.shape[0] // LANES      # tail length sets the halo depth
    if n % (LANES * tile_rows):
        raise ValueError(
            f"frame length {n} must be a multiple of {LANES * tile_rows}")
    if (n // r) % ell:
        raise ValueError(f"output count {n // r} must be a multiple of {ell}")
    reach = (w - 1) * m + (ell - 1) * r
    if reach // LANES + 2 > halo:
        raise ValueError(
            f"tap reach (w={w}, m={m}, r={r}) exceeds the {halo}-row halo "
            f"— size state with os_tail_len(m, r, ntaps)")
    if tile_rows < halo:
        raise ValueError(f"tile_rows ({tile_rows}) must be >= {halo}")
    rows = n // LANES
    er, ei = _pfb_os_constants(taps_rm, m, r, i_offset)
    nq = er.shape[0]
    use_window = nq > 8 and deep_strategy == "window"
    if use_window:
        # flat [ell, nq·128, 128] layout (family-major) for the deep
        # window strategy, cast to the operand dtype host-side
        def flat(e):
            e2 = jnp.transpose(e, (1, 0, 2, 3))
            return e2.reshape(ell, nq * LANES, LANES).astype(mxu_dtype)

        er, ei = flat(er), flat(ei)
    os_call = pl.pallas_call(
        partial(_pfb_os_kernel, tile_rows=tile_rows, halo=halo, ell=ell,
                nq=nq, mxu_dtype=mxu_dtype),
        grid=(rows // tile_rows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),  # manual contiguous DMA
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows * ell, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows * ell, LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, tile_rows + halo, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((2, 2, tile_rows * ell, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ] + ([pltpu.VMEM((2, tile_rows, min(nq, 8) * LANES), mxu_dtype)]
             if use_window else []),
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * rows * LANES * LANES * ell * nq,
            bytes_accessed=4 * (2 * n + 2 * ell * n),
            transcendentals=0,
        ),
        interpret=interpret,
    )
    os_args = (xr.reshape(rows, LANES), xi.reshape(rows, LANES),
               tail_r.reshape(halo, LANES), tail_i.reshape(halo, LANES),
               er, ei)
    if precision is not None:
        with jax.default_matmul_precision(precision):
            zr, zi = os_call(*os_args)
    else:
        zr, zi = os_call(*os_args)
    # the kernel emits [rows·L, 128] rows already in final interleaved
    # stream order (in-kernel strided sublane stores + one contiguous DMA
    # per component per tile) — no XLA epilogue at all.  Round-3 slope
    # decomposition at 16ch/R=8/2^23: kernel-only 0.56 ms; the previous
    # family-major layout's moveaxis cost +0.37 ms and its [n/r, m]
    # reshape +3.3 ms (16-lane-minor ~8× padded relayout) — the entire
    # "3-4× off roof" gap.  In-kernel interleave: 0.51-0.60 ms total
    # (14,000-16,500 Msps at tile 256-512), bit-identical output.
    if flat_output:
        # [rows, L, 128] — a free major-dim split, flat-identical to the
        # [n/r, m] group stream but 128-lane-minor.  Standalone
        # materialization of the [n/r, m] view pads the 16-lane minor dim
        # ~8× (measured ~3.3 ms at the 2^23 flagship shape); fused
        # consumers (slices/reductions under the same jit) avoid that.
        return (zr.reshape(rows, ell, LANES), zi.reshape(rows, ell, LANES))
    return zr.reshape(n // r, m), zi.reshape(n // r, m)


def _pfb_kernel(y_hbm, hr_ref, mat_ref, out_ref, scratch, sem, *, tile, w):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        y_hbm.at[pl.ds(i * tile, tile + w - 1), :], scratch, sem)
    dma.start()
    dma.wait()
    acc = hr_ref[0, :] * scratch[0:tile, :]
    for wp in range(1, w):
        acc = acc + hr_ref[wp, :] * scratch[wp : wp + tile, :]
    out_ref[:, :] = jnp.dot(acc, mat_ref[:, :],
                            preferred_element_type=jnp.float32)


def pfb_channelize_packed(y_packed, hr, num_antennas: int, m: int,
                          tile: int = 512, interpret: bool = False):
    """Fused PFB filter + per-group inverse DFT.

    Args:
      y_packed: [nout + W - 1, G·M] float32 — lane-packed reversed block
        stream (G = 2·num_antennas groups of M lanes).
      hr: [W, G·M] float32 — reversed branch taps, lane-tiled.
      num_antennas: antennas packed in (G = 2·A).
      m: channels per group (16 for the flagship).
      tile: output rows per grid step.

    Returns: [nout, G·M] float32 — channelized spectra, same lane layout
      (groups 0..A-1 = real parts, A..2A-1 = imaginary parts).
    """
    w = hr.shape[0]
    nout = y_packed.shape[0] - (w - 1)
    gm = y_packed.shape[1]
    if gm != 2 * num_antennas * m:
        raise ValueError(f"lane dim {gm} != 2*{num_antennas}*{m}")
    if nout % tile:
        raise ValueError(f"nout {nout} must be a multiple of tile {tile}")
    mat = jnp.asarray(_idft_block_matrix(m, num_antennas))
    grid = nout // tile
    return pl.pallas_call(
        partial(_pfb_kernel, tile=tile, w=w),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # y stays in HBM; manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hr
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dft block matrix
        ],
        out_specs=pl.BlockSpec((tile, gm), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nout, gm), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile + w - 1, gm), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nout * gm * (w + gm),
            bytes_accessed=4 * (y_packed.size + nout * gm),
            transcendentals=0,
        ),
        interpret=interpret,
    )(y_packed, hr, mat)


# ---------------------------------------------------------------------------
# Fused overlap-save FFT filter (the clFilter frequency-domain path,
# lib/clFilter_impl.cc:592-681, re-designed for one HBM pass).
#
# The taps are zero-padded so the overlap K'−1 is a whole number of 128-lane
# rows; the FFT size is N = n2·128, so a chunk is exactly n2 rows and the
# N-point DFT factors as (rows × lanes):
#
#   X[s + n2·k] = Σ_c e^{-2πi cs/N} e^{-2πi ck/128} Σ_r x[r,c] e^{-2πi rs/n2}
#
# Stage 1 (the n2-point row DFT) is emitted as ONE left matmul whose matrix
# also performs the overlap-save unfold (chunk j's window starts stride·j
# rows into the tile window), stage 2 is a [·,128]×[128,128] lane matmul,
# the tap spectrum multiply is elementwise, and the inverse runs the same
# two stages transposed with the valid-sample extraction folded into the
# final left matmul.  Everything HBM-side is row-aligned; the carried tail
# is K'−1 samples (whole rows), DMAs are double-buffered as in
# _fx_stream_kernel_v2.
# ---------------------------------------------------------------------------


class OfsPlan:
    """Design-time constants for the fused overlap-save kernel."""

    def __init__(self, taps, chunks_per_tile: int | None = None):
        taps = np.asarray(taps, np.complex64)
        ntaps = int(taps.shape[-1])
        if ntaps < 2:
            raise ValueError("ofs kernel needs >= 2 taps")
        ov_rows = max(1, -(-(ntaps - 1) // LANES))       # ceil to whole rows
        kp = ov_rows * LANES + 1                          # padded tap count
        # stride (fresh rows per chunk) is the smallest power of two with
        # ≥75% chunk efficiency, and chunks_per_tile is a power of two, so
        # the frame quantum stride·T·128 is a power of two (streaming
        # callers overwhelmingly use power-of-two frames).  N = n2·128 need
        # not be a power of two — the row DFT is a dense [n2, n2] block.
        stride = 4
        while stride < 3 * ov_rows:
            stride *= 2
        n2 = stride + ov_rows
        n = n2 * LANES
        if chunks_per_tile is None:
            chunks_per_tile = 1
            while 2 * chunks_per_tile * n2 <= 512:
                chunks_per_tile *= 2
        t = chunks_per_tile
        self.ntaps, self.kp, self.n, self.n2 = ntaps, kp, n, n2
        self.ov_rows, self.stride, self.t = ov_rows, stride, t
        self.win = stride * t + ov_rows                   # window rows/tile
        self.win_pad = -(-self.win // 8) * 8
        self.out_rows = stride * t                        # output rows/tile
        self.quantum = self.out_rows * LANES              # frame granularity
        self.tail_len = ov_rows * LANES                   # carried samples

        r = -(-(n2 * t) // 8) * 8          # unfolded rows, sublane-aligned
        self.r_pad = r
        hlin = np.fft.fft(np.concatenate(
            [taps, np.zeros(n - ntaps, np.complex64)])) / n
        s_idx = np.arange(n2)
        c_idx = np.arange(LANES)

        def pairs(z):
            return (jnp.asarray(z.real.astype(np.float32)),
                    jnp.asarray(z.imag.astype(np.float32)))

        # stage-1 matrix with the unfold folded in: [R, win_pad] (rows
        # beyond n2·t are zero — sublane padding)
        af = np.zeros((r, self.win_pad), np.complex64)
        d_n2 = np.exp(-2j * np.pi * np.outer(s_idx, np.arange(n2)) / n2)
        for j in range(t):
            af[n2 * j : n2 * (j + 1),
               stride * j : stride * j + n2] = d_n2
        self.af = pairs(af)
        # lane DFT and its inverse
        self.d1 = pairs(np.exp(
            -2j * np.pi * np.outer(c_idx, c_idx) / LANES))
        self.di = pairs(np.exp(
            +2j * np.pi * np.outer(c_idx, c_idx) / LANES))
        # twiddles and tap spectrum, tiled over the t chunks: [R, 128]
        def tile_rows_pad(block):
            out = np.zeros((r, LANES), np.complex64)
            out[: n2 * t] = np.tile(block, (t, 1))
            return out

        tw1 = np.exp(-2j * np.pi * np.outer(s_idx, c_idx) / n)
        self.tw = pairs(tile_rows_pad(tw1))
        self.twb = pairs(tile_rows_pad(np.conj(tw1)))
        hmat = hlin[s_idx[:, None] + n2 * c_idx[None, :]]  # [n2, 128]
        self.h = pairs(tile_rows_pad(hmat))
        # final matrix: inverse row DFT restricted to the valid rows, with
        # the per-chunk re-fold: [out_rows, R]
        a2 = np.zeros((self.out_rows, r), np.complex64)
        d_inv = np.exp(+2j * np.pi * np.outer(
            np.arange(ov_rows, n2), s_idx) / n2)          # [stride, n2]
        for j in range(t):
            a2[stride * j : stride * (j + 1),
               n2 * j : n2 * (j + 1)] = d_inv
        self.a2 = pairs(a2)

    @property
    def consts(self):
        return (self.af + self.d1 + self.tw + self.h + self.di + self.twb
                + self.a2)


def _ofs_kernel(xr_hbm, xi_hbm, tr_ref, ti_ref, afr, afi, d1r, d1i, twr,
                twi_, hr_, hi_, dir_, dii_, tbr, tbi, a2r, a2i, outr, outi,
                scratch, sems, *, stride_t, win, win_pad, ov):
    i = pl.program_id(0)
    num = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)

    def copy(p, j, s, first: bool):
        src = (xr_hbm, xi_hbm)[p]
        if first:
            return pltpu.make_async_copy(
                src.at[pl.ds(0, win - ov), :],
                scratch.at[s, p, pl.ds(ov, win - ov), :], sems.at[s, p])
        start = pl.multiple_of(j * stride_t - ov, 2)
        return pltpu.make_async_copy(
            src.at[pl.ds(start, win), :],
            scratch.at[s, p, pl.ds(0, win), :], sems.at[s, p])

    @pl.when(i == 0)
    def _():
        for p in range(2):
            copy(p, 0, 0, first=True).start()
        scratch[0, 0, 0:ov, :] = tr_ref[:, :]
        scratch[0, 1, 0:ov, :] = ti_ref[:, :]
        if win_pad > win:
            # rows the DMA never writes: the stage-1 matrix has zero
            # columns there, but 0·garbage must not be 0·NaN
            z = jnp.zeros((win_pad - win, LANES), jnp.float32)
            for s in range(2):
                for p in range(2):
                    scratch[s, p, win:win_pad, :] = z

    # single-tile grids must not even EMIT the prefetch/wait paths: their
    # slices index past the input and fail statically (interpret-mode
    # discharge and Mosaic both check shapes on untaken branches) — the
    # same guard as the OS-PFB kernel's `multi`
    multi = not isinstance(num, int) or num > 1
    if multi:
        @pl.when(i + 1 < num)
        def _():
            for p in range(2):
                copy(p, i + 1, 1 - slot, first=False).start()

    @pl.when(i == 0)
    def _():
        for p in range(2):
            copy(p, 0, 0, first=True).wait()

    if multi:
        @pl.when(i > 0)
        def _():
            for p in range(2):
                copy(p, i, slot, first=False).wait()

    def cdot(ar, ai, br, bi):
        return (jnp.dot(ar, br, preferred_element_type=jnp.float32)
                - jnp.dot(ai, bi, preferred_element_type=jnp.float32),
                jnp.dot(ar, bi, preferred_element_type=jnp.float32)
                + jnp.dot(ai, br, preferred_element_type=jnp.float32))

    for s in range(2):
        @pl.when(slot == s)
        def _(s=s):
            wr = scratch[s, 0]
            wi = scratch[s, 1]
            yr, yi = cdot(afr[:, :], afi[:, :], wr, wi)      # stage 1+unfold
            zr = yr * twr[:, :] - yi * twi_[:, :]            # twiddle
            zi = yr * twi_[:, :] + yi * twr[:, :]
            vr, vi = cdot(zr, zi, d1r[:, :], d1i[:, :])      # stage 2 (lanes)
            fr_ = vr * hr_[:, :] - vi * hi_[:, :]            # tap spectrum
            fi_ = vr * hi_[:, :] + vi * hr_[:, :]
            ur, ui = cdot(fr_, fi_, dir_[:, :], dii_[:, :])  # inv lanes
            br_ = ur * tbr[:, :] - ui * tbi[:, :]            # inv twiddle
            bi_ = ur * tbi[:, :] + ui * tbr[:, :]
            or_, oi_ = cdot(a2r[:, :], a2i[:, :], br_, bi_)  # inv rows+fold
            outr[:, :] = or_
            outi[:, :] = oi_


def ofs_filter_planar(xr, xi, tail_r, tail_i, plan: OfsPlan,
                      interpret: bool = False):
    """Fused overlap-save FFT filter step.

    xr/xi: [n] float32 (n a multiple of plan.quantum); tail_r/tail_i:
    [plan.tail_len] float32 — the previous frame's last samples (zeros
    initially).  Returns (yr, yi) of length n: EXACTLY the same samples as
    dsp.fft_filter's overlap-add path (y[p] = Σ_k taps[k]·x[p−k] with x
    reaching back into the tail), chunking is internal.  Decimation is the
    caller's strided slice.
    """
    n = xr.shape[-1]
    if n % plan.quantum:
        raise ValueError(f"frame length {n} must be a multiple of "
                         f"{plan.quantum}")
    if tail_r.shape != (plan.tail_len,):
        raise ValueError(f"tail must be [{plan.tail_len}]")
    rows = n // LANES
    grid = rows // plan.out_rows
    xr2 = xr.reshape(rows, LANES)
    xi2 = xi.reshape(rows, LANES)
    tr2 = tail_r.reshape(plan.ov_rows, LANES)
    ti2 = tail_i.reshape(plan.ov_rows, LANES)
    yr, yi = pl.pallas_call(
        partial(_ofs_kernel, stride_t=plan.out_rows, win=plan.win,
                win_pad=plan.win_pad, ov=plan.ov_rows),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 16,
        out_specs=(
            pl.BlockSpec((plan.out_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.out_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, plan.win_pad, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=16 * 2 * n * (plan.n2 * plan.t + 2 * LANES) // 8,
            bytes_accessed=8 * (xr.size + n),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xr2, xi2, tr2, ti2, *plan.consts)
    return yr.reshape(n), yi.reshape(n)


# ---------------------------------------------------------------------------
# X-Engine stacked Gram: per-channel VMEM-accumulated G = W^T W over
# integration-time tiles, with the redundant ri block never computed.
#
# The XLA einsum form (xengine_correlate_stacked) concatenates W=[zr|zi]
# and computes the full symmetric [2SP, 2SP] Gram — at S=64/2-pol int8 the
# contraction sits exactly at the HBM/MXU roofline knee, but the einsum
# reaches only ~65% of it (round-3 slope: 1.43 ms vs the 0.94 ms this
# kernel measures = 149 useful TFLOP/s, xGPU counting).  Here each channel's
# operands stream once through double-buffered VMEM tiles and only the three
# needed blocks are accumulated (rr, ii, ir — ri is ir^T, gi = ir − ir^T):
# 25% less MXU work than the full stacked Gram.  Reference semantics:
# lib/clXEngine_impl.cc:727-790 (cxmac over [channel][baseline]).
# ---------------------------------------------------------------------------


def _xengine_gram_kernel(zr_hbm, zi_hbm, out_a, out_b, w, acc, sems, *,
                         nt, t_tile, nf, acc_dtype, kb, tri_blocks,
                         emit_gi=False):
    fch = pl.program_id(0)
    it = pl.program_id(1)
    # slot parity follows the GLOBAL grid index: with nt odd the
    # cross-channel prefetch would otherwise land in the wrong buffer
    slot = jax.lax.rem(fch * nt + it, 2)
    nbt = len(tri_blocks)

    def cp(p_, f_, j, s):
        src = (zr_hbm, zi_hbm)[p_]
        return pltpu.make_async_copy(
            src.at[f_, pl.ds(j * t_tile, t_tile), :], w.at[s, p_],
            sems.at[s, p_])

    @pl.when((fch == 0) & (it == 0))
    def _():
        for p_ in range(2):
            cp(p_, 0, 0, 0).start()

    nxt = it + 1
    last = nxt >= nt
    nf_ = jnp.where(last, fch + 1, fch)
    nj = jnp.where(last, 0, nxt)

    @pl.when(nf_ < nf)
    def _():
        for p_ in range(2):
            cp(p_, nf_, nj, 1 - slot).start()

    dn = (((0,), (0,)), ((), ()))
    for s in range(2):                    # static slot unroll
        @pl.when(slot == s)
        def _(s=s):
            for p_ in range(2):
                cp(p_, fch, it, s).wait()
            br = [w[s, 0, :, i * LANES:(i + 1) * LANES] for i in range(kb)]
            bi = [w[s, 1, :, i * LANES:(i + 1) * LANES] for i in range(kb)]
            new = []
            # gr blocks: rr + ii, LOWER triangle only (gr is symmetric)
            for (i, j) in tri_blocks:
                new.append(
                    jax.lax.dot_general(br[i], br[j], dn,
                                        preferred_element_type=acc_dtype)
                    + jax.lax.dot_general(bi[i], bi[j], dn,
                                          preferred_element_type=acc_dtype))
            # ir blocks: all k×k (gi = ir − irᵀ needs the full block grid)
            for i in range(kb):
                for j in range(kb):
                    new.append(jax.lax.dot_general(
                        bi[i], br[j], dn, preferred_element_type=acc_dtype))

            @pl.when(it == 0)
            def _():
                for idx, v in enumerate(new):
                    acc[idx] = v

            @pl.when(it > 0)
            def _():
                for idx, v in enumerate(new):
                    acc[idx] = acc[idx] + v

    @pl.when(it == nt - 1)
    def _():
        for idx in range(nbt):
            out_a[0, idx] = acc[idx]
        if emit_gi:
            # round 5: emit the Gram imag part DIRECTLY — gi = ir − irᵀ,
            # so gi[bi·128+r, bj·128+c] = ir[bi,bj][r,c] − ir[bj,bi][c,r];
            # triangular consumers only ever read block (bi ≥ bj) rows, so
            # only the nbt lower-triangle gi blocks leave VMEM (the full
            # kb² ir grid + a transposed read stay on-chip; Mosaic lowers
            # the 128×128 last-2-dims transpose for i32/f32 — probe 356).
            # Replaces the XLA b−bᵀ mirror/double-take epilogue that cost
            # ~2.4 ms against the kernel's 3.7 at k=4 (BENCH_TPU.md).
            for n_, (i, j) in enumerate(tri_blocks):
                out_b[0, n_] = (acc[nbt + i * kb + j]
                                - acc[nbt + j * kb + i].T)
        else:
            for i in range(kb):
                for j in range(kb):
                    out_b[0, i, j] = acc[nbt + i * kb + j]


def xengine_gram_stacked_blocks(zr, zi, t_tile: int = 4096,
                                interpret: bool = False):
    """The block-layout form of :func:`xengine_gram_stacked`: returns
    (a_blk [F, nbt, 128, 128], b_blk [F, kb, kb, 128, 128], tri_blocks)
    WITHOUT assembling full [F, SP, SP] matrices — consumers that only
    need the triangular baseline order can gather straight from the
    blocks (round 4: the XLA mirror-assembly epilogue measured 3.6 ms on
    the k=4/F=128 shape, vs 5.0 ms for the whole kernel — see
    BENCH_TPU.md).  a_blk holds the lower-triangle (i >= j) blocks of
    a = zr·zrᵀ + zi·ziᵀ in tri_blocks order; b = zi·zrᵀ is the full
    block grid with b_full[bi·128+ir, bj·128+ic] = b_blk[bi, bj, ir, ic].
    """
    return _xengine_gram_stacked_call(zr, zi, t_tile, interpret)


def xengine_gram_stacked_tri(zr, zi, t_tile: int = 4096,
                             interpret: bool = False):
    """Triangular-consumer form (round 5): returns (a_blk [F, nbt, 128,
    128], gi_blk [F, nbt, 128, 128], tri_blocks) where gi_blk holds the
    LOWER-TRIANGLE blocks of gi = ir − irᵀ, computed inside the kernel
    from the VMEM-resident ir grid.  Triangular extraction then needs
    only two static-index takes (a and gi) instead of three (a, b, bᵀ) —
    the b-transpose pass never touches HBM.  Reference triangular order:
    lib/clXEngine_impl.cc:744-790."""
    return _xengine_gram_stacked_call(zr, zi, t_tile, interpret,
                                      emit_gi=True)


def xengine_gram_stacked(zr, zi, t_tile: int = 4096,
                         interpret: bool = False):
    """Fused stacked-Gram X-Engine contraction (triangular-only compute).

    Args:
      zr, zi: [F, T, S·P] int8 or bfloat16 channel-major spectra
        (stations·pols on the lanes — S·P must be a multiple of 128;
        the reference benchmark's 64 stations × 2 pol is one lane block,
        larger arrays get a k×k block-triangular schedule whose compute
        saving grows toward 2× with k = S·P/128).
      t_tile: integration-time rows per VMEM tile (divisor of T; 2048+
        amortizes the DMA setup, 4096 measured fastest — see BENCH_TPU.md.
        CAUTION: t_tile=8192 crashed the TPU worker in round-3 probes;
        values above 4096 are clamped, and large S·P scales the tile down
        to bound VMEM).

    Returns (a, b): a = zr·zrᵀ + zi·ziᵀ and b = zi·zrᵀ, each
    [F, S·P, S·P] (int32 for int8 inputs — EXACT accumulation — else
    float32).  The Gram re/im parts are gr = a, gi = b − bᵀ; assembly,
    scaling and triangular extraction live in
    xengine.xengine_correlate_stacked.
    """
    a_blk, b_blk, tri_blocks = _xengine_gram_stacked_call(
        zr, zi, t_tile, interpret)
    f, _, sp = zr.shape
    kb = sp // LANES
    if kb == 1:
        return a_blk[:, 0], b_blk[:, 0, 0]
    # assemble the full [F, SP, SP] matrices (XLA-side, one HBM copy):
    # b is the complete block grid; a mirrors the lower triangle (gr is
    # symmetric: gr[j,i] = gr[i,j]ᵀ)
    b_full = jnp.transpose(b_blk, (0, 1, 3, 2, 4)).reshape(f, sp, sp)
    idx = {ij: n for n, ij in enumerate(tri_blocks)}
    rows = []
    for i in range(kb):
        cols = []
        for j in range(kb):
            if j <= i:
                cols.append(a_blk[:, idx[(i, j)]])
            else:
                cols.append(jnp.swapaxes(a_blk[:, idx[(j, i)]], -1, -2))
        rows.append(jnp.concatenate(cols, axis=-1))
    a_full = jnp.concatenate(rows, axis=-2)
    return a_full, b_full


def _xengine_gram_stacked_call(zr, zi, t_tile: int, interpret: bool,
                               emit_gi: bool = False):
    f, t, sp = zr.shape
    if sp % LANES:
        raise ValueError(f"S·P must be a multiple of {LANES} (got {sp})")
    kb = sp // LANES
    if zr.dtype != zi.dtype:
        raise ValueError("zr/zi dtypes must match")
    t_tile = min(t_tile, 4096,    # 8192 crashed the TPU worker (round 3)
                 max(256, (1 << 22) // (4 * sp)))  # ≤~4 MB of W tiles
    while t % t_tile:
        t_tile //= 2
    sub = 32 if zr.dtype == jnp.int8 else 16
    if t_tile < sub or t_tile % sub:
        raise ValueError(f"T={t} not tileable at {zr.dtype} granularity")
    nt = t // t_tile
    acc_dtype = (jnp.int32 if jnp.issubdtype(zr.dtype, jnp.integer)
                 else jnp.float32)
    tri_blocks = tuple((i, j) for i in range(kb) for j in range(i + 1))
    nbt = len(tri_blocks)
    if emit_gi:
        b_spec = pl.BlockSpec((1, nbt, LANES, LANES),
                              lambda i, j: (i, 0, 0, 0))
        b_shape = jax.ShapeDtypeStruct((f, nbt, LANES, LANES), acc_dtype)
    else:
        b_spec = pl.BlockSpec((1, kb, kb, LANES, LANES),
                              lambda i, j: (i, 0, 0, 0, 0))
        b_shape = jax.ShapeDtypeStruct((f, kb, kb, LANES, LANES), acc_dtype)
    a_blk, b_blk = pl.pallas_call(
        partial(_xengine_gram_kernel, nt=nt, t_tile=t_tile, nf=f,
                acc_dtype=acc_dtype, kb=kb, tri_blocks=tri_blocks,
                emit_gi=emit_gi),
        grid=(f, nt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(
            pl.BlockSpec((1, nbt, LANES, LANES),
                         lambda i, j: (i, 0, 0, 0)),
            b_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((f, nbt, LANES, LANES), acc_dtype),
            b_shape,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, t_tile, sp), zr.dtype),
            pltpu.VMEM((nbt + kb * kb, LANES, LANES), acc_dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * (2 * nbt + kb * kb) * f * t * LANES * LANES,
            bytes_accessed=2 * zr.size * zr.dtype.itemsize
            + (nbt + kb * kb) * f * LANES * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(zr, zi)
    return a_blk, b_blk, tri_blocks


# ---------------------------------------------------------------------------
# Costas loop on the SCALAR core (round 5).
#
# The loop is inherently sequential feedback — the reference runs it as a
# single-work-item GPU kernel (~0.7 MSPS, lib/clCostasLoop_impl.cc:151-312)
# and the lax.scan form measures 0.58-0.60 MSPS on the VPU: each of the
# ~14 serially-dependent VECTOR ops pays ~85-100 ns of issue latency for a
# scalar's worth of work (BENCH_TPU.md round-3 latency-bound proof).  The
# TPU has a second compute engine built for exactly this shape: the scalar
# core.  A dependent scalar chain in SMEM measures ~4-6 ns per light
# iteration and ~26-38 ns for a ~30-op chain (probe 359) — so the full
# recurrence with polynomial sincos runs the SAME exact sequential
# semantics at 10-20x the VPU scan.  Frames stream through SMEM in grid
# chunks; (phase, freq, error) carries across chunks in SMEM scratch.
# ---------------------------------------------------------------------------

# Cephes sinf/cosf minimax coefficients on [-pi/4, pi/4] (public-domain
# constants; ~1-2 f32 ulp) + 2-part pi/2 for exact-enough reduction over
# the recurrence's |phase| <= 2*pi + freq + alpha range.
_SC_PIO2_HI = 1.5707963267948966
_SC_PIO2_LO = 6.123233995736766e-17
_SC_SIN = (-1.6666654611e-1, 8.3321608736e-3, -1.9515295891e-4)
_SC_COS = (4.166664568298827e-2, -1.388731625493765e-3,
           2.443315711809948e-5)


def _sincos_poly_scalar(x):
    """sin(x), cos(x) for a scalar f32 via quadrant reduction + minimax
    polys — every op lowers on the TPU scalar core (no transcendental
    unit there)."""
    j = jnp.round(x * jnp.float32(2.0 / math.pi))
    y = (x - j * jnp.float32(_SC_PIO2_HI)) - j * jnp.float32(_SC_PIO2_LO)
    q = jnp.astype(j, jnp.int32) % 4
    y2 = y * y
    s = y * (1.0 + y2 * (_SC_SIN[0] + y2 * (_SC_SIN[1] + y2 * _SC_SIN[2])))
    c = 1.0 + y2 * (-0.5 + y2 * (_SC_COS[0] + y2 * (_SC_COS[1]
                                                    + y2 * _SC_COS[2])))
    sin_x = jnp.where(q == 0, s, jnp.where(q == 1, c,
                      jnp.where(q == 2, -s, -c)))
    cos_x = jnp.where(q == 0, c, jnp.where(q == 1, -s,
                      jnp.where(q == 2, -c, s)))
    return sin_x, cos_x


def _costas_scalar_kernel(xr_ref, xi_ref, st_in, or_ref, oi_ref, st_out,
                          st, *, chunk, order, alpha, beta, f_min, f_max):
    i = pl.program_id(0)
    two_pi = jnp.float32(2.0 * math.pi)

    @pl.when(i == 0)
    def _():
        for k in range(3):
            st[k] = st_in[k]

    def body(t, carry):
        phase, freq = carry
        s_r = xr_ref[t]
        s_i = xi_ref[t]
        sin_p, cos_p = _sincos_poly_scalar(phase)
        n_r = cos_p            # cos(-phase)
        n_i = -sin_p           # sin(-phase)
        o_r = s_r * n_r - s_i * n_i
        o_i = s_r * n_i + s_i * n_r
        or_ref[t] = o_r
        oi_ref[t] = o_i
        if order == 2:
            error = o_r * o_i
        else:
            error = (jnp.where(o_r > 0, 1.0, -1.0) * o_i
                     - jnp.where(o_i > 0, 1.0, -1.0) * o_r)
        error = 0.5 * (jnp.abs(error + 1.0) - jnp.abs(error - 1.0))
        freq = freq + jnp.float32(beta) * error
        phase = phase + freq + jnp.float32(alpha) * error
        phase = jnp.where(
            (phase > two_pi) | (phase < -two_pi),
            (phase / two_pi - jnp.trunc(phase / two_pi)) * two_pi,
            phase,
        )
        freq = jnp.clip(freq, jnp.float32(f_min), jnp.float32(f_max))
        st[2] = error
        return phase, freq

    phase, freq = jax.lax.fori_loop(0, chunk, body, (st[0], st[1]))
    st[0] = phase
    st[1] = freq
    nlast = pl.num_programs(0) - 1

    @pl.when(i == nlast)
    def _():
        for k in range(3):
            st_out[k] = st[k]


def costas_scalar(xr, xi, phase, freq, error, order: int, alpha: float,
                  beta: float, f_min: float = -1.0, f_max: float = 1.0,
                  chunk: int = 2048, interpret: bool = False):
    """Exact-sequential Costas loop on the TPU scalar core.

    Same recurrence as demod._costas_step_planar (GR control_loop
    semantics, reference lib/clCostasLoop_impl.cc:151-312) with sincos
    evaluated by ~1-ulp minimax polynomials instead of the VPU
    transcendentals — locked-loop trajectories agree to float32 rounding
    (the loop is contracting; tests pin the tolerance).

    Args:
      xr, xi: [n] float32 planar frame (n a multiple of ``chunk``).
      phase, freq, error: scalar f32 carried state.
    Returns (o_r [n], o_i [n], phase', freq', error').
    """
    n = xr.shape[-1]
    while n % chunk:
        chunk //= 2
    st0 = jnp.stack([jnp.float32(phase), jnp.float32(freq),
                     jnp.float32(error)])
    o_r, o_i, st1 = pl.pallas_call(
        partial(_costas_scalar_kernel, chunk=chunk, order=order,
                alpha=float(alpha), beta=float(beta), f_min=float(f_min),
                f_max=float(f_max)),
        grid=(n // chunk,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n,), jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.float32),
            jax.ShapeDtypeStruct((3,), jnp.float32),
        ),
        scratch_shapes=[pltpu.SMEM((3,), jnp.float32)],
        interpret=interpret,
    )(xr, xi, st0)
    return o_r, o_i, st1[0], st1[1], st1[2]
