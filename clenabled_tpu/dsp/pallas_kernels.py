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
            pl.BlockSpec(memory_space=pltpu.ANY),
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
            pl.BlockSpec(memory_space=pltpu.ANY),   # y stays in HBM; manual DMA
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
