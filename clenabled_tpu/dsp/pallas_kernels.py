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
