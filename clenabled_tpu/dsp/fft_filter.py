"""Overlap-add fast convolution (FFT filter) with explicit carried tail.

Replaces the reference's ``fft_filter_ccf`` (lib/fft_filter.cc:133-175) and
the clFilter frequency-domain path (lib/clFilter_impl.cc:592-681).  Sizing
matches the reference exactly (lib/fft_filter.cc:77-78):

    fftsize  = 2 * next_pow2(ntaps)
    nsamples = fftsize - ntaps + 1            (samples consumed per chunk)
    tailsize = ntaps - 1                      (carried between calls)

The reference runs chunks sequentially, adding the previous chunk's tail into
the current output (:156-171).  Because ``tailsize < nsamples`` always holds
with this sizing, a tail only ever reaches the NEXT chunk — so a whole frame
of B chunks is computed as one batched FFT→multiply→IFFT (MXU/VPU-friendly,
one XLA program) and the overlap-add becomes a shifted add between
neighboring rows.  Only the final tail is carried state.

Decimation reproduces the reference's strided copy-out with carried phase
(dec_ctr, :161-167): requiring the frame to be a multiple of
``lcm(nsamples) * decimation`` alignment keeps the phase zero at frame
boundaries, exactly as GR's scheduler guarantees for the reference.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def compute_sizes(ntaps: int) -> tuple[int, int]:
    """(fftsize, nsamples) per lib/fft_filter.cc:77-78."""
    fftsize = int(2 * (2 ** math.ceil(math.log2(ntaps))))
    return fftsize, fftsize - ntaps + 1


class FftFilterPlan(NamedTuple):
    """Design-time constants (the analogue of the baked clFFT plan +
    pre-transformed taps, lib/fft_filter.cc:40-68)."""
    xformed_taps: jax.Array  # [fftsize] complex64: FFT of zero-padded taps
    ntaps: int
    fftsize: int
    nsamples: int
    decimation: int


def plan_fft_filter(taps, decimation: int = 1) -> FftFilterPlan:
    taps = np.asarray(taps)
    ntaps = int(taps.shape[-1])
    fftsize, nsamples = compute_sizes(ntaps)
    padded = np.zeros(fftsize, dtype=np.complex64)
    padded[:ntaps] = taps.astype(np.complex64)
    # net scaling matches the reference (taps pre-scaled 1/fftsize, both
    # transforms unscaled): equivalent to standard fft/ifft pair here.
    xt = jnp.asarray(np.fft.fft(padded).astype(np.complex64))
    return FftFilterPlan(xformed_taps=xt, ntaps=ntaps, fftsize=fftsize,
                         nsamples=nsamples, decimation=decimation)


def frame_quantum(plan: FftFilterPlan) -> int:
    """Smallest valid frame length: a multiple of nsamples whose output
    count is integral (i.e. lcm(nsamples, decimation) rounded to whole
    chunks)."""
    q = plan.nsamples
    while q % plan.decimation:
        q += plan.nsamples
    return q


@partial(jax.jit, static_argnames=("nsamples", "fftsize", "ntaps", "decimation"))
def _ofa_filter(x, tail, xformed_taps, *, nsamples, fftsize, ntaps, decimation):
    nchunks = x.shape[-1] // nsamples
    xb = x.reshape(nchunks, nsamples)
    pad = jnp.zeros((nchunks, fftsize - nsamples), dtype=jnp.complex64)
    spect = jnp.fft.fft(jnp.concatenate([xb, pad], axis=-1), axis=-1)
    z = jnp.fft.ifft(spect * xformed_taps, axis=-1)
    tails = z[:, nsamples:]  # [nchunks, ntaps-1]
    prev_tails = jnp.concatenate([tail[None, :], tails[:-1]], axis=0)
    body = z[:, :nsamples].at[:, : ntaps - 1].add(prev_tails)
    y = body.reshape(-1)
    if decimation > 1:
        y = y[::decimation]
    return y.astype(jnp.complex64), tails[-1].astype(jnp.complex64)


def make_fft_filter(taps, decimation: int = 1):
    """Streaming overlap-add filter: (init_state, apply, plan).

    apply(tail, frame) -> (new_tail, out).  ``frame`` length must be a
    multiple of ``frame_quantum(plan)``; out has len(frame)/decimation
    samples.
    """
    plan = plan_fft_filter(taps, decimation)
    quantum = frame_quantum(plan)

    def init_state(frame_size: int | None = None):
        del frame_size
        return jnp.zeros((plan.ntaps - 1,), dtype=jnp.complex64)

    def apply(tail, frame):
        frame = jnp.asarray(frame, jnp.complex64)
        if frame.shape[-1] % quantum:
            raise ValueError(
                f"frame length {frame.shape[-1]} must be a multiple of "
                f"{quantum} (nsamples={plan.nsamples}, decim={decimation})"
            )
        out, new_tail = _ofa_filter(
            frame, tail, plan.xformed_taps,
            nsamples=plan.nsamples, fftsize=plan.fftsize,
            ntaps=plan.ntaps, decimation=plan.decimation,
        )
        return new_tail, out

    return init_state, apply, plan


def fft_filter(x, taps, decimation: int = 1):
    """One-shot convenience over a zero initial tail (reference
    ``fft_filter_ccf::filter`` on a fresh object)."""
    init, apply, plan = make_fft_filter(taps, decimation)
    _, y = apply(init(), x)
    return y
