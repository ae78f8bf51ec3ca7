"""Demodulators: quadrature (FM/FSK) demod and the Costas loop.

- ``quadrature_demod`` replaces clQuadratureDemod
  (lib/clQuadratureDemod_impl.cc:108-181): out[i] = gain·arg(x[i+1]·conj(x[i]))
  with one sample of history carried between frames (set_history(2), :81).
- ``costas_loop`` replaces clCostasLoop (lib/clCostasLoop_impl.cc:151-312).
  The reference runs the feedback loop as a SINGLE-work-item GPU kernel
  (~0.7 MSPS, README.md:64) because it is inherently sequential.  On TPU the
  honest form is a `lax.scan` carrying (phase, freq): same recurrence,
  compiler-scheduled, and the carried state is an explicit NamedTuple instead
  of three single-element device buffers (:318-366).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

TWO_PI = 2.0 * math.pi


def quadrature_demod(x, gain: float, last_sample=None):
    """FM discriminator over a frame.

    Args:
      x: [n] complex64 frame.
      gain: demod gain (baked as #define GAIN in the reference kernel).
      last_sample: carried x[-1] of the previous frame (None → first frame
        behaves as if preceded by x[0], producing 0 for the first output).

    Returns: (y, new_last_sample) with y: [n] float32.
    """
    x = jnp.asarray(x, jnp.complex64)
    if last_sample is None:
        last_sample = x[..., :1]
    prev = jnp.concatenate([last_sample, x[..., :-1]], axis=-1)
    prod = x * jnp.conj(prev)
    y = (jnp.float32(gain) * jnp.arctan2(prod.imag, prod.real)).astype(jnp.float32)
    return y, x[..., -1:]


def quadrature_demod_planar(x, gain: float, last_sample=None):
    """Planar quadrature demod: x is a planar.PC frame; identical math
    (gain·atan2 of x[i]·conj(x[i-1])), complex-free for TPU."""
    from clenabled_tpu.dsp import planar

    if last_sample is None:
        last_sample = planar.PC(x.re[..., :1], x.im[..., :1])
    pr = jnp.concatenate([last_sample.re, x.re[..., :-1]], axis=-1)
    pi = jnp.concatenate([last_sample.im, x.im[..., :-1]], axis=-1)
    prod = planar.mul_conj(x, planar.PC(pr, pi))
    y = (jnp.float32(gain) * jnp.arctan2(prod.im, prod.re)).astype(jnp.float32)
    return y, planar.PC(x.re[..., -1:], x.im[..., -1:])


class CostasState(NamedTuple):
    """phase/freq/error — the reference's persistent device buffers."""
    phase: jax.Array
    freq: jax.Array
    error: jax.Array


def costas_init() -> CostasState:
    return CostasState(phase=jnp.float32(0.0), freq=jnp.float32(0.0),
                       error=jnp.float32(0.0))


def costas_gains(loop_bw: float) -> tuple[float, float]:
    """alpha/beta from loop bandwidth, per GR blocks::control_loop
    (critically damped 2nd-order loop; the reference bakes these as
    #defines, lib/clCostasLoop_impl.cc:134-137)."""
    damping = math.sqrt(2.0) / 2.0
    denom = 1.0 + 2.0 * damping * loop_bw + loop_bw * loop_bw
    alpha = (4.0 * damping * loop_bw) / denom
    beta = (4.0 * loop_bw * loop_bw) / denom
    return alpha, beta


def make_costas_loop_planar(loop_bw: float, order: int,
                            max_freq: float = 1.0, min_freq: float = -1.0):
    """Planar Costas loop: frames and outputs are planar.PC; the scan body
    runs entirely in float32 (sin/cos NCO on real parts) — the TPU path."""
    from clenabled_tpu.dsp import planar

    if order not in (2, 4):
        raise ValueError("costas loop order must be 2 or 4")
    alpha, beta = costas_gains(loop_bw)
    alpha = jnp.float32(alpha)
    beta = jnp.float32(beta)
    f_max = jnp.float32(max_freq)
    f_min = jnp.float32(min_freq)

    def step(carry, sample):
        phase, freq, _ = carry
        s_r, s_i = sample
        n_r = jnp.cos(-phase)
        n_i = jnp.sin(-phase)
        o_r = s_r * n_r - s_i * n_i
        o_i = s_r * n_i + s_i * n_r
        if order == 2:
            error = o_r * o_i
        else:
            error = (jnp.where(o_r > 0, 1.0, -1.0) * o_i
                     - jnp.where(o_i > 0, 1.0, -1.0) * o_r)
        error = 0.5 * (jnp.abs(error + 1.0) - jnp.abs(error - 1.0))
        freq = freq + beta * error
        phase = phase + freq + alpha * error
        phase = jnp.where(
            (phase > TWO_PI) | (phase < -TWO_PI),
            (phase / TWO_PI - jnp.trunc(phase / TWO_PI)) * TWO_PI,
            phase,
        )
        freq = jnp.clip(freq, f_min, f_max)
        return (phase, freq, error), (o_r, o_i)

    @jax.jit
    def run(state: CostasState, frame):
        # unroll amortizes TPU per-step scan overhead (~2.5x throughput)
        (phase, freq, error), (o_r, o_i) = jax.lax.scan(
            step, (state.phase, state.freq, state.error),
            (frame.re, frame.im), unroll=16
        )
        return (CostasState(phase=phase, freq=freq, error=error),
                planar.PC(o_r, o_i))

    return run


def make_costas_loop(loop_bw: float, order: int,
                     max_freq: float = 1.0, min_freq: float = -1.0):
    """Build the jitted per-frame Costas loop: (state, frame) -> (state, out).

    order must be 2 or 4 (validated like lib/clCostasLoop_impl.cc:67-82).
    """
    if order not in (2, 4):
        raise ValueError("costas loop order must be 2 or 4")
    alpha, beta = costas_gains(loop_bw)
    alpha = jnp.float32(alpha)
    beta = jnp.float32(beta)
    f_max = jnp.float32(max_freq)
    f_min = jnp.float32(min_freq)

    def step(carry, sample):
        phase, freq, _ = carry
        nco = jnp.exp(-1j * phase.astype(jnp.complex64))
        out = (sample * nco).astype(jnp.complex64)
        o_r, o_i = out.real, out.imag
        if order == 2:
            error = o_r * o_i
        else:
            # 4th-order signed error (clCostasLoop_impl.cc:185-193)
            error = (jnp.where(o_r > 0, 1.0, -1.0) * o_i
                     - jnp.where(o_i > 0, 1.0, -1.0) * o_r)
        # branchless clip to ±1 (gr::branchless_clip)
        error = 0.5 * (jnp.abs(error + 1.0) - jnp.abs(error - 1.0))
        freq = freq + beta * error
        phase = phase + freq + alpha * error
        # phase wrap to ±2π via fmod, matching the kernel's wrap (:219-223)
        phase = jnp.where(
            (phase > TWO_PI) | (phase < -TWO_PI),
            (phase / TWO_PI - jnp.trunc(phase / TWO_PI)) * TWO_PI,
            phase,
        )
        freq = jnp.clip(freq, f_min, f_max)
        return (phase, freq, error), out

    @jax.jit
    def run(state: CostasState, frame):
        frame = jnp.asarray(frame, jnp.complex64)
        (phase, freq, error), out = jax.lax.scan(
            step, (state.phase, state.freq, state.error), frame, unroll=16
        )
        return CostasState(phase=phase, freq=freq, error=error), out

    return run
