"""Time-sharded filtering with ring-ppermute halo exchange.

The sample stream is split into D consecutive time-blocks, one per device
(global frame [D·L] sharded along its only axis).  Sequential carried state
becomes communication:

- FIR: shard i needs the last ``ntaps-1`` INPUT samples of shard i-1 —
  a ring ppermute of each shard's input tail.
- Overlap-add: shard i's first ``ntaps-1`` OUTPUT samples need the additive
  IFFT tail of shard i-1's final chunk (lib/fft_filter.cc:156-171's d_tail)
  — a ring ppermute of each shard's final tail.

In both cases shard 0 consumes the PREVIOUS frame's tail, which is exactly
what the ring delivered to it from shard D-1 during the current step — so
the cross-step state is simply "what shard 0 received", making the sharded
stream bit-compatible with sequential execution at a cost of ONE K-sample
ppermute per frame.  (With D=1 this degenerates to the sequential filter.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from clenabled_tpu.dsp import fft_filter as dsp_ofa
from clenabled_tpu.dsp import fir_filter as dsp_fir
from clenabled_tpu.dsp import channelizer as dsp_chan


def _ring_fwd(axis: str, n: int):
    return [(j, (j + 1) % n) for j in range(n)]


def make_sharded_fir_filter(taps, mesh: Mesh, axis: str = "shard",
                            decimation: int = 1):
    """(init_state, apply): apply(state, x[D·L]) -> (state, y[D·L/decim]).

    L (the per-shard block) must be a multiple of ``decimation``; state is
    a [D, ntaps-1] array sharded over the mesh axis.
    """
    taps = jnp.asarray(taps)
    k = int(taps.shape[-1])
    d = mesh.shape[axis]
    perm = _ring_fwd(axis, d)
    cplx = jnp.issubdtype(taps.dtype, jnp.complexfloating)
    state_dtype = jnp.complex64  # streams are complex in the clFilter family

    def init_state():
        return jnp.zeros((d, k - 1), state_dtype)

    @jax.jit
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(axis)),
             out_specs=(P(axis, None), P(axis)))
    def step(state, x):  # local: state [1, k-1], x [L]
        idx = jax.lax.axis_index(axis)
        recv = jax.lax.ppermute(x[-(k - 1):], axis, perm)
        halo = jnp.where(idx == 0, state[0], recv)
        y = dsp_fir.fir_filter(jnp.concatenate([halo, x]), taps, decimation)
        new_state = jnp.where(idx == 0, recv, state[0])[None]
        return new_state, y

    def apply(state, x):
        new_state, y = step(state, jnp.asarray(x, jnp.complex64))
        return new_state, y

    return init_state, apply


def make_sharded_fft_filter(taps, mesh: Mesh, axis: str = "shard",
                            decimation: int = 1):
    """Overlap-add across time-shards; additive output-tail halo.

    Per-shard block length must be a multiple of the plan's nsamples AND of
    ``decimation``.  Returns (init_state, apply, plan).
    """
    plan = dsp_ofa.plan_fft_filter(taps, decimation=1)
    k = plan.ntaps
    d = mesh.shape[axis]
    perm = _ring_fwd(axis, d)

    def init_state():
        return jnp.zeros((d, k - 1), jnp.complex64)

    @jax.jit
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(axis)),
             out_specs=(P(axis, None), P(axis)))
    def step(state, x):  # local x [L]
        idx = jax.lax.axis_index(axis)
        # local OFA at full rate with zero boundary tail
        y_full, end_tail = dsp_ofa._ofa_filter(
            x, jnp.zeros(k - 1, jnp.complex64), plan.xformed_taps,
            nsamples=plan.nsamples, fftsize=plan.fftsize, ntaps=k,
            decimation=1,
        )
        recv = jax.lax.ppermute(end_tail, axis, perm)
        halo = jnp.where(idx == 0, state[0], recv)
        y_full = y_full.at[: k - 1].add(halo)
        new_state = jnp.where(idx == 0, recv, state[0])[None]
        if decimation > 1:
            return new_state, y_full[::decimation]
        return new_state, y_full

    def apply(state, x):
        x = jnp.asarray(x, jnp.complex64)
        local = x.shape[-1] // d
        if local % plan.nsamples or local % decimation:
            raise ValueError(
                f"per-shard block {local} must be a multiple of nsamples="
                f"{plan.nsamples} and decimation={decimation}"
            )
        return step(state, x)

    return init_state, apply, plan


def make_sharded_channelizer(taps, num_channels: int, ninputs_per_iter: int,
                             ch_map, mesh: Mesh, axis: str = "shard"):
    """Time-sharded PFB channelizer: input halo = ntaps-1 samples, output
    [D·L/R, C] sharded along time.  Returns (init_state, apply)."""
    taps_rm, ntaps = dsp_chan._pfb_constants(taps, num_channels,
                                             ninputs_per_iter)
    ch_arr = jnp.asarray(ch_map, jnp.int32)
    d = mesh.shape[axis]
    perm = _ring_fwd(axis, d)

    def init_state():
        return jnp.zeros((d, ntaps - 1), jnp.complex64)

    @jax.jit
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(axis)),
             out_specs=(P(axis, None), P(axis, None)))
    def step(state, x):
        idx = jax.lax.axis_index(axis)
        recv = jax.lax.ppermute(x[-(ntaps - 1):], axis, perm)
        halo = jnp.where(idx == 0, state[0], recv)
        full = jnp.concatenate([halo, x])
        # oversampling rotation phase is global: offset by this shard's
        # first output-group index
        i_offset = idx * (x.shape[-1] // ninputs_per_iter)
        out = dsp_chan._channelize(
            full, taps_rm, ch_arr, i_offset, num_channels=num_channels,
            ninputs_per_iter=ninputs_per_iter, ntaps=ntaps,
        )
        new_state = jnp.where(idx == 0, recv, state[0])[None]
        return new_state, out

    def apply(state, x):
        x = jnp.asarray(x, jnp.complex64)
        local = x.shape[-1] // d
        if local % ninputs_per_iter or local % num_channels:
            raise ValueError(
                f"per-shard block {local} must be a multiple of "
                f"num_channels={num_channels} and R={ninputs_per_iter}"
            )
        return step(state, x)

    return init_state, apply
