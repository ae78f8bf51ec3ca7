"""ShardedChain: a multi-chip streaming pipeline as a first-class API.

Composes the halo-exchange factories into a linear receive chain running
over a mesh — the distributed analogue of Flowgraph for the common
source→filter→channelize→demod topologies.  Each stage's carried state and
halo communication is handled internally (ring ppermute); elementwise
stages run on the already-sharded arrays (XLA propagates the sharding).

    chain = ShardedChain(mesh)
    chain.add_fft_filter(taps)           # time-sharded OFA with halo
    chain.add_map(lambda x: x * 0.5)     # elementwise, stays sharded
    chain.add_quadrature_demod(1.0)      # 1-sample halo
    init, step = chain.compile()
    state = init()
    state, y = step(state, frame)        # frame [D·L] -> y

Sequential blocks (Costas) cannot be time-sharded — run them downstream of
a Flowgraph or on the gathered result.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from clenabled_tpu.sharding.halo import (
    _ring_fwd,
    make_sharded_channelizer,
    make_sharded_fft_filter,
    make_sharded_fir_filter,
)


def make_sharded_quadrature_demod(gain: float, mesh: Mesh,
                                  axis: str = "shard"):
    """Time-sharded quadrature demod: 1-sample ring halo (the block's
    set_history(2) across shard boundaries)."""
    d = mesh.shape[axis]
    perm = _ring_fwd(axis, d)
    g = jnp.float32(gain)

    def init_state():
        return jnp.zeros((d, 1), jnp.complex64)

    @jax.jit
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(axis)),
             out_specs=(P(axis, None), P(axis)))
    def step(state, x):
        idx = jax.lax.axis_index(axis)
        recv = jax.lax.ppermute(x[-1:], axis, perm)
        last = jnp.where(idx == 0, state[0], recv)
        prev = jnp.concatenate([last, x[:-1]])
        prod = x * jnp.conj(prev)
        y = (g * jnp.arctan2(prod.imag, prod.real)).astype(jnp.float32)
        new_state = jnp.where(idx == 0, recv, state[0])[None]
        return new_state, y

    return init_state, step


class ShardedChain:
    """Linear multi-chip streaming chain over a 1-D mesh axis."""

    def __init__(self, mesh: Mesh, axis: str = "shard"):
        self.mesh = mesh
        self.axis = axis
        self._steps: list[tuple[Callable, Callable | None]] = []

    def add_fir_filter(self, taps, decimation: int = 1) -> "ShardedChain":
        init, apply = make_sharded_fir_filter(taps, self.mesh, self.axis,
                                              decimation)
        self._steps.append((apply, init))
        return self

    def add_fft_filter(self, taps, decimation: int = 1) -> "ShardedChain":
        init, apply, _plan = make_sharded_fft_filter(taps, self.mesh,
                                                     self.axis, decimation)
        self._steps.append((apply, init))
        return self

    def add_channelizer(self, taps, num_channels: int, ninputs_per_iter: int,
                        ch_map) -> "ShardedChain":
        init, apply = make_sharded_channelizer(taps, num_channels,
                                               ninputs_per_iter, ch_map,
                                               self.mesh, self.axis)
        self._steps.append((apply, init))
        return self

    def add_quadrature_demod(self, gain: float) -> "ShardedChain":
        init, apply = make_sharded_quadrature_demod(gain, self.mesh, self.axis)
        self._steps.append((apply, init))
        return self

    def add_map(self, fn: Callable) -> "ShardedChain":
        """Stateless elementwise stage (sharding propagates through XLA)."""
        self._steps.append((lambda state, x: (state, fn(x)), None))
        return self

    def compile(self):
        steps = list(self._steps)

        def init_state():
            return tuple(init() if init is not None else ()
                         for _, init in steps)

        def step(states, x):
            new_states = []
            for (apply, _), st in zip(steps, states):
                st, x = apply(st, x)
                new_states.append(st)
            return tuple(new_states), x

        return init_state, step
