"""Demodulator blocks: QuadratureDemod and CostasLoop."""

from __future__ import annotations

import jax.numpy as jnp

from clenabled_tpu.blocks._legacy import strip_legacy_kwargs
from clenabled_tpu.dsp import demod as dsp_demod
from clenabled_tpu.streaming.block import Block


class QuadratureDemod(Block):
    """clQuadratureDemod (lib/clQuadratureDemod_impl.cc): c→f FM/FSK
    discriminator, gain baked, 1-sample carried history."""

    def __init__(self, gain: float, name: str = "", **legacy):
        strip_legacy_kwargs(legacy)
        self.name = name
        self.gain = gain

    def init_state(self):
        return jnp.zeros((1,), jnp.complex64)

    def apply(self, state, inputs):
        y, last = dsp_demod.quadrature_demod(inputs[0], self.gain,
                                             last_sample=state)
        return last, (y,), {}


class CostasLoop(Block):
    """clCostasLoop (lib/clCostasLoop_impl.cc): 2nd/4th-order carrier
    recovery as a lax.scan with carried (phase, freq, error)."""

    def __init__(self, loop_bw: float, order: int, name: str = "", **legacy):
        strip_legacy_kwargs(legacy)
        self.name = name
        self.loop_bw = loop_bw
        self.order = order
        self._run = dsp_demod.make_costas_loop(loop_bw, order)

    def init_state(self):
        return dsp_demod.costas_init()

    def apply(self, state, inputs):
        state, out = self._run(state, inputs[0])
        return state, (out,), {}
