"""Demodulator blocks: QuadratureDemod and CostasLoop."""

from __future__ import annotations

import jax.numpy as jnp

from clenabled_tpu.blocks._legacy import strip_legacy_kwargs
from clenabled_tpu.dsp import demod as dsp_demod
from clenabled_tpu.streaming.block import Block


class QuadratureDemod(Block):
    """clQuadratureDemod (lib/clQuadratureDemod_impl.cc): c→f FM/FSK
    discriminator, gain baked, 1-sample carried history.
    planar=True streams planar.PC frames (the complex-free TPU path)."""

    def __init__(self, gain: float, planar: bool = False, name: str = "",
                 **legacy):
        strip_legacy_kwargs(legacy)
        self.name = name
        self.gain = gain
        self.planar = planar

    def init_state(self):
        if self.planar:
            from clenabled_tpu.dsp import planar as pl_mod

            z = jnp.zeros((1,), jnp.float32)
            return pl_mod.PC(z, z)
        return jnp.zeros((1,), jnp.complex64)

    def apply(self, state, inputs):
        if self.planar:
            y, last = dsp_demod.quadrature_demod_planar(
                inputs[0], self.gain, last_sample=state)
        else:
            y, last = dsp_demod.quadrature_demod(inputs[0], self.gain,
                                                 last_sample=state)
        return last, (y,), {}


class CostasLoop(Block):
    """clCostasLoop (lib/clCostasLoop_impl.cc): 2nd/4th-order carrier
    recovery as a lax.scan with carried (phase, freq, error).
    planar=True streams planar.PC frames."""

    def __init__(self, loop_bw: float, order: int, planar: bool = False,
                 name: str = "", **legacy):
        strip_legacy_kwargs(legacy)
        self.name = name
        self.loop_bw = loop_bw
        self.order = order
        if planar:
            self._run = dsp_demod.make_costas_loop_planar(loop_bw, order)
        else:
            self._run = dsp_demod.make_costas_loop(loop_bw, order)

    def init_state(self):
        return dsp_demod.costas_init()

    def apply(self, state, inputs):
        state, out = self._run(state, inputs[0])
        return state, (out,), {}
