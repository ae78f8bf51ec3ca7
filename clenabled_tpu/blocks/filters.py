"""Filter blocks: clFilter family, clComplexFilter, clPolyphaseChannelizer."""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np

from clenabled_tpu.blocks._legacy import strip_legacy_kwargs
from clenabled_tpu.dsp import channelizer as dsp_chan
from clenabled_tpu.dsp import fft_filter as dsp_ofa
from clenabled_tpu.dsp import fir_filter as dsp_fir
from clenabled_tpu.dsp import firdes
from clenabled_tpu.streaming.block import Block


class Filter(Block):
    """clFilter (lib/clFilter_impl.cc): complex stream, float taps, with
    time-domain (direct FIR) or frequency-domain (overlap-add) mode —
    the reference's ``use_time`` ctor flag (include/clenabled/clFilter.h:32,
    default frequency-domain)."""

    def __init__(self, decimation: int, taps, use_time: bool = False,
                 planar: bool = False, name: str = "", **legacy):
        strip_legacy_kwargs(legacy)
        self.name = name
        self.decimation = decimation
        self.rate = Fraction(1, decimation)
        self.use_time = use_time
        self.planar = planar
        self._set(np.asarray(taps, np.float32))

    def _set(self, taps):
        self._taps = taps
        if self.use_time:
            if self.planar:
                import jax

                if (jax.default_backend() != "cpu"
                        and not np.iscomplexobj(taps)):
                    # TPU fast path: Pallas shifted-MAC FIR (~150× XLA conv);
                    # needs frames in multiples of 128·tile_rows
                    self._init, self._apply = dsp_fir.make_fir_filter_planar(
                        taps, self.decimation, tile_rows=8)
                    self.quantum = math.lcm(1024, self.decimation)
                    return
                self._init, self._apply = dsp_fir.make_fir_filter_planar_xla(
                    taps, self.decimation)
            else:
                self._init, self._apply = dsp_fir.make_fir_filter(
                    taps, self.decimation, complex_input=True)
            self.quantum = self.decimation
        else:
            if self.planar:
                self._init, self._apply, self._plan = (
                    dsp_ofa.make_fft_filter_planar(taps, self.decimation))
            else:
                self._init, self._apply, self._plan = dsp_ofa.make_fft_filter(
                    taps, self.decimation)
            self.quantum = dsp_ofa.frame_quantum(self._plan)

    def taps(self):
        return self._taps

    def set_taps(self, taps):
        """Rebuild for new taps (clFilter_impl.cc:417-479).  NOTE: resets
        carried filter state; call Runner.reset() or re-compile after."""
        self._set(np.asarray(taps, np.float32))

    set_taps2 = set_taps

    def init_state(self):
        return self._init()

    def apply(self, state, inputs):
        state, out = self._apply(state, inputs[0])
        return state, (out,), {}


class ComplexFilter(Filter):
    """clComplexFilter (lib/clComplexFilter_impl.cc): complex taps,
    time-domain only in the reference; both modes here."""

    def __init__(self, decimation: int, taps, use_time: bool = True,
                 planar: bool = False, name: str = "", **legacy):
        strip_legacy_kwargs(legacy)
        self.name = name
        self.decimation = decimation
        self.rate = Fraction(1, decimation)
        self.use_time = use_time
        self.planar = planar
        self._set(np.asarray(taps, np.complex64))

    def _set(self, taps):
        self._taps = taps
        if self.use_time:
            if self.planar:
                self._init, self._apply = dsp_fir.make_fir_filter_planar_xla(
                    taps, self.decimation)
            else:
                self._init, self._apply = dsp_fir.make_fir_filter(
                    taps, self.decimation, complex_input=True)
            self.quantum = self.decimation
        else:
            if self.planar:
                self._init, self._apply, self._plan = (
                    dsp_ofa.make_fft_filter_planar(taps, self.decimation))
            else:
                self._init, self._apply, self._plan = dsp_ofa.make_fft_filter(
                    taps, self.decimation)
            self.quantum = dsp_ofa.frame_quantum(self._plan)

    def set_taps(self, taps):
        """Rebuild for new COMPLEX taps (clComplexFilter set_taps2).  NOTE:
        resets carried filter state; re-compile the flowgraph after."""
        self._set(np.asarray(taps, np.complex64))

    set_taps2 = set_taps


# GRC wrapper blocks: their yml make-templates embed firdes calls
# (e.g. grc/clenabled_clLowPassFilter.block.yml:83-87).

def LowPassFilter(decimation, gain, samp_rate, cutoff_freq, transition_width,
                  window=firdes.WIN_HAMMING, beta=6.76, use_time=False,
                  planar=False, name="lowpass", **legacy):
    taps = firdes.low_pass(gain, samp_rate, cutoff_freq, transition_width,
                           window, beta)
    return Filter(decimation, taps, use_time=use_time, planar=planar,
                  name=name, **legacy)


def HighPassFilter(decimation, gain, samp_rate, cutoff_freq, transition_width,
                   window=firdes.WIN_HAMMING, beta=6.76, use_time=False,
                   planar=False, name="highpass", **legacy):
    taps = firdes.high_pass(gain, samp_rate, cutoff_freq, transition_width,
                            window, beta)
    return Filter(decimation, taps, use_time=use_time, planar=planar,
                  name=name, **legacy)


def BandPassFilter(decimation, gain, samp_rate, low_cutoff, high_cutoff,
                   transition_width, window=firdes.WIN_HAMMING, beta=6.76,
                   use_time=False, planar=False, name="bandpass", **legacy):
    taps = firdes.band_pass(gain, samp_rate, low_cutoff, high_cutoff,
                            transition_width, window, beta)
    return Filter(decimation, taps, use_time=use_time, planar=planar,
                  name=name, **legacy)


def BandRejectFilter(decimation, gain, samp_rate, low_cutoff, high_cutoff,
                     transition_width, window=firdes.WIN_HAMMING, beta=6.76,
                     use_time=False, planar=False, name="bandreject", **legacy):
    taps = firdes.band_reject(gain, samp_rate, low_cutoff, high_cutoff,
                              transition_width, window, beta)
    return Filter(decimation, taps, use_time=use_time, planar=planar,
                  name=name, **legacy)


def RootRaisedCosineFilter(decimation, gain, samp_rate, symbol_rate, alpha,
                           ntaps, use_time=False, planar=False, name="rrc",
                           **legacy):
    taps = firdes.root_raised_cosine(gain, samp_rate, symbol_rate, alpha, ntaps)
    return Filter(decimation, taps, use_time=use_time, planar=planar,
                  name=name, **legacy)


def FIRTapFilter(decimation, taps, use_time=False, planar=False,
                 name="fir_taps", **legacy):
    """clFIRTapFilter: general user-supplied taps."""
    return Filter(decimation, taps, use_time=use_time, planar=planar,
                  name=name, **legacy)


class PolyphaseChannelizer(Block):
    """clPolyphaseChannelizer (lib/clPolyphaseChannelizer_impl.cc): M-channel
    PFB with oversampling (ninputs_per_iter ≤ M) and output channel map.

    Output stream: interleaved selected channels, matching the reference's
    [sample-group][ch_map] output order (out rate = len(ch_map)/R)."""

    def __init__(self, taps, buf_items: int, num_channels: int,
                 ninputs_per_iter: int, ch_map, planar: bool = False,
                 name: str = "", **legacy):
        strip_legacy_kwargs(legacy)
        if buf_items % num_channels:
            raise ValueError("buf_items must be a multiple of num_channels")
        if buf_items % ninputs_per_iter:
            raise ValueError("buf_items must be a multiple of ninputs_per_iter")
        self.name = name
        self.num_channels = num_channels
        self.ninputs_per_iter = ninputs_per_iter
        self.ch_map = list(ch_map)
        self.quantum = buf_items
        self.rate = Fraction(len(self.ch_map), ninputs_per_iter)
        self.planar = planar
        self._init, self._apply = dsp_chan.make_channelizer(
            taps, num_channels, ninputs_per_iter, self.ch_map, planar=planar
        )

    def init_state(self):
        return self._init()

    def apply(self, state, inputs):
        from clenabled_tpu.dsp import planar

        state, out = self._apply(state, inputs[0])  # [n, C]
        if isinstance(out, planar.PC):
            flat = planar.PC(out.re.reshape(-1), out.im.reshape(-1))
        else:
            flat = out.reshape(-1)
        return state, (flat,), {}
