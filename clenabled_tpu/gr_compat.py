"""GNU Radio Companion loadability shim.

The reference makes every block instantiable from GRC through pybind11
bindings (python/bindings/python_bindings.cc:29-49) plus 30 .block.yml
descriptors (grc/clenabled_clFFT.block.yml:84-89).  Here the equivalent is
:func:`wrap`: it adapts any clenabled_tpu :class:`~clenabled_tpu.streaming.
block.Block` into a ``gr.basic_block`` so the generated descriptors in
``grc/`` (see tools/gen_grc_yaml.py) instantiate real TPU blocks inside a
stock GNU Radio flowgraph — the TPU does the math, GR does the plumbing.

GNU Radio is an OPTIONAL runtime dependency: this module imports it only
inside :func:`wrap`, so the rest of the package never requires it.  The
adapter logic itself is unit-tested against a minimal fake ``gr`` module
(tests/test_gr_compat.py) since GR isn't installable in the build image.

Contract mapping (GR ↔ Block):

====================  =====================================================
GR concept            Block concept
====================  =====================================================
io_signature          n_inputs / n_outputs (dtype from the .yml descriptor)
forecast()            quantum (input frames must be multiples of it)
relative rate         rate (Fraction: 1/decim or interp)
work state            init_state() pytree carried across general_work calls
message ports         the ``messages`` dict returned by apply()
====================  =====================================================
"""

from __future__ import annotations

import math

import numpy as np


def _to_numpy(y):
    """Block output leaf → numpy (handles planar.PC and jax arrays).
    Planar pairs assemble straight into complex64 — no complex128
    intermediate on the per-work-call hot path."""
    from clenabled_tpu.dsp import planar

    if isinstance(y, planar.PC):
        out = np.empty(np.shape(y.re), np.complex64)
        out.real = np.asarray(y.re)
        out.imag = np.asarray(y.im)
        return out
    return np.asarray(y)


_KIND_DTYPE = {  # the reference's DTYPE_* codes, GRCLBase.h:57-62
    "c": np.complex64, "f": np.float32, "i": np.int32,
    "s": np.int16, "b": np.int8,
}


def _sig_from_kinds(kinds, n_ports):
    if kinds is None:
        return [np.complex64] * n_ports
    if len(kinds) != n_ports:
        raise ValueError(f"kinds {kinds} do not cover {n_ports} ports")
    return [_KIND_DTYPE[k] for k in kinds]


def wrap(block, in_sig=None, out_sig=None, msg_ports=None, name=None,
         max_frames_pow2: int = 17):
    """Adapt a clenabled_tpu Block into a ``gr.basic_block``.

    Args:
      block: any Block instance (blocks.Fft(...), blocks.XEngine(...), ...).
      in_sig / out_sig: numpy dtypes per port; default derived from the
        block's declared ``in_kinds``/``out_kinds`` (mag/arg/demod blocks
        declare float32 outputs; undeclared ports default to complex64).
      msg_ports: names to register as GR message outputs.  Default: the
        block's ``msg_ports`` attribute if present, else none — unknown
        message keys are dropped (GR requires ports registered up front).
      name: GR block name (default: the block's class name).
      max_frames_pow2: cap on the per-call frame bucket (2**k samples).

    Returns a gr.basic_block instance ready for ``tb.connect(...)``.

    Retrace bounding: GR hands general_work whatever buffer sizes its
    scheduler produces, and every distinct size would re-trace the
    block's jitted internals (an unbounded-recompile hazard).  The
    adapter therefore processes quantum·2^k frame BUCKETS — the largest
    power-of-two multiple of the quantum that fits the available input
    and output space — consuming only that much (trimming is
    contract-legal for a general block; GR re-offers the remainder next
    call).  The jit cache is then bounded by log2(max buffer size)
    entries per block.
    """
    from gnuradio import gr  # optional dependency, imported lazily
    import pmt

    import jax.numpy as jnp
    from clenabled_tpu.dsp import planar

    n_in = block.n_inputs
    n_out = block.n_outputs
    if in_sig is None:
        in_sig = _sig_from_kinds(getattr(block, "in_kinds", None), n_in)
    if out_sig is None:
        out_sig = _sig_from_kinds(getattr(block, "out_kinds", None), n_out)
    if msg_ports is None:
        msg_ports = tuple(getattr(block, "msg_ports", ()))
    planar_mode = bool(getattr(block, "planar", False))
    rate = block.rate
    quantum = max(1, int(block.quantum))

    def to_device(x, sig_dtype):
        if planar_mode and np.issubdtype(sig_dtype, np.complexfloating):
            return planar.from_complex(np.ascontiguousarray(x))
        return jnp.asarray(np.ascontiguousarray(x))

    class _TpuBlock(gr.basic_block):
        def __init__(self):
            gr.basic_block.__init__(
                self, name=name or type(block).__name__,
                in_sig=list(in_sig), out_sig=list(out_sig))
            self._blk = block
            self._state = block.init_state()
            if n_in and rate != 1:
                self.set_relative_rate(float(rate))
            out_items = quantum * rate
            if n_out and out_items.denominator == 1 and out_items > 1:
                self.set_output_multiple(int(out_items))
            self._msg_port_syms = {}
            for port in msg_ports:
                sym = pmt.intern(port)
                self.message_port_register_out(sym)
                self._msg_port_syms[port] = sym

        def forecast(self, noutput_items, ninputs):
            need = int(math.ceil(noutput_items / float(rate))) if n_out else quantum
            need = max(quantum, ((need + quantum - 1) // quantum) * quantum)
            return [need] * ninputs

        def _publish(self, msgs):
            for port, payload in msgs.items():
                sym = self._msg_port_syms.get(port)
                if sym is None:
                    continue
                as_np = {k: _to_numpy(v) for k, v in payload.items()} \
                    if isinstance(payload, dict) else _to_numpy(payload)
                self.message_port_pub(sym, pmt.to_pmt(as_np))

        def general_work(self, input_items, output_items):
            if n_in:
                avail = min(len(x) for x in input_items)
                frames = (avail // quantum) * quantum
                if n_out:
                    out_cap = min(len(o) for o in output_items)
                    # largest quantum multiple whose output fits
                    while frames > 0 and int(frames * rate) > out_cap:
                        frames -= quantum
                # bucket to quantum·2^k (bounded retraces — see docstring)
                if frames >= quantum:
                    k = (frames // quantum).bit_length() - 1
                    cap = max(0, max_frames_pow2 - (quantum.bit_length() - 1))
                    frames = quantum * (1 << min(k, cap))
                if frames <= 0:
                    return 0
                ins = [to_device(x[:frames], s)
                       for x, s in zip(input_items, in_sig)]
            else:
                frames = 0
                ins = []
                if block.source_frame is None:
                    raise RuntimeError("source block needs source_frame")
                if output_items and len(output_items[0]) < block.source_frame:
                    return 0
            self._state, outs, msgs = self._blk.apply(self._state, ins)
            self._publish(msgs)
            if n_in:
                self.consume_each(frames)
            if not n_out:
                return 0
            nout = len(_to_numpy(outs[0]).ravel()) if outs else 0
            for o, y in zip(output_items, outs):
                arr = _to_numpy(y).ravel()
                o[:len(arr)] = arr.astype(o.dtype, copy=False)
            return nout

    return _TpuBlock()
