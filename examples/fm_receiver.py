"""FM receive chain — the role of the reference's per-block test flowgraphs
(examples/test_flowgraphs/OpenCL_Test-*.grc): SignalSource(FM) → LowPass →
QuadratureDemod, streaming over multiple frames with carried filter/demod
state.

Run: python examples/fm_receiver.py
"""

import numpy as np

from clenabled_tpu import blocks
from clenabled_tpu.streaming import Flowgraph


def main():
    fs, frame = 1e6, 8192
    dev, f_audio = 75e3, 5e3
    rng = np.random.default_rng(0)

    lpf = blocks.LowPassFilter(1, 1.0, fs, 150e3, 50e3, use_time=True)
    qd = blocks.QuadratureDemod(fs / (2 * np.pi * dev))
    g = Flowgraph()
    g.external_input(lpf)
    g.connect(lpf, qd)
    tap = g.tap(qd, name="audio")
    r = g.compile(frame_size=frame)

    t_all = np.arange(3 * frame) / fs
    msg = np.sin(2 * np.pi * f_audio * t_all)
    iq = np.exp(1j * 2 * np.pi * dev * np.cumsum(msg) / fs).astype(np.complex64)

    gd = (len(lpf.taps()) - 1) // 2  # FIR group delay in samples
    for i in range(3):
        audio = np.asarray(r.step(iq[i * frame : (i + 1) * frame])[tap])
        lo, hi = i * frame + 100, (i + 1) * frame
        err = np.abs(audio[100:] - msg[lo - gd : hi - gd]).max()
        print(f"frame {i}: recovered audio, max err vs message = {err:.3e} "
              f"(group-delay compensated by {gd} samples)")


if __name__ == "__main__":
    main()
