"""Time-domain cross-correlation demo — the reference's
examples/xcorr_test_opencl.grc: a common wideband signal received on two
paths with a controlled delay; the correlator recovers the delay via the
"corr" message port.

Run: python examples/xcorr_test.py [--delay 37]
"""

import argparse

import numpy as np

from clenabled_tpu import blocks
from clenabled_tpu.streaming import Flowgraph


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--delay", type=int, default=37)
    ap.add_argument("--frames", type=int, default=4)
    args = ap.parse_args()

    fs, frame = 2.4e6, 8192
    rng = np.random.default_rng(0)
    # wideband "sky" signal + independent receiver noise
    n_total = frame * (args.frames + 1)
    sky = (rng.standard_normal(n_total) + 1j * rng.standard_normal(n_total)
           ).astype(np.complex64)

    lpf0 = blocks.LowPassFilter(1, 1.0, fs, 300e3, 100e3, use_time=True)
    lpf1 = blocks.LowPassFilter(1, 1.0, fs, 300e3, 100e3, use_time=True)
    xc = blocks.XCorrelate(2, signal_length=frame, max_search_index=512)
    g = Flowgraph()
    g.external_input(lpf0)
    g.external_input(lpf1)
    g.connect(lpf0, xc, dst_port=0)
    g.connect(lpf1, xc, dst_port=1)
    r = g.compile(frame_size=frame)
    r.on_message("xcorr.corr", lambda m: print(
        f"  corr={float(np.asarray(m['corr'])[0]):.3f}  "
        f"lag={int(np.asarray(m['corrective_lags'])[0])} "
        f"(true delay {args.delay})"))

    for i in range(args.frames):
        base = 512 + i * frame
        a = sky[base : base + frame]
        b = sky[base - args.delay : base - args.delay + frame]
        noise = 0.3 * (rng.standard_normal((2, frame))
                       + 1j * rng.standard_normal((2, frame))).astype(np.complex64)
        print(f"frame {i}:")
        r.step(a + noise[0], b + noise[1])


if __name__ == "__main__":
    main()
