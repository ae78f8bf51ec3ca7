"""Max-rate correlator throughput demo — the reference's
examples/xcorr_test_max_rate_no_ui.grc (46 MSPS sustained on a GTX-class
GPU, README.md:106): no UI, just the correlator chain pushed as fast as the
device goes.

Run: python examples/xcorr_max_rate.py [--frames 50]
"""

import argparse
import time

import jax
import numpy as np

from clenabled_tpu.dsp import xcorr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--signal_length", type=int, default=1 << 18)
    ap.add_argument("--max_search", type=int, default=512)
    args = ap.parse_args()

    n = args.signal_length
    rng = np.random.default_rng(0)
    sigs = jax.device_put(rng.standard_normal((2, n)).astype(np.float32))
    fn = jax.jit(lambda s: xcorr.td_xcorr(s, args.max_search))
    out = fn(sigs)
    jax.block_until_ready(out)

    start = time.perf_counter()
    for _ in range(args.frames):
        out = fn(sigs)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start
    msps = n * args.frames / elapsed / 1e6
    print(f"TD correlator: {msps:.1f} MSPS sustained "
          f"({args.frames} frames of {n} samples, ±{args.max_search} lags; "
          f"reference demo: 46 MSPS)")


if __name__ == "__main__":
    main()
