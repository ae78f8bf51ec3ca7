"""Correlator benchmark — the reference's test-clxcorrelate
(lib/test-clxcorrelate.cc): times the time-domain correlator and (--fftonly)
the frequency-domain block; reports samples/s, bytes/s, bits/s like the
reference (:74, :216)."""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description="cross-correlator benchmark")
    ap.add_argument("--num_inputs", type=int, default=2)
    ap.add_argument("--signal_length", type=int, default=8192)
    ap.add_argument("--maxsearch", type=int, default=512)
    ap.add_argument("--input_complex", action="store_true")
    ap.add_argument("--fftonly", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iterations", type=int, default=100)
    args = ap.parse_args()

    from clenabled_tpu.tools import _timing as T
    T.select_platform(args)

    import jax
    import numpy as np

    from clenabled_tpu.dsp import xcorr

    n = args.signal_length
    k = args.num_inputs
    it = args.iterations
    print(f"platform: {T.platform_banner()}   inputs: {k}   "
          f"signal_length: {n}   max_search: {args.maxsearch}")

    if not args.fftonly:
        if args.input_complex:
            sigs = np.stack([T.rand_complex(n, i) for i in range(k)])
            itemsize = 8
        else:
            sigs = np.stack([T.rand_float(n, i) for i in range(k)])
            itemsize = 4
        sigs = jax.device_put(sigs)
        fn = jax.jit(lambda s: xcorr.td_xcorr(s, args.maxsearch))
        secs = T.time_fn(fn, sigs, iterations=it)
        total = n * k
        T.report("TD xcorr", total, secs,
                 extra=f"{total * itemsize / secs / 1e9:.2f} GB/s in")

    vecs = jax.device_put(np.stack([T.rand_complex(n, i) for i in range(k)]))
    fn = jax.jit(lambda v: xcorr.fd_xcorr(v))
    secs = T.time_fn(fn, vecs, iterations=it)
    total = n * k
    T.report("FD xcorr (fft_vcf)", total, secs,
             extra=f"{total * 8 / secs / 1e9:.2f} GB/s in")


if __name__ == "__main__":
    main()
