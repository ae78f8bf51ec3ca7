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
    ap.add_argument("--planar", action="store_true",
                    help="complex-free float32 path (required on axon TPU)")
    ap.add_argument("--batch", type=int, default=1,
                    help="analysis windows per dispatch")
    ap.add_argument("--fft-batch", dest="fft_batch", type=int, default=64,
                    help="FFT vectors per dispatch for the FD correlator")
    ap.add_argument("--block-api", dest="block_api", action="store_true",
                    help="drive the FD correlator through the BLOCK layer "
                    "(XCorrelateFFTVCF + Flowgraph.Runner) instead of the "
                    "dsp functions — the reference's GR-scheduler shape")
    ap.add_argument("--steps-per-dispatch", dest="steps_per_dispatch",
                    default="auto",
                    help="with --block-api: frames per device dispatch "
                    "(int or 'auto'; the round-3 device-side lax.scan)")
    ap.add_argument("--iterations", type=int, default=100)
    args = ap.parse_args()

    from clenabled_tpu.tools import _timing as T
    T.select_platform(args)

    if not args.planar:
        from clenabled_tpu.runtime.device import is_axon

        if is_axon():
            print("axon backend has no complex64: switching to --planar")
            args.planar = True


    import jax
    import numpy as np

    from clenabled_tpu.dsp import xcorr

    n = args.signal_length
    k = args.num_inputs
    it = args.iterations
    print(f"platform: {T.platform_banner()}   inputs: {k}   "
          f"signal_length: {n}   max_search: {args.maxsearch}")

    if args.block_api:
        _block_api_bench(args, T)
        return

    b = max(1, args.batch)
    if not args.fftonly:
        if args.planar:
            sigs = jax.device_put(
                np.stack([T.rand_float(b * n, i).reshape(b, n)
                          for i in range(k)]))
            if b > 1:
                fn = jax.jit(lambda s: xcorr.td_xcorr_batched(s, args.maxsearch))
            else:
                fn = jax.jit(lambda s: xcorr.td_xcorr_planar(s[:, 0],
                                                             args.maxsearch))
            itemsize = 4
        else:
            mk = T.rand_complex if args.input_complex else T.rand_float
            itemsize = 8 if args.input_complex else 4
            sigs = jax.device_put(
                np.stack([mk(b * n, i).reshape(b, n) for i in range(k)]))
            if b > 1:
                fn = jax.jit(lambda s: xcorr.td_xcorr_batched(s, args.maxsearch))
            else:
                fn = jax.jit(lambda s: xcorr.td_xcorr(s[:, 0], args.maxsearch))
        secs = T.time_fn(fn, sigs, iterations=it)
        total = n * k * b
        T.report(f"TD xcorr (batch {b})", total, secs,
                 extra=f"{total * itemsize / secs / 1e9:.2f} GB/s in")

    # batched FD correlator: many FFT vectors per dispatch, exactly as the
    # FdXCorrelate block batches a frame (per-call dispatch over the tunnel
    # ≈ 1 ms, so single-vector timing is pure overhead at small n)
    for b in (1, args.fft_batch):
        if args.planar:
            from clenabled_tpu.dsp import planar

            vecs = planar.PC(
                jax.device_put(np.stack(
                    [T.rand_float(b * n, i).reshape(b, n) for i in range(k)])),
                jax.device_put(np.stack(
                    [T.rand_float(b * n, 50 + i).reshape(b, n)
                     for i in range(k)])))
            fn = jax.jit(lambda r, i2: xcorr.fd_xcorr_planar(planar.PC(r, i2)))
            secs = T.time_fn(fn, vecs.re, vecs.im, iterations=it)
        else:
            vecs = jax.device_put(np.stack(
                [T.rand_complex(b * n, i).reshape(b, n) for i in range(k)]))
            fn = jax.jit(lambda v: xcorr.fd_xcorr(v))
            secs = T.time_fn(fn, vecs, iterations=it)
        total = n * k * b
        T.report(f"FD xcorr (fft_vcf, batch {b})", total, secs,
                 extra=f"{total * 8 / secs / 1e9:.2f} GB/s in")




def _block_api_bench(args, T) -> None:
    """FD correlator through the BLOCK layer: XCorrelateFFTVCF inside a
    Flowgraph Runner, K frames per device dispatch (the round-3
    steps_per_dispatch scan).  This is the reference's GR-scheduler shape:
    its UHD example sustains 30 MSPS at this 8192-pt default
    (examples/fft_xcorr_opencl_uhd2_30MSPS.grc)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from clenabled_tpu import blocks
    from clenabled_tpu.dsp import planar
    from clenabled_tpu.streaming import Flowgraph

    n = args.signal_length
    k = args.num_inputs
    spd = args.steps_per_dispatch
    if spd != "auto":
        spd = int(spd)
    g = Flowgraph()
    xc = blocks.XCorrelateFFTVCF(n, k, accumulate_frames=1)
    for p in range(k):
        g.external_input(xc, p)
    g.tap(xc, name="corr")
    r = g.compile(frame_size=n, steps_per_dispatch=spd)
    kk = r.steps_per_dispatch
    rng = np.random.default_rng(0)
    shape = (kk, n) if kk > 1 else (n,)
    feeds = tuple(
        planar.PC(jnp.asarray(rng.standard_normal(shape).astype(np.float32)),
                  jnp.asarray(rng.standard_normal(shape).astype(np.float32)))
        for _ in range(k))

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf.astype(jnp.float32).ravel()[:8]))

    out = r.step(*feeds)
    sync(out)
    it = max(4, args.iterations // 10)
    t0 = time.perf_counter()
    for _ in range(it):
        out = r.step(*feeds)
    sync(out)
    t1 = time.perf_counter()
    for _ in range(3 * it):
        out = r.step(*feeds)
    sync(out)
    t2 = time.perf_counter()
    per = ((t2 - t1) - (t1 - t0)) / (2 * it)
    T.report(f"FD xcorr BLOCK API (K={kk})", kk * n, per,
             extra=f"{kk * n * 8 * k / per / 1e9:.2f} GB/s in")


if __name__ == "__main__":
    main()
