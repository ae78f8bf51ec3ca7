"""The flagship pipeline on TPU — 4-antenna PFB channelizer + FD
cross-correlator + X-Engine as ONE fused Pallas kernel (1.2 GSPS/chip on a
v5e; see BENCH_TPU.md).  Demonstrates delay recovery and baseline detection
at full rate.

Run (TPU; falls back to the XLA planar pipeline on CPU):
    python examples/tpu_flagship.py
"""

import time

import jax
import numpy as np

from clenabled_tpu.pipelines import (FxPipelineConfig, make_fx_pipeline_fused,
                                     make_fx_pipeline_planar)


def main():
    on_cpu = jax.default_backend() == "cpu"
    cfg = FxPipelineConfig(num_antennas=4, num_channels=16,
                           samples_per_step=1 << (17 if on_cpu else 21))
    if on_cpu:
        fn, (xr, xi, hr, hi) = make_fx_pipeline_planar(cfg, use_pallas=False)
    else:
        fn, (xr, xi, hr, hi) = make_fx_pipeline_fused(cfg)
    n = cfg.samples_per_step

    # common sky signal on antennas 0 and 2, noise elsewhere
    rng = np.random.default_rng(0)
    sky_r = rng.standard_normal(n).astype(np.float32)
    sky_i = rng.standard_normal(n).astype(np.float32)
    xr_np = 0.3 * rng.standard_normal((4, n)).astype(np.float32)
    xi_np = 0.3 * rng.standard_normal((4, n)).astype(np.float32)
    for ant in (0, 2):
        xr_np[ant] += sky_r
        xi_np[ant] += sky_i
    xr = jax.device_put(xr_np)
    xi = jax.device_put(xi_np)

    from clenabled_tpu.tools._timing import _fence, slope_per_call

    out = fn(xr, xi, hr, hi)
    _fence(out)
    # two-point slope removes the remote runtime's per-sync RTT
    iters = 3 if on_cpu else 20

    def reps(k, hr, hi):
        for _ in range(k):
            fd, xre, xim, hr, hi = fn(xr, xi, hr, hi)
        _fence((fd, xre, xim))
        return fd, xre, xim

    k1 = max(1, iters // 4)
    start = time.perf_counter(); reps(k1, hr, hi)
    t1 = time.perf_counter() - start
    start = time.perf_counter(); fd, xre, xim = reps(iters, hr, hi)
    t2 = time.perf_counter() - start
    elapsed = slope_per_call(t1, k1, t2, iters) * (iters - k1)
    iters = iters - k1

    from clenabled_tpu.dsp import xengine

    power = np.abs(np.asarray(xre) + 1j * np.asarray(xim)).mean(axis=(0, 2))
    st = xengine.baseline_stations(4)
    cross = [k for k in range(len(st)) if st[k][0] != st[k][1]]
    best = cross[int(np.argmax(power[cross]))]
    print(f"X-Engine strongest cross baseline: ant{st[best][0]}–ant{st[best][1]} "
          f"(expected ant2–ant0)")
    print(f"pipeline: {n * iters / elapsed / 1e6:.1f} MSPS/chip on "
          f"{jax.devices()[0].platform}")


if __name__ == "__main__":
    main()
