"""Benchmark: flagship 4-antenna FD-xcorr + channelizer pipeline throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value = sustained per-antenna input sample rate (MSPS) of the full pipeline
(16-ch PFB channelizer ×4 antennas + FD cross-correlators + X-Engine
integration) on one chip.  vs_baseline is measured against the driver's
north-star target of 100 MSPS/chip (BASELINE.json; the reference's best
comparable number is 46 MSPS for the async TD correlator chain on a GTX-class
GPU, README.md:106).
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

NORTH_STAR_MSPS = 100.0


def main() -> None:
    from clenabled_tpu.pipelines import (FxPipelineConfig,
                                         make_fx_pipeline_fused)

    # fully fused planar pipeline: ONE Pallas kernel does PFB -> DFT ->
    # FD xcorr + X-Engine accumulation (identical math to the complex64
    # pipeline — tests/test_planar_pipeline.py, interpret-mode kernel tests)
    cfg = FxPipelineConfig(num_antennas=4, num_channels=16,
                           samples_per_step=1 << 23)
    fn, (xr, xi, hr, hi) = make_fx_pipeline_fused(cfg)

    rng = np.random.default_rng(0)
    xr = jax.device_put(rng.standard_normal(xr.shape).astype(np.float32))
    xi = jax.device_put(rng.standard_normal(xi.shape).astype(np.float32))

    # warmup / compile
    out = fn(xr, xi, hr, hi)
    jax.block_until_ready(out)

    iters = 30
    start = time.perf_counter()
    for _ in range(iters):
        fd, xre, xim, hr, hi = fn(xr, xi, hr, hi)
    jax.block_until_ready((fd, xre, xim, hr, hi))
    elapsed = time.perf_counter() - start

    sps = cfg.samples_per_step * iters / elapsed  # per-antenna samples/s
    msps = sps / 1e6
    print(json.dumps({
        "metric": "fd_xcorr_channelizer_pipeline_4ant",
        "value": round(msps, 2),
        "unit": "MSPS/chip",
        "vs_baseline": round(msps / NORTH_STAR_MSPS, 3),
    }))


if __name__ == "__main__":
    main()
