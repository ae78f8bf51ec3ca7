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
    from clenabled_tpu.pipelines import FxPipelineConfig, make_fx_pipeline

    cfg = FxPipelineConfig(num_antennas=4, num_channels=16,
                           samples_per_step=1 << 20)
    fn, (x, hist) = make_fx_pipeline(cfg)

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(x.shape) + 1j * rng.standard_normal(x.shape)
         ).astype(np.complex64)
    x = jax.device_put(x)

    # warmup / compile
    out = fn(x, hist)
    jax.block_until_ready(out)

    iters = 30
    start = time.perf_counter()
    h = hist
    for _ in range(iters):
        fd, xmat, h = fn(x, h)
    jax.block_until_ready((fd, xmat, h))
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
