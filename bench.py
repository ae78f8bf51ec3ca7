"""Benchmark: flagship 4-antenna FD-xcorr + channelizer pipeline throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value = sustained per-antenna input sample rate (MSPS) of the full pipeline
(16-ch PFB channelizer ×4 antennas + FD cross-correlators + X-Engine
integration) on one chip.  vs_baseline is measured against the driver's
north-star target of 100 MSPS/chip (BASELINE.json; the reference's best
comparable number is 46 MSPS for the async TD correlator chain on a GTX-class
GPU, README.md:106).

Measurement: steady-state per-step device time via a two-point fit — time
K1 and K2 chained steps (each step's carried tail feeds the next, so the
device serializes them) and take the slope (t2−t1)/(K2−K1).  This removes
the host↔device round-trip constant (~25-40 ms through the remote-TPU
runtime here) that a single end-of-loop sync would smear over the loop:
a production flow dispatches steps continuously and never pays that RTT
per step.  Sync is a tiny scalar readback rather than block_until_ready
(observed to return early on long-lived sessions with this backend).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

NORTH_STAR_MSPS = 100.0


def _sync(out) -> float:
    """Force completion of everything queued before ``out`` via a scalar
    transfer (device execution is in-order, so reading any element of the
    last step's output fences the whole chain)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32).ravel()[:8]))


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
    _sync(out)

    def run(iters: int, hr, hi) -> float:
        t0 = time.perf_counter()
        for _ in range(iters):
            fd, xre, xim, hr, hi = fn(xr, xi, hr, hi)
        _sync((fd, xre, xim))
        return time.perf_counter() - t0

    import statistics

    k1, k2 = 10, 70
    # median-of-5 slopes: robust to the shared TPU's erratic stall phases
    # in BOTH directions (a stall during the K1 run would deflate a single
    # slope and overstate throughput; one during K2 would understate it)
    slopes = []
    for _ in range(5):
        t1 = run(k1, hr, hi)
        t2 = run(k2, hr, hi)
        slopes.append((t2 - t1) / (k2 - k1))
    per_step = statistics.median(slopes)

    sps = cfg.samples_per_step / per_step  # per-antenna samples/s
    msps = sps / 1e6
    print(json.dumps({
        "metric": "fd_xcorr_channelizer_pipeline_4ant",
        "value": round(msps, 2),
        "unit": "MSPS/chip",
        "vs_baseline": round(msps / NORTH_STAR_MSPS, 3),
    }))


if __name__ == "__main__":
    main()
