"""Host→device ingest pipeline for sustained streaming.

The reference's answer to host-feed overlap is pinned double buffers + a
worker thread (clXEngine_impl.cc:325-366, 1234-1299): work() memcpys into
buffer B while the GPU correlates buffer A.  The TPU-native equivalent:

  * frames are uploaded with ``jax.device_put`` from a PREFETCH THREAD while
    the device computes the previous step (JAX dispatch is asynchronous, so
    the main thread never blocks on compute);
  * the jitted step consumes the device-resident frame directly — the fused
    v2 kernel (pallas_kernels.fx_correlate_streams_v2) reads it from HBM
    with no host-side concat, so each sample crosses the host↔device link
    exactly once and HBM exactly once;
  * carried state (stream tails, accumulators) never leaves the device;
  * only the (tiny) per-step products are fetched back, every ``fetch_every``
    steps.

Narrow ingest dtypes (bfloat16, int8 — the reference's IChar mode) halve or
quarter the link traffic, which is the end-to-end bottleneck: on a directly
attached TPU host the PCIe link runs tens of GB/s; through this
development environment's network tunnel h2d measures ~0.15 GB/s, which
caps TRUE end-to-end ingest regardless of kernel speed (see BENCH_TPU.md
"host ingest" — bench device-side and link-side separately and believe the
min).
"""

from __future__ import annotations

import threading
import time
from queue import Queue
from typing import Any, Callable, Iterable

import jax


class HostIngestStats(dict):
    @property
    def msps(self) -> float:
        return self["samples"] / self["wall_s"] / 1e6 if self["wall_s"] else 0.0


class HostIngest:
    """Double-buffered host-feed driver.

    Args:
      step_fn: jitted ``(carry, *frame_arrays) -> (carry, outputs)``.
      init_carry: initial device-resident carry pytree.
      samples_per_frame: per-step input samples (for throughput accounting).
      prefetch: frames uploaded ahead of compute (2 = classic double buffer).
      fetch_every: pull ``outputs`` to host every N steps (0 = never, only
        at close); outputs are assumed SMALL (correlation products, not
        streams).
    """

    def __init__(self, step_fn: Callable, init_carry: Any,
                 samples_per_frame: int, prefetch: int = 2,
                 fetch_every: int = 0):
        self._step = step_fn
        self._carry = init_carry
        self._n = samples_per_frame
        self._prefetch = max(1, prefetch)
        self._fetch_every = fetch_every
        self._dev = jax.devices()[0]

    def run(self, frames: Iterable, n_steps: int | None = None,
            on_outputs: Callable | None = None) -> HostIngestStats:
        """Drive the pipeline over an iterable of host frame tuples.

        Each item is a tuple of numpy arrays passed to step_fn after the
        carry.  Returns sustained-throughput stats (wall time measured
        around the WHOLE pipeline, host feed included)."""
        q: Queue = Queue(maxsize=self._prefetch)
        stop = object()

        def uploader():
            for i, f in enumerate(frames):
                if n_steps is not None and i >= n_steps:
                    break
                if not isinstance(f, tuple):
                    f = (f,)
                q.put(tuple(jax.device_put(x, self._dev) for x in f))
            q.put(stop)

        th = threading.Thread(target=uploader, daemon=True)
        t0 = time.perf_counter()
        th.start()
        steps = 0
        outputs = None
        while True:
            item = q.get()
            if item is stop:
                break
            self._carry, outputs = self._step(self._carry, *item)
            steps += 1
            if self._fetch_every and steps % self._fetch_every == 0:
                fetched = jax.tree.map(lambda x: jax.device_get(x), outputs)
                if on_outputs is not None:
                    on_outputs(steps, fetched)
        if outputs is not None:
            jax.block_until_ready(outputs)
        wall = time.perf_counter() - t0
        th.join()
        return HostIngestStats(steps=steps, wall_s=wall,
                               samples=steps * self._n)
