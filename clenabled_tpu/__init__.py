"""clenabled_tpu — a TPU-native streaming SDR block library.

A brand-new framework with the capabilities of gr-clenabled (ghostop14's
OpenCL-accelerated GNU Radio blocks), designed TPU-first on JAX/XLA + Pallas:

- ``runtime``   — device/mesh core, dtype registry, block-size policy
                  (the role of the reference's GRCLBase runtime,
                  /root/reference/lib/GRCLBase.cpp, reimagined as one shared
                  mesh instead of per-block OpenCL contexts).
- ``dsp``       — pure-functional kernel library: windows, firdes designers,
                  FFT with gr-clenabled's shift/window semantics, overlap-add
                  fast convolution, FIR, polyphase channelizer, demodulators,
                  correlators and the X-Engine — each a jittable function over
                  fixed-shape sample blocks.
- ``streaming`` — the block/flowgraph runtime: explicit carried state
                  (filter tails, loop phase, integration accumulators) in a
                  functional scheduler.
- ``sharding``  — multi-chip layer: shard_map over a Mesh, ppermute halo
                  exchange for filter overlap, all_to_all for the X-Engine.
- ``blocks``    — user-facing named blocks mirroring the reference's API
                  surface (clFFT, clFilter, clXEngine, ...).
- ``tools``     — CLI benchmark/info tools mirroring clview/test-clenabled/...
"""

__version__ = "0.1.0"

from clenabled_tpu.runtime import dtypes  # noqa: F401
