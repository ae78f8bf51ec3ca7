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


def exact_f32():
    """Context manager forcing exact-f32 matmul sums on TPU.

    TPU MXUs execute f32×f32 matmuls as a SINGLE bf16-operand pass under
    JAX's default matmul precision — measured on this framework's hot
    paths: planar FFT 3.1e-3 rel, overlap-save filter 6.2e-3, fused
    flagship 2.8e-3 versus exact-f32 sums (BENCH_TPU.md round-3 audit).
    That matches the reference's practical accuracy envelope (its OpenCL
    kernels compile with -cl-fast-relaxed-math for the hot modes,
    /root/reference/lib/clXEngine_impl.cc:816) and is the right default
    for throughput.  Wrap accuracy-critical calls in this context to get
    true f32 sums (measured 1.2-1.7e-7 rel) at ~3× the matmul cost::

        with clenabled_tpu.exact_f32():
            out = my_jitted_pipeline(x)     # first call traces here

    The setting binds at TRACE time (it reaches jnp.dot inside Pallas
    kernels too), so wrap the first call of each jitted function — or use
    the per-call ``precision=`` arguments on the fused kernels.
    """
    import jax

    return jax.default_matmul_precision("float32")
