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
    Note this default is LESS accurate than the reference's hot modes:
    its kernels compile with -cl-fast-relaxed-math
    (/root/reference/lib/clXEngine_impl.cc:816), which relaxes FP
    ordering/transcendentals but keeps f32 multiply-adds (~1e-6 class).
    Wrap accuracy-critical calls in this context to get true f32 sums
    (measured 1.2-1.7e-7 rel) at ~3× the matmul cost::

        with clenabled_tpu.exact_f32():
            out = my_jitted_pipeline(x)

    The matmul precision is part of jax.jit's cache key and binds at
    trace/dispatch time, so the context must wrap EVERY call of a jitted
    function, not just the first — a later call outside the context
    silently retraces (or cache-switches) back to the default-precision
    executable.  ``streaming.Runner.step`` does exactly this when a
    precision is configured.  Where wrapping every call is awkward,
    prefer the per-call ``precision=`` arguments on the fused kernels
    (``fx_correlate_streams_v2``, ``pfb_oversampled_fused``,
    ``make_fx_pipeline_fused``) or ``Flowgraph.compile(precision=...)``,
    which bake exactness into the traced function itself.
    """
    import jax

    return jax.default_matmul_precision("float32")
