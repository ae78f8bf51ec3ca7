"""Sharded == sequential: the halo-exchange filters and the all_to_all
X-Engine must reproduce single-device results on the 8-device CPU mesh."""

import numpy as np
import pytest

from clenabled_tpu.dsp import fft_filter, fir_filter, firdes, channelizer, xengine
from clenabled_tpu.sharding import (
    make_mesh,
    make_sharded_fft_filter,
    make_sharded_fir_filter,
    make_sharded_channelizer,
    make_sharded_xengine,
    sharded_xengine,
)

RNG = np.random.default_rng(31)


def cplx(*shape):
    return (RNG.standard_normal(shape) + 1j * RNG.standard_normal(shape)).astype(
        np.complex64
    )


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.shape["shard"] == 8


def test_sharded_fir_matches_sequential():
    mesh = make_mesh()
    taps = firdes.low_pass(1.0, 1e6, 100e3, 50e3)
    init_s, apply_s = make_sharded_fir_filter(taps, mesh)
    init_q, apply_q = fir_filter.make_fir_filter(taps)
    n = 8 * 512
    state_s, state_q = init_s(), init_q()
    for frame_i in range(3):
        x = cplx(n)
        state_s, ys = apply_s(state_s, x)
        state_q, yq = apply_q(state_q, x)
        np.testing.assert_allclose(np.asarray(ys), np.asarray(yq),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"frame {frame_i}")


def test_sharded_fir_with_decimation():
    mesh = make_mesh()
    taps = firdes.low_pass(1.0, 1e6, 50e3, 25e3)
    init_s, apply_s = make_sharded_fir_filter(taps, mesh, decimation=4)
    init_q, apply_q = fir_filter.make_fir_filter(taps, decimation=4)
    n = 8 * 1024
    x = cplx(n)
    _, ys = apply_s(init_s(), x)
    _, yq = apply_q(init_q(), x)
    assert ys.shape == (n // 4,)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(yq), rtol=1e-5, atol=1e-5)


def test_sharded_ofa_matches_sequential():
    mesh = make_mesh()
    taps = firdes.root_raised_cosine(1.0, 10e6, 1e6, 0.22, 241)
    init_s, apply_s, plan = make_sharded_fft_filter(taps, mesh)
    init_q, apply_q, _ = fft_filter.make_fft_filter(taps)
    n = 8 * plan.nsamples * 4  # per-shard: 4 chunks
    state_s, state_q = init_s(), init_q()
    for frame_i in range(3):
        x = cplx(n)
        state_s, ys = apply_s(state_s, x)
        state_q, yq = apply_q(state_q, x)
        np.testing.assert_allclose(np.asarray(ys), np.asarray(yq),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"frame {frame_i}")


def test_sharded_ofa_bad_block_raises():
    mesh = make_mesh()
    taps = firdes.low_pass(1.0, 1e6, 100e3, 20e3)
    init_s, apply_s, plan = make_sharded_fft_filter(taps, mesh)
    with pytest.raises(ValueError):
        apply_s(init_s(), cplx(8 * (plan.nsamples + 1)))


@pytest.mark.parametrize("m,r", [(8, 8), (8, 4)])
def test_sharded_channelizer_matches_sequential(m, r):
    mesh = make_mesh()
    taps = firdes.low_pass(1.0, float(m), 0.5, 0.25)
    init_s, apply_s = make_sharded_channelizer(taps, m, r, list(range(m)), mesh)
    init_q, apply_q = channelizer.make_channelizer(taps, m, r, list(range(m)))
    n = 8 * 16 * m
    state_s, state_q = init_s(), init_q()
    for frame_i in range(2):
        x = cplx(n)
        state_s, ys = apply_s(state_s, x)
        state_q, yq = apply_q(state_q, x)
        np.testing.assert_allclose(np.asarray(ys), np.asarray(yq),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"frame {frame_i}")


def test_sharded_xengine_matches_sequential():
    mesh = make_mesh()
    t, s, f, p = 16, 8, 16, 2
    z = cplx(t, s, f, p)
    got = np.asarray(sharded_xengine(z, mesh))
    want = np.asarray(xengine.xengine_correlate(z, npol=p))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sharded_xengine_streaming_pipeline():
    mesh = make_mesh()
    t, s, f, p = 8, 8, 8, 2
    init_s, apply_s = make_sharded_xengine(s, f, p, t, mesh,
                                           pipeline_integration=2)
    init_q, apply_q = xengine.make_xengine(s, f, p, t, pipeline_integration=2)
    state_s, state_q = init_s(), init_q()
    for i in range(2):
        z = cplx(t, s, f, p)
        state_s, (out_s, ready_s) = apply_s(state_s, z)
        state_q, (out_q, ready_q) = apply_q(state_q, z)
        assert bool(ready_s) == bool(ready_q) == (i == 1)
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_q),
                                   rtol=1e-4, atol=1e-4)


def test_sharded_xengine_validates_divisibility():
    mesh = make_mesh()
    with pytest.raises(ValueError):
        sharded_xengine(cplx(4, 6, 16, 2), mesh)  # 6 stations !% 8


def test_sharded_planar_ofa_matches_sequential():
    from clenabled_tpu.dsp import planar
    from clenabled_tpu.sharding import make_sharded_fft_filter_planar

    mesh = make_mesh()
    taps = firdes.root_raised_cosine(1.0, 10e6, 1e6, 0.22, 241)
    init_s, apply_s = make_sharded_fft_filter_planar(taps, mesh)
    init_q, apply_q, plan = fft_filter.make_fft_filter(taps)
    n = 8 * plan.nsamples * 2
    state_s, state_q = init_s(), init_q()
    for i in range(2):
        x = cplx(n)
        state_s, ys = apply_s(state_s, planar.from_complex(x))
        state_q, yq = apply_q(state_q, x)
        got = np.asarray(ys.re) + 1j * np.asarray(ys.im)
        np.testing.assert_allclose(got, np.asarray(yq), rtol=1e-3, atol=1e-3,
                                   err_msg=f"frame {i}")


def test_sharded_planar_xengine_matches():
    from clenabled_tpu.dsp import planar
    from clenabled_tpu.sharding import sharded_xengine_planar

    mesh = make_mesh()
    t, s, f, p = 8, 8, 16, 2
    z = cplx(t, s, f, p)
    got_pc = sharded_xengine_planar(planar.from_complex(z), mesh, npol=p)
    got = np.asarray(got_pc.re) + 1j * np.asarray(got_pc.im)
    want = np.asarray(xengine.xengine_correlate(z, npol=p))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sharded_planar_channelizer_matches_sequential():
    from clenabled_tpu.dsp import planar
    from clenabled_tpu.sharding import make_sharded_channelizer_planar

    mesh = make_mesh()
    m, r = 8, 4
    taps = firdes.low_pass(1.0, float(m), 0.5, 0.25)
    init_s, apply_s = make_sharded_channelizer_planar(
        taps, m, r, list(range(m)), mesh)
    init_q, apply_q = channelizer.make_channelizer(taps, m, r, list(range(m)))
    n = 8 * 16 * m
    state_s, state_q = init_s(), init_q()
    for i in range(2):
        x = cplx(n)
        state_s, ys = apply_s(state_s, planar.from_complex(x))
        state_q, yq = apply_q(state_q, x)
        got = np.asarray(ys.re) + 1j * np.asarray(ys.im)
        np.testing.assert_allclose(got, np.asarray(yq), rtol=1e-3, atol=1e-3,
                                   err_msg=f"frame {i}")


def test_sharded_chain_matches_sequential_flowgraph():
    """ShardedChain(LPF -> scale -> quad demod) == the sequential chain."""
    from clenabled_tpu.sharding import ShardedChain
    from clenabled_tpu.dsp import demod as dsp_demod

    mesh = make_mesh()
    taps = firdes.low_pass(1.0, 1e6, 100e3, 20e3)
    chain = (ShardedChain(mesh)
             .add_fft_filter(taps)
             .add_map(lambda x: x * 2.0)
             .add_quadrature_demod(0.7))
    init, step = chain.compile()

    # sequential reference
    iq, aq, plan = fft_filter.make_fft_filter(taps)
    n = 8 * plan.nsamples * 2
    state_s = init()
    state_f = iq()
    last = None
    for i in range(3):
        x = cplx(n)
        state_s, ys = step(state_s, x)
        state_f, yf = aq(state_f, x)
        yf = np.asarray(yf) * 2.0
        yq, last = dsp_demod.quadrature_demod(yf, 0.7, last_sample=last)
        np.testing.assert_allclose(np.asarray(ys), np.asarray(yq),
                                   rtol=1e-3, atol=1e-3,
                                   err_msg=f"frame {i}")


def test_sharded_chain_with_channelizer():
    from clenabled_tpu.sharding import ShardedChain

    mesh = make_mesh()
    m = 8
    proto = firdes.low_pass(1.0, float(m), 0.5, 0.25)
    chain = ShardedChain(mesh).add_channelizer(proto, m, m, list(range(m)))
    init, step = chain.compile()
    n = 8 * 16 * m
    x = cplx(n)
    _, out = step(init(), x)
    iq, aq = channelizer.make_channelizer(proto, m, m, list(range(m)))
    _, want = aq(iq(), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_sharded_fused_flagship_matches_single_device():
    """The multi-chip fused flagship (fx_correlate_streams_v2 per time
    shard, ring-ppermute tails, psum accumulators) must reproduce the
    single-device fused step over the concatenated stream — two steps, so
    the carried global tail crosses both the shard ring and the step
    boundary."""
    import jax.numpy as jnp

    from clenabled_tpu.dsp import pallas_kernels
    from clenabled_tpu.pipelines import (FxPipelineConfig,
                                         make_sharded_fx_pipeline_fused)

    mesh = make_mesh()
    d = mesh.shape["shard"]
    a, m = 2, 16
    n_local = 1024          # per-shard samples (tile_rows degrades to 8)
    cfg = FxPipelineConfig(num_antennas=a, num_channels=m,
                           samples_per_step=n_local)
    fn, (xr0, xi0, tr0, ti0) = make_sharded_fx_pipeline_fused(
        mesh, cfg=cfg, interpret=True)
    n = n_local * d
    xr = RNG.standard_normal((2, a, n)).astype(np.float32)
    xi = RNG.standard_normal((2, a, n)).astype(np.float32)

    tr, ti = tr0, ti0
    got = []
    for k in range(2):
        fd, xre, xim, tr, ti = fn(xr[k], xi[k], tr, ti)
        got.append((np.asarray(fd), np.asarray(xre), np.asarray(xim)))

    # single-device reference: same kernel over the whole stream per step
    from clenabled_tpu.dsp import channelizer as C, firdes
    proto = firdes.low_pass(1.0, 100e6, 100e6 / (2 * m) * 0.8,
                            100e6 / (2 * m) * 0.2)
    proto = np.concatenate([proto, np.zeros((-len(proto)) % m, np.float32)])
    taps_rm, _ = C._pfb_constants(proto, m, m)
    tail_len = pallas_kernels.fx_tail_len(jnp.float32)
    str_, sti = (np.zeros((a, tail_len), np.float32),) * 2
    for k in range(2):
        fd_sum, gram = pallas_kernels.fx_correlate_streams_v2(
            xr[k], xi[k], str_, sti, np.asarray(taps_rm), a, m, tile_rows=8,
            interpret=True)
        str_, sti = xr[k][:, n - tail_len:], xi[k][:, n - tail_len:]
        fd = np.roll(np.asarray(fd_sum) / (n // m), m // 2, axis=-1)
        want_re = np.asarray(gram)[:, :m].T[:, :, None]
        want_im = np.asarray(gram)[:, m:].T[:, :, None]
        scale = max(np.abs(want_re).max(), 1e-9)
        np.testing.assert_allclose(got[k][0], fd, rtol=1e-4,
                                   atol=1e-4 * np.abs(fd).max())
        np.testing.assert_allclose(got[k][1], want_re, rtol=1e-4,
                                   atol=1e-4 * scale)
        np.testing.assert_allclose(got[k][2], want_im, rtol=1e-4,
                                   atol=1e-4 * scale)


@pytest.mark.parametrize("dt_name", ["int8", "bfloat16"])
def test_sharded_fused_flagship_narrow_ingest(dt_name):
    """Multi-chip fused flagship with bf16/int8 ingest (the reference's
    IChar path, lib/clXEngine_impl.cc:831-858) == the single-device v2
    kernel in the same dtype — the int8 leg exercises the bf16-MXU +
    banded-matmul branch stage across the shard ring."""
    import jax.numpy as jnp

    from clenabled_tpu.dsp import pallas_kernels
    from clenabled_tpu.dsp import channelizer as C, firdes
    from clenabled_tpu.pipelines import (FxPipelineConfig,
                                         make_sharded_fx_pipeline_fused)

    dt = jnp.dtype(dt_name)
    mesh = make_mesh()
    d = mesh.shape["shard"]
    a, m = 2, 16
    n_local = pallas_kernels.fx_tail_len(dt)
    cfg = FxPipelineConfig(num_antennas=a, num_channels=m,
                           samples_per_step=n_local)
    fn, (xr0, xi0, tr0, ti0) = make_sharded_fx_pipeline_fused(
        mesh, cfg=cfg, in_dtype=dt, interpret=True)
    n = n_local * d
    rng = np.random.default_rng(5)
    if dt == jnp.int8:
        xr = rng.integers(-16, 17, (a, n)).astype(np.int8)
        xi = rng.integers(-16, 17, (a, n)).astype(np.int8)
    else:
        xr = rng.standard_normal((a, n)).astype(np.float32).astype(dt_name)
        xi = rng.standard_normal((a, n)).astype(np.float32).astype(dt_name)

    fd, xre, xim, _, _ = fn(jnp.asarray(xr), jnp.asarray(xi), tr0, ti0)

    proto = firdes.low_pass(1.0, 100e6, 100e6 / (2 * m) * 0.8,
                            100e6 / (2 * m) * 0.2)
    proto = np.concatenate([proto, np.zeros((-len(proto)) % m, np.float32)])
    taps_rm, _ = C._pfb_constants(proto, m, m)
    tail_len = pallas_kernels.fx_tail_len(dt)
    tr = np.zeros((a, tail_len), dt_name)
    fd_sum, gram = pallas_kernels.fx_correlate_streams_v2(
        jnp.asarray(xr), jnp.asarray(xi), jnp.asarray(tr), jnp.asarray(tr),
        np.asarray(taps_rm), a, m, tile_rows=tail_len // 128, interpret=True)
    want_fd = np.roll(np.asarray(fd_sum) / (n // m), m // 2, axis=-1)
    want_re = np.asarray(gram)[:, :m].T[:, :, None]
    want_im = np.asarray(gram)[:, m:].T[:, :, None]
    scale = max(np.abs(want_re).max(), 1e-9)
    np.testing.assert_allclose(
        np.asarray(fd), want_fd, rtol=1e-3, atol=1e-3 * np.abs(want_fd).max())
    np.testing.assert_allclose(np.asarray(xre), want_re, rtol=1e-3,
                               atol=1e-3 * scale)
    np.testing.assert_allclose(np.asarray(xim), want_im, rtol=1e-3,
                               atol=1e-3 * scale)


@pytest.mark.parametrize("dt_name", ["float32", "int8"])
def test_sharded_stacked_xengine_matches_single_device(dt_name):
    """make_sharded_xengine_stacked (all_to_all lane->channel re-shard +
    per-chip stacked Gram) == the unsharded stacked engine, including
    pipeline-integration emission and int8 exact accumulation."""
    import jax.numpy as jnp

    from clenabled_tpu.sharding import make_sharded_xengine_stacked

    mesh = make_mesh()
    d = mesh.shape["shard"]
    s, p, f, t = 2 * d, 2, 2 * d, 16
    sp = s * p
    rng = np.random.default_rng(3)
    scale = 1.0 / (127.0 * 127.0) if dt_name == "int8" else 1.0
    init_s, apply_s = make_sharded_xengine_stacked(
        s, f, p, t, mesh, pipeline_integration=2, scale=scale)
    init_q, apply_q = xengine.make_xengine_channel_major(
        s, f, p, t, pipeline_integration=2, scale=scale)
    st_s, st_q = init_s(), init_q()
    for k in range(4):
        if dt_name == "int8":
            zr = rng.integers(-127, 128, (f, t, sp)).astype(np.int8)
            zi = rng.integers(-127, 128, (f, t, sp)).astype(np.int8)
        else:
            zr = rng.standard_normal((f, t, sp)).astype(np.float32)
            zi = rng.standard_normal((f, t, sp)).astype(np.float32)
        st_s, (out_s, ready_s) = apply_s(st_s, (jnp.asarray(zr),
                                                jnp.asarray(zi)))
        st_q, (out_q, ready_q) = apply_q(st_q, (jnp.asarray(zr),
                                                jnp.asarray(zi)))
        assert bool(ready_s) == bool(ready_q) == (k % 2 == 1)
        np.testing.assert_allclose(np.asarray(out_s.re), np.asarray(out_q.re),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out_s.im), np.asarray(out_q.im),
                                   rtol=1e-5, atol=1e-4)


def test_sharded_fused_oversampled_matches_streaming():
    """Time-sharded fused OS-PFB kernel (ring-ppermute OS_TAIL_LEN halo)
    == the single-chip streaming kernel on the concatenated stream, across
    2 frames (carried cross-frame state through the ring)."""
    import jax
    from jax.sharding import Mesh

    from clenabled_tpu.dsp import channelizer, firdes, pallas_kernels, planar
    from clenabled_tpu.sharding import (
        make_sharded_channelizer_fused_oversampled)

    m, r = 16, 8
    taps = firdes.low_pass(1.0, float(m), 0.5, 0.25)
    taps = np.concatenate([taps, np.zeros((-len(taps)) % m, np.float32)])
    d = 4
    mesh = Mesh(np.array(jax.devices()[:d]), ("shard",))
    local = 2048
    n = d * local
    rng = np.random.default_rng(3)

    init_s, apply_s = make_sharded_channelizer_fused_oversampled(
        taps, m, r, mesh)
    init_1, apply_1 = channelizer.make_channelizer_fused_oversampled(
        taps, m, r, list(range(m)), interpret=True)

    st_s = init_s()
    st_1 = init_1()
    for frame in range(2):
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
             ).astype(np.complex64)
        fr = planar.PC(np.real(x).astype(np.float32),
                       np.imag(x).astype(np.float32))
        st_s, out_s = apply_s(st_s, fr)
        st_1, out_1 = apply_1(st_1, fr)
        got = np.asarray(out_s.re) + 1j * np.asarray(out_s.im)
        want = (np.asarray(out_1.re) + 1j * np.asarray(out_1.im))
        np.testing.assert_allclose(got.reshape(want.shape), want,
                                   atol=1e-3 * max(1.0, np.abs(want).max()),
                                   err_msg=f"frame {frame}")


def test_sharded_costas_channels_matches_single_chip():
    """Channel-parallel chunked Costas over the mesh == the same chunked
    loop run per channel on one device (no cross-chip math in the path)."""
    import jax
    from jax.sharding import Mesh

    from clenabled_tpu.dsp import demod, planar
    from clenabled_tpu.sharding import make_sharded_costas_channels

    d, c, n = 4, 8, 2048
    chunk, warmup = 512, 256
    mesh = Mesh(np.array(jax.devices()[:d]), ("shard",))
    rng = np.random.default_rng(4)
    ph = 0.004 * np.arange(n)[None, :] + rng.uniform(0, 6, (c, 1))
    x = planar.PC(np.cos(ph).astype(np.float32),
                  np.sin(ph).astype(np.float32))

    init_s, apply_s = make_sharded_costas_channels(
        0.02, 2, mesh, chunk=chunk, warmup=warmup)
    st = init_s(c)
    st, out, diag = apply_s(st, x)

    run1 = demod.make_costas_loop_chunked(0.02, 2, chunk=chunk,
                                          warmup=warmup)
    for ch in range(c):
        s1 = run1.init_state()
        s1, o1, d1 = run1(s1, planar.PC(x.re[ch], x.im[ch]))
        np.testing.assert_array_equal(np.asarray(out.re)[ch],
                                      np.asarray(o1.re))
        np.testing.assert_array_equal(np.asarray(out.im)[ch],
                                      np.asarray(o1.im))
        np.testing.assert_allclose(float(np.asarray(diag["residual"])[ch]),
                                   float(d1["residual"]), rtol=1e-6, atol=0)


def test_sharded_fused_oversampled_deep_halo():
    """Sharded fused OS-PFB with a deep (os_tail_len > default) halo:
    ring-ppermute exchanges the longer tail; parity vs single-chip."""
    import jax
    from jax.sharding import Mesh

    from clenabled_tpu.dsp import channelizer, firdes, pallas_kernels, planar
    from clenabled_tpu.sharding import (
        make_sharded_channelizer_fused_oversampled)

    m, r = 64, 16
    # 0.08 transition → ~1984 taps (nq=16): deep but inside the real
    # chip's scoped-VMEM const envelope (round 5 — the old 0.04/3904-tap
    # config only ever compiled in interpret mode)
    taps = firdes.low_pass(1.0, float(m), 0.5, 0.08)
    taps = np.concatenate([taps, np.zeros((-len(taps)) % m, np.float32)])
    assert pallas_kernels.os_tail_len(m, r, len(taps)) > \
        pallas_kernels.OS_TAIL_LEN
    d = 2
    mesh = Mesh(np.array(jax.devices()[:d]), ("shard",))
    local = 4096
    n = d * local
    rng = np.random.default_rng(8)
    init_s, apply_s = make_sharded_channelizer_fused_oversampled(
        taps, m, r, mesh)
    init_1, apply_1 = channelizer.make_channelizer_fused_oversampled(
        taps, m, r, list(range(m)), interpret=True)
    st_s, st_1 = init_s(), init_1()
    for frame in range(2):
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
             ).astype(np.complex64)
        fr = planar.PC(np.real(x).astype(np.float32),
                       np.imag(x).astype(np.float32))
        st_s, out_s = apply_s(st_s, fr)
        st_1, out_1 = apply_1(st_1, fr)
        got = np.asarray(out_s.re) + 1j * np.asarray(out_s.im)
        want = np.asarray(out_1.re) + 1j * np.asarray(out_1.im)
        np.testing.assert_allclose(got.reshape(want.shape), want,
                                   atol=1e-3 * max(1.0, np.abs(want).max()),
                                   err_msg=f"frame {frame}")


def test_sharded_xengine_stacked_pallas_route():
    """The sharded stacked X-Engine must support the round-3 Pallas Gram
    kernel INSIDE its shard_map (on a real TPU mesh the auto-route picks
    it whenever S·P is a multiple of 128) — forced here on the CPU mesh
    via interpret mode; integer-exact vs the einsum route."""
    import jax
    from jax.sharding import Mesh

    import jax.numpy as jnp

    from clenabled_tpu.sharding import make_sharded_xengine_stacked

    d = 2
    mesh = Mesh(np.array(jax.devices()[:d]), ("shard",))
    s, p, f, t = 64, 2, 4, 128   # S·P = 128 → pallas-eligible
    rng = np.random.default_rng(6)
    q = rng.integers(-31, 32, (2, f, t, s * p))
    zr = jnp.asarray(q[0], jnp.int8)
    zi = jnp.asarray(q[1], jnp.int8)

    outs = {}
    for up in (False, True):
        init, apply = make_sharded_xengine_stacked(
            s, f, p, t, mesh, scale=1.0, use_pallas=up)
        st = init()
        st, (out, ready) = apply(st, (zr, zi))
        assert bool(np.asarray(ready))
        outs[up] = (np.asarray(out.re), np.asarray(out.im))
    np.testing.assert_array_equal(outs[True][0], outs[False][0])
    np.testing.assert_array_equal(outs[True][1], outs[False][1])


def test_sharded_ofs_pallas_matches_xla_overlap_add():
    """Round 3: the sharded planar filter can route per-shard work through
    the fused Pallas OFS kernel (input-tail ring halo) — identical output
    samples to the XLA overlap-add sharded path across frames, for
    decimation 1 and 2."""
    import jax
    from jax.sharding import Mesh

    from clenabled_tpu.dsp import firdes, planar
    from clenabled_tpu.sharding import make_sharded_fft_filter_planar

    taps = firdes.low_pass(1.0, 1e6, 100e3, 50e3)
    d = 4
    mesh = Mesh(np.array(jax.devices()[:d]), ("shard",))
    rng = np.random.default_rng(10)
    for decim in (1, 2):
        init_p, apply_p = make_sharded_fft_filter_planar(
            taps, mesh, decimation=decim, use_pallas=True)
        init_x, apply_x = make_sharded_fft_filter_planar(
            taps, mesh, decimation=decim, use_pallas=False)
        # per-shard block: common multiple of both paths' quanta
        from clenabled_tpu.dsp import fft_filter, pallas_kernels

        oplan = pallas_kernels.OfsPlan(taps)
        oplan.decimation = decim
        import math
        local = math.lcm(fft_filter.frame_quantum(oplan),
                         fft_filter.plan_fft_filter(taps).nsamples, decim)
        local *= max(1, 2048 // local)
        n = d * local
        sp, sx = init_p(), init_x()
        for frame in range(2):
            x = rng.standard_normal(n).astype(np.float32)
            xi = rng.standard_normal(n).astype(np.float32)
            fr = planar.PC(x, xi)
            sp, yp = apply_p(sp, fr)
            sx, yx = apply_x(sx, fr)
            np.testing.assert_allclose(
                np.asarray(yp.re), np.asarray(yx.re), atol=2e-4,
                err_msg=f"decim {decim} frame {frame}")
            np.testing.assert_allclose(
                np.asarray(yp.im), np.asarray(yx.im), atol=2e-4,
                err_msg=f"decim {decim} frame {frame}")


def test_sharded_td_xcorr_matches_single_device():
    """Round 4 (VERDICT r3 item 7): window-parallel TD lag scan over the
    mesh == the single-device planar scan, bit-for-bit (pure data
    parallelism, no collectives)."""
    from clenabled_tpu.dsp import xcorr
    from clenabled_tpu.sharding import make_sharded_td_xcorr

    mesh = make_mesh()
    max_shift = 64
    apply = make_sharded_td_xcorr(mesh, max_shift)
    nsig, b, n = 3, 16, 1024
    mags = np.abs(cplx(nsig, b, n)).astype(np.float32)
    got = apply(mags)
    want = xcorr.td_xcorr_planar_batched(mags, max_shift)
    np.testing.assert_array_equal(np.asarray(got.corr), np.asarray(want.corr))
    np.testing.assert_array_equal(np.asarray(got.lag), np.asarray(want.lag))
    np.testing.assert_array_equal(np.asarray(got.corr_vectors),
                                  np.asarray(want.corr_vectors))
    with pytest.raises(ValueError, match="multiple"):
        apply(mags[:, :9])


def test_sharded_fd_xcorr_matches_single_device():
    from clenabled_tpu.dsp import planar, xcorr
    from clenabled_tpu.sharding import make_sharded_fd_xcorr

    mesh = make_mesh()
    nsig, b, n = 4, 8, 512
    z = cplx(nsig, b, n)
    v = planar.PC(np.ascontiguousarray(z.real), np.ascontiguousarray(z.imag))
    for fft_first in (False, True):
        apply = make_sharded_fd_xcorr(mesh, perform_fft_first=fft_first)
        got = apply(v)
        want = np.asarray(xcorr.fd_xcorr_planar(
            v, perform_fft_first=fft_first))
        # sharding changes the DFT-matmul batch grouping → fp-order noise
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-4, atol=1e-4 * np.abs(want).max())
