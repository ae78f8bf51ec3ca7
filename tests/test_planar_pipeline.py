"""Planar pipeline == complex pipeline: the TPU execution path must produce
the same numbers as the complex64 reference path."""

import numpy as np

from clenabled_tpu.dsp import channelizer, planar, xcorr, xengine, firdes
from clenabled_tpu.pipelines import (FxPipelineConfig, make_fx_pipeline,
                                     make_fx_pipeline_planar)

RNG = np.random.default_rng(77)


def cplx(*shape):
    return (RNG.standard_normal(shape) + 1j * RNG.standard_normal(shape)).astype(
        np.complex64
    )


def test_channelize_planar_matches_complex():
    m, r = 16, 16
    taps = firdes.low_pass(1.0, float(m), 0.5, 0.25)
    taps_rm, ntaps = channelizer._pfb_constants(taps, m, r)
    x = cplx(32 * m + ntaps - 1)
    want = np.asarray(channelizer._channelize(
        x, taps_rm, np.arange(m, dtype=np.int32),
        num_channels=m, ninputs_per_iter=r, ntaps=ntaps))
    got = planar.to_complex(channelizer._channelize_planar(
        planar.from_complex(x), taps_rm, np.arange(m, dtype=np.int32),
        num_channels=m, ninputs_per_iter=r, ntaps=ntaps))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_channelize_planar_oversampled():
    m, r = 8, 4
    taps = firdes.low_pass(1.0, float(m), 0.5, 0.25)
    taps_rm, ntaps = channelizer._pfb_constants(taps, m, r)
    x = cplx(24 * m + ntaps - 1)
    want = np.asarray(channelizer._channelize(
        x, taps_rm, np.arange(m, dtype=np.int32),
        num_channels=m, ninputs_per_iter=r, ntaps=ntaps))
    got = planar.to_complex(channelizer._channelize_planar(
        planar.from_complex(x), taps_rm, np.arange(m, dtype=np.int32),
        num_channels=m, ninputs_per_iter=r, ntaps=ntaps))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_fd_xcorr_planar_matches():
    v = cplx(3, 5, 256)
    want = np.asarray(xcorr.fd_xcorr(v))
    got = np.asarray(xcorr.fd_xcorr_planar(planar.from_complex(v)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2)


def test_xengine_planar_matches():
    z = cplx(16, 4, 8, 2)
    want = np.asarray(xengine.xengine_correlate(z, npol=2))
    got = planar.to_complex(
        xengine.xengine_correlate_planar(planar.from_complex(z), npol=2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_full_pipeline_planar_matches_complex():
    cfg = FxPipelineConfig(num_antennas=4, num_channels=16,
                           samples_per_step=4096)
    fn_c, (xc, hc) = make_fx_pipeline(cfg)
    fn_p, (xr, xi, hr, hi) = make_fx_pipeline_planar(cfg)
    x = cplx(4, 4096)
    fd_c, xmat_c, _ = fn_c(x, hc)
    fd_p, xre, xim, _, _ = fn_p(x.real.copy(), x.imag.copy(), hr, hi)
    np.testing.assert_allclose(np.asarray(fd_p), np.asarray(fd_c),
                               rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(xre) + 1j * np.asarray(xim),
                               np.asarray(xmat_c), rtol=1e-3, atol=1e-1)


def test_fused_pipeline_pair_selection():
    """make_fx_pipeline_fused plumbs fd_pairs/xe_pairs to the kernel: a
    restricted-pair pipeline's rows equal the corresponding rows of a
    superset-pair run (the ~18%-of-step epilogue lever, BENCH_TPU.md)."""
    from clenabled_tpu.pipelines import make_fx_pipeline_fused

    cfg = FxPipelineConfig(num_antennas=4, num_channels=16,
                           samples_per_step=128 * 256 * 2)
    full_fd = ((0, 1), (0, 2), (0, 3))
    full_xe = ((0, 1), (2, 3), (1, 2))
    fn_full, (xr0, xi0, tr, ti) = make_fx_pipeline_fused(
        cfg, interpret=True, fd_pairs=full_fd, xe_pairs=full_xe)
    fn_sub, _ = make_fx_pipeline_fused(
        cfg, interpret=True, fd_pairs=((0, 2),), xe_pairs=((2, 3),))
    xr = RNG.standard_normal(xr0.shape).astype(np.float32)
    xi = RNG.standard_normal(xi0.shape).astype(np.float32)
    fd_f, xre_f, xim_f, _, _ = fn_full(xr, xi, tr, ti)
    fd_s, xre_s, xim_s, _, _ = fn_sub(xr, xi, tr, ti)
    assert np.asarray(fd_s).shape == (1, 16)
    assert np.asarray(xre_s).shape == (16, 1, 1)
    np.testing.assert_allclose(np.asarray(fd_s)[0], np.asarray(fd_f)[1],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(xre_s)[:, 0], np.asarray(xre_f)[:, 1],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(xim_s)[:, 0], np.asarray(xim_f)[:, 1],
                               rtol=1e-5, atol=1e-5)


def test_exact_f32_context():
    """clenabled_tpu.exact_f32() wraps jax.default_matmul_precision and the
    pipelines trace/run inside it (on TPU it restores 1e-7-class matmul
    sums — BENCH_TPU.md round-3 audit; numerically a no-op on CPU)."""
    import clenabled_tpu
    from clenabled_tpu.pipelines import make_fx_pipeline_fused

    cfg = FxPipelineConfig(num_antennas=2, num_channels=16,
                           samples_per_step=128 * 256)
    fn, (xr0, xi0, tr, ti) = make_fx_pipeline_fused(cfg, interpret=True)
    xr = RNG.standard_normal(xr0.shape).astype(np.float32)
    xi = RNG.standard_normal(xi0.shape).astype(np.float32)
    with clenabled_tpu.exact_f32():
        fd_e, xre_e, *_ = fn(xr, xi, tr, ti)
    fd_d, xre_d, *_ = fn(xr, xi, tr, ti)
    np.testing.assert_allclose(np.asarray(fd_e), np.asarray(fd_d),
                               rtol=1e-5, atol=1e-6)
