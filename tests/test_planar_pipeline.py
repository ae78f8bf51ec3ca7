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
