"""Filter parity tests: FIR and overlap-add FFT filter vs numpy reference
convolution, streaming-state continuity, and decimation semantics
(the role of lib/clFilter_impl.cc:690-762's CPU-FFT/CPU-FIR/naive variants)."""

import numpy as np
import pytest

from clenabled_tpu.dsp import fft_filter, fir_filter, firdes

RNG = np.random.default_rng(123)


def cplx(n):
    return (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(np.complex64)


def ref_fir(x_with_hist, taps, decim=1):
    """y[n] = sum_j taps[j] x[n+ntaps-1-j], decimated — numpy oracle."""
    full = np.convolve(x_with_hist, taps, mode="valid")
    return full[::decim]


def test_fir_ccf_matches_numpy():
    taps = firdes.low_pass(1.0, 1e6, 100e3, 50e3)  # 49 real taps
    x = cplx(1024 + len(taps) - 1)
    got = np.asarray(fir_filter.fir_filter(x, taps))
    want = ref_fir(x.astype(np.complex128), taps.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fir_ccc_complex_taps():
    taps = firdes.complex_band_pass(1.0, 1e6, -50e3, 150e3, 40e3)
    x = cplx(512 + len(taps) - 1)
    got = np.asarray(fir_filter.fir_filter(x, taps))
    want = ref_fir(x.astype(np.complex128), taps.astype(np.complex128))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fir_fff_and_decimation():
    taps = firdes.low_pass(1.0, 1e6, 50e3, 25e3)
    x = RNG.standard_normal(2048 + len(taps) - 1).astype(np.float32)
    got = np.asarray(fir_filter.fir_filter(x, taps, decimation=4))
    want = ref_fir(x.astype(np.float64), taps.astype(np.float64), decim=4)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fir_streaming_equals_oneshot():
    """Frame-by-frame with carried history == filtering the whole stream."""
    taps = firdes.low_pass(1.0, 1e6, 100e3, 50e3)
    ntaps = len(taps)
    x = cplx(4096)
    init, apply = fir_filter.make_fir_filter(taps)
    state = init()
    outs = []
    for i in range(4):
        state, y = apply(state, x[i * 1024 : (i + 1) * 1024])
        outs.append(np.asarray(y))
    got = np.concatenate(outs)
    want = ref_fir(np.concatenate([np.zeros(ntaps - 1, np.complex64), x]), taps)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ofa_sizes_match_reference():
    # fftsize = 2*next_pow2(ntaps), nsamples = fftsize-ntaps+1
    assert fft_filter.compute_sizes(241) == (512, 272)
    assert fft_filter.compute_sizes(1730) == (4096, 2367)
    assert fft_filter.compute_sizes(256) == (512, 257)


def test_ofa_filter_matches_full_convolution():
    taps = firdes.low_pass(1.0, 1e6, 100e3, 20e3)  # 121 taps -> ns=136
    init, apply, plan = fft_filter.make_fft_filter(taps)
    n = plan.nsamples * 8
    x = cplx(n)
    _, y = apply(init(), x)
    # OFA of a zero-state stream == 'full' convolution truncated to n
    want = np.convolve(x.astype(np.complex128), taps.astype(np.float64))[:n]
    np.testing.assert_allclose(np.asarray(y), want, rtol=2e-4, atol=2e-4)


def test_ofa_streaming_tail_continuity():
    taps = firdes.low_pass(1.0, 1e6, 100e3, 20e3)
    init, apply, plan = fft_filter.make_fft_filter(taps)
    frame = plan.nsamples * 4
    x = cplx(frame * 3)
    state = init()
    outs = []
    for i in range(3):
        state, y = apply(state, x[i * frame : (i + 1) * frame])
        outs.append(np.asarray(y))
    got = np.concatenate(outs)
    want = np.convolve(x.astype(np.complex128), taps.astype(np.float64))[: len(x)]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_ofa_decimation_phase():
    taps = firdes.low_pass(1.0, 1e6, 80e3, 20e3)
    decim = 4
    init, apply, plan = fft_filter.make_fft_filter(taps, decimation=decim)
    q = fft_filter.frame_quantum(plan)
    assert q % plan.nsamples == 0 and q % decim == 0
    x = cplx(q * 2)
    _, y = apply(init(), x)
    want = np.convolve(x.astype(np.complex128), taps.astype(np.float64))[: len(x)][::decim]
    np.testing.assert_allclose(np.asarray(y), want, rtol=2e-4, atol=2e-4)


def test_ofa_rrc_241_taps():
    """The benchmark case: 241-tap RRC (BASELINE config[1])."""
    taps = firdes.root_raised_cosine(1.0, 10e6, 1e6, 0.22, 241)
    init, apply, plan = fft_filter.make_fft_filter(taps)
    assert (plan.fftsize, plan.nsamples) == (512, 272)
    x = cplx(plan.nsamples * 16)
    _, y = apply(init(), x)
    want = np.convolve(x.astype(np.complex128), taps.astype(np.float64))[: len(x)]
    np.testing.assert_allclose(np.asarray(y), want, rtol=2e-4, atol=2e-4)


def test_ofa_rejects_bad_frame_length():
    taps = firdes.low_pass(1.0, 1e6, 100e3, 20e3)
    init, apply, plan = fft_filter.make_fft_filter(taps)
    with pytest.raises(ValueError):
        apply(init(), cplx(plan.nsamples + 1))


def test_fir_rejects_bad_decimation_frame():
    with pytest.raises(ValueError):
        fir_filter.fir_filter(cplx(100), np.ones(9, np.float32), decimation=7)
