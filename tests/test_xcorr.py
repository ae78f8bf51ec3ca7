"""TD/FD cross-correlator parity vs numpy transcriptions of the reference
kernels (lib/clXCorrelate_impl.cc:843-903, lib/clxcorrelate_fft_vcf_impl.cc)."""

import numpy as np
import pytest

from clenabled_tpu.dsp import xcorr

RNG = np.random.default_rng(17)


def ref_td_xcorr_pair(ref_mag, mag, max_shift):
    """Direct transcription of the XCorrelate lag-scan kernel (oracle)."""
    n = len(ref_mag)
    xx = ref_mag * ref_mag
    yy = mag * mag
    out = np.zeros(2 * max_shift, np.float64)
    for g in range(2 * max_shift):
        shift = g - max_shift
        start = abs(shift)
        calc_len = n - start
        if shift > 0:
            sxy = np.dot(ref_mag[start : start + calc_len], mag[:calc_len])
            sx2 = xx[start:].sum()
            sy2 = yy[:calc_len].sum()
        else:
            sxy = np.dot(ref_mag[:calc_len], mag[start : start + calc_len])
            sx2 = xx[:calc_len].sum()
            sy2 = yy[start:].sum()
        denom = sx2 * sy2
        out[g] = sxy / np.sqrt(denom) if denom != 0 else -2.0
    return out


def test_td_xcorr_parity_float():
    n, max_shift = 1024, 64
    a = RNG.standard_normal(n).astype(np.float32)
    b = RNG.standard_normal(n).astype(np.float32)
    res = xcorr.td_xcorr(np.stack([a, b]), max_shift)
    want = ref_td_xcorr_pair(a.astype(np.float64), b.astype(np.float64), max_shift)
    np.testing.assert_allclose(np.asarray(res.corr_vectors[0]), want,
                               rtol=1e-3, atol=1e-4)


def test_td_xcorr_parity_complex():
    n, max_shift = 512, 32
    a = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(np.complex64)
    b = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(np.complex64)
    res = xcorr.td_xcorr(np.stack([a, b]), max_shift)
    want = ref_td_xcorr_pair(np.abs(a).astype(np.float64),
                             np.abs(b).astype(np.float64), max_shift)
    np.testing.assert_allclose(np.asarray(res.corr_vectors[0]), want,
                               rtol=1e-3, atol=1e-4)


def test_td_xcorr_recovers_known_delay():
    """The examples/xcorr_test_opencl.grc use case: delayed copies."""
    n, max_shift, delay = 8192, 512, 37
    base = RNG.standard_normal(n + max_shift + delay).astype(np.float32)
    ref = base[max_shift : max_shift + n]
    # sig delayed by `delay` samples relative to ref
    sig = base[max_shift - delay : max_shift - delay + n]
    res = xcorr.td_xcorr(np.stack([ref, sig]), max_shift)
    assert int(np.asarray(res.lag)[0]) == -delay
    assert float(np.asarray(res.corr)[0]) > 0.95
    # and the other direction
    res2 = xcorr.td_xcorr(np.stack([sig, ref]), max_shift)
    assert int(np.asarray(res2.lag)[0]) == delay


def test_td_xcorr_multi_signal():
    n, max_shift = 2048, 128
    sigs = RNG.standard_normal((4, n)).astype(np.float32)
    res = xcorr.td_xcorr(sigs, max_shift)
    assert res.corr_vectors.shape == (3, 2 * max_shift)
    assert res.corr.shape == (3,) and res.lag.shape == (3,)


def test_td_xcorr_zero_signal_sentinel():
    n, max_shift = 256, 16
    a = RNG.standard_normal(n).astype(np.float32)
    z = np.zeros(n, np.float32)
    res = xcorr.td_xcorr(np.stack([a, z]), max_shift)
    np.testing.assert_allclose(np.asarray(res.corr_vectors[0]), -2.0)


def ref_fd_xcorr(vectors):
    n = vectors.shape[-1]
    ref = vectors[0]
    outs = []
    for sig in vectors[1:]:
        z = np.fft.ifft(ref * np.conj(sig)) * n
        outs.append(np.fft.fftshift(np.abs(z)))
    return np.stack(outs)


def test_fd_xcorr_parity():
    n = 256
    v = (RNG.standard_normal((3, n)) + 1j * RNG.standard_normal((3, n))).astype(
        np.complex64
    )
    got = np.asarray(xcorr.fd_xcorr(v))
    want = ref_fd_xcorr(v.astype(np.complex128))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_fd_xcorr_time_series_input():
    """input_type=2: forward FFT applied first (d_perform_fft_first)."""
    n = 128
    v = (RNG.standard_normal((2, n)) + 1j * RNG.standard_normal((2, n))).astype(
        np.complex64
    )
    got = np.asarray(xcorr.fd_xcorr(v, perform_fft_first=True))
    want = ref_fd_xcorr(np.fft.fft(v.astype(np.complex128), axis=-1))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2)


def test_fd_xcorr_peak_at_delay():
    """FD correlator peak position encodes the inter-signal delay."""
    n, delay = 1024, 25
    base = RNG.standard_normal(2 * n)
    a = base[:n]
    b = base[delay : n + delay]  # b advanced by `delay`
    fa = np.fft.fft(a).astype(np.complex64)
    fb = np.fft.fft(b).astype(np.complex64)
    out = np.asarray(xcorr.fd_xcorr(np.stack([fa, fb])))[0]
    # peak index (after fftshift) maps lag l to n/2 + l
    assert abs(int(out.argmax()) - (n // 2 + delay)) <= 1


def test_td_xcorr_batched_windows():
    n, shift, b = 1024, 64, 5
    sigs = RNG.standard_normal((3, b, n)).astype(np.float32)
    res = xcorr.td_xcorr_batched(sigs, shift)
    assert res.corr_vectors.shape == (2, b, 2 * shift)
    # each window matches the unbatched result
    for wi in range(b):
        single = xcorr.td_xcorr(sigs[:, wi], shift)
        np.testing.assert_allclose(np.asarray(res.corr_vectors[:, wi]),
                                   np.asarray(single.corr_vectors),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(res.lag[:, wi]),
                                      np.asarray(single.lag))
