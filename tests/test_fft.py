"""Parity tests for dsp.fft vs numpy reference math, covering the reference
block's three special cases (lib/clFFT_impl.cc:544-630): forward+shift,
reverse+shift-on-load, and real-input hermitian mirror."""

import numpy as np

from clenabled_tpu.dsp import fft as clfft
from clenabled_tpu.dsp import window as win

RNG = np.random.default_rng(42)


def cplx(*shape):
    return (RNG.standard_normal(shape) + 1j * RNG.standard_normal(shape)).astype(
        np.complex64
    )


def test_forward_complex_unscaled():
    x = cplx(4, 256)
    got = np.asarray(clfft.fft(x, clfft.FORWARD))
    np.testing.assert_allclose(got, np.fft.fft(x, axis=-1), rtol=1e-4, atol=1e-3)


def test_reverse_complex_unscaled():
    # reverse is the UNSCALED inverse DFT (backward scale forced 1.0)
    x = cplx(3, 128)
    got = np.asarray(clfft.fft(x, clfft.REVERSE))
    np.testing.assert_allclose(got, np.fft.ifft(x, axis=-1) * 128, rtol=1e-4, atol=1e-3)


def test_roundtrip_scale_is_n():
    # fwd∘rev with both unscaled multiplies by N — the reference's convention
    x = cplx(2, 64)
    y = clfft.fft(clfft.fft(x, clfft.FORWARD), clfft.REVERSE)
    np.testing.assert_allclose(np.asarray(y), x * 64, rtol=1e-4, atol=1e-3)


def test_forward_shift_is_fftshift():
    x = cplx(2, 128)
    got = np.asarray(clfft.fft(x, clfft.FORWARD, shift=True))
    np.testing.assert_allclose(
        got, np.fft.fftshift(np.fft.fft(x, axis=-1), axes=-1), rtol=1e-4, atol=1e-3
    )


def test_reverse_shift_swaps_halves_on_load():
    # reverse+shift loads [x[N/2:], x[:N/2]] then transforms (clFFT_impl.cc:549-563)
    x = cplx(2, 128)
    swapped = np.concatenate([x[:, 64:], x[:, :64]], axis=-1)
    want = np.fft.ifft(swapped, axis=-1) * 128
    got = np.asarray(clfft.fft(x, clfft.REVERSE, shift=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_window_applied_before_transform():
    x = cplx(2, 256)
    w = win.hamming(256)
    got = np.asarray(clfft.fft(x, clfft.FORWARD, window=w))
    np.testing.assert_allclose(got, np.fft.fft(x * w, axis=-1), rtol=1e-4, atol=1e-3)


def test_reverse_shift_window_order():
    # window multiplies the already-swapped buffer (kernel runs after load)
    x = cplx(1, 64)
    w = win.hann(64)
    swapped = np.concatenate([x[:, 32:], x[:, :32]], axis=-1)
    want = np.fft.ifft(swapped * w, axis=-1) * 64
    got = np.asarray(clfft.fft(x, clfft.REVERSE, window=w, shift=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_real_forward_full_hermitian_spectrum():
    x = RNG.standard_normal((3, 128)).astype(np.float32)
    got = np.asarray(clfft.fft(x, clfft.FORWARD))
    want = np.fft.fft(x, axis=-1)  # full complex spectrum of real input
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_fft_stream_chops_into_vectors():
    x = cplx(512)
    got = np.asarray(clfft.fft_stream(x, 128))
    want = np.fft.fft(x.reshape(4, 128), axis=-1).reshape(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_window_length_validated():
    import pytest

    with pytest.raises(ValueError):
        clfft.fft(cplx(2, 128), clfft.FORWARD, window=win.hamming(64))


def test_fft_stream_planar_pallas_route_matches_xla():
    """Round-4 fused-FFT routing: fft_stream_planar(use_pallas=True) must
    match the XLA path for every direction/shift/window combination the
    block layer uses (interpret mode)."""
    import jax.numpy as jnp

    from clenabled_tpu.dsp import fft as dsp_fft
    from clenabled_tpu.dsp import planar, window as win_mod

    rng = np.random.default_rng(13)
    size = 1024                       # n2 = 8, the smallest routed size
    n = size * 6
    x = planar.PC(jnp.asarray(rng.standard_normal(n), jnp.float32),
                  jnp.asarray(rng.standard_normal(n), jnp.float32))
    w = win_mod.blackman_harris(size)
    for direction in (dsp_fft.FORWARD, dsp_fft.REVERSE):
        for shift in (False, True):
            for window in (None, w):
                got = dsp_fft.fft_stream_planar(
                    x, size, direction=direction, window=window,
                    shift=shift, use_pallas=True)
                want = dsp_fft.fft_stream_planar(
                    x, size, direction=direction, window=window,
                    shift=shift, use_pallas=False)
                scale = float(np.abs(np.asarray(want.re)).max())
                np.testing.assert_allclose(
                    np.asarray(got.re), np.asarray(want.re),
                    rtol=1e-4, atol=1e-4 * scale,
                    err_msg=f"dir={direction} shift={shift} "
                            f"win={window is not None}")
                np.testing.assert_allclose(
                    np.asarray(got.im), np.asarray(want.im),
                    rtol=1e-4, atol=1e-4 * scale)


def test_fft_block_use_pallas_kwarg():
    """The Fft block's opt-in fused-kernel surface matches the default
    XLA route on planar streams (interpret mode)."""
    import jax.numpy as jnp

    from clenabled_tpu import blocks
    from clenabled_tpu.dsp import planar

    rng = np.random.default_rng(3)
    n = 1024 * 4
    x = planar.PC(jnp.asarray(rng.standard_normal(n), jnp.float32),
                  jnp.asarray(rng.standard_normal(n), jnp.float32))
    b0 = blocks.Fft(1024)
    b1 = blocks.Fft(1024, use_pallas=True)
    _, (want,), _ = b0.apply(b0.init_state(), [x])
    _, (got,), _ = b1.apply(b1.init_state(), [x])
    scale = float(np.abs(np.asarray(want.re)).max())
    np.testing.assert_allclose(np.asarray(got.re), np.asarray(want.re),
                               rtol=1e-4, atol=1e-4 * scale)
    np.testing.assert_allclose(np.asarray(got.im), np.asarray(want.im),
                               rtol=1e-4, atol=1e-4 * scale)
