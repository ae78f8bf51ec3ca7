"""Planar-complex path: arithmetic and matmul-DFT parity vs numpy complex."""

import numpy as np
import pytest

from clenabled_tpu.dsp import planar

RNG = np.random.default_rng(41)


def rand_pc(*shape):
    c = (RNG.standard_normal(shape) + 1j * RNG.standard_normal(shape)).astype(
        np.complex64
    )
    return planar.from_complex(c), c


def test_arithmetic_ops():
    a, ca = rand_pc(256)
    b, cb = rand_pc(256)
    np.testing.assert_allclose(planar.to_complex(planar.mul(a, b)), ca * cb,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(planar.to_complex(planar.mul_conj(a, b)),
                               ca * np.conj(cb), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(planar.to_complex(planar.conj(a)), np.conj(ca))
    np.testing.assert_allclose(np.asarray(planar.pabs(a)), np.abs(ca),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(planar.to_complex(planar.add(a, b)), ca + cb)


@pytest.mark.parametrize("n", [16, 64, 128, 256, 512, 1024, 2048, 100, 48])
def test_planar_fft_forward(n):
    x, cx = rand_pc(3, n)
    got = planar.to_complex(planar.fft(x))
    want = np.fft.fft(cx, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3 * np.sqrt(n))


@pytest.mark.parametrize("n", [16, 256, 2048])
def test_planar_ifft_unscaled(n):
    x, cx = rand_pc(2, n)
    got = planar.to_complex(planar.ifft_unscaled(x))
    want = np.fft.ifft(cx, axis=-1) * n
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3 * np.sqrt(n))


def test_planar_fft_roundtrip():
    x, cx = rand_pc(4, 512)
    y = planar.ifft(planar.fft(x))
    np.testing.assert_allclose(planar.to_complex(y), cx, rtol=1e-3, atol=1e-3)


def test_fftshift():
    x, cx = rand_pc(2, 64)
    got = planar.to_complex(planar.fftshift(x))
    np.testing.assert_allclose(got, np.fft.fftshift(cx, axes=-1))


def test_factors():
    assert planar._fft_factors(2048) == (32, 64)
    assert planar._fft_factors(512) == (16, 32)
    n1, n2 = planar._fft_factors(100)
    assert n1 * n2 == 100
