"""Parity tests for dsp.elementwise vs numpy (the role of the reference's
per-block testCPU paths, e.g. lib/clMathOp_impl.cc:336-352)."""

import numpy as np
import pytest

from clenabled_tpu.dsp import elementwise as ew

RNG = np.random.default_rng(7)


def cplx(n):
    return (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(np.complex64)


A, B = cplx(1024), cplx(1024)
F = np.abs(RNG.standard_normal(1024)).astype(np.float32) + 0.1
G = np.abs(RNG.standard_normal(1024)).astype(np.float32) + 0.1


@pytest.mark.parametrize(
    "op,want",
    [
        (ew.MATHOP_MULTIPLY, A * B),
        (ew.MATHOP_ADD, A + B),
        (ew.MATHOP_SUBTRACT, A - B),
        (ew.MATHOP_MULTIPLY_CONJUGATE, A * np.conj(B)),
    ],
)
def test_binary_math_ops(op, want):
    np.testing.assert_allclose(np.asarray(ew.math_op(op, A, B)), want, rtol=1e-6)


def test_complex_conjugate():
    np.testing.assert_allclose(
        np.asarray(ew.math_op(ew.MATHOP_COMPLEX_CONJUGATE, A)), np.conj(A)
    )


def test_mult_add_const_complex_by_float_scalar():
    # reference's complex MultiplyConst takes a float scalar (clMathConst)
    np.testing.assert_allclose(np.asarray(ew.multiply_const(A, 2.5)), A * 2.5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ew.add_const(F, 1.5)), F + 1.5, rtol=1e-6)


def test_complex_to_mag_arg_magphase():
    np.testing.assert_allclose(np.asarray(ew.complex_to_mag(A)), np.abs(A), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ew.complex_to_arg(A)), np.angle(A), rtol=1e-5, atol=1e-6
    )
    m, p = ew.complex_to_mag_phase(A)
    np.testing.assert_allclose(np.asarray(m), np.abs(A), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p), np.angle(A), rtol=1e-5, atol=1e-6)


def test_mag_phase_to_complex_roundtrip():
    m, p = np.abs(A), np.angle(A)
    got = np.asarray(ew.mag_phase_to_complex(m, p))
    np.testing.assert_allclose(got, A, rtol=1e-5, atol=1e-5)


def test_log10_log2_formulation():
    # n·log10(a)+k computed via log2 (lib/clLog_impl.cc:101-148)
    got = np.asarray(ew.log10(F, n=10.0, k=2.0))
    np.testing.assert_allclose(got, 10.0 * np.log10(F) + 2.0, rtol=1e-5, atol=1e-5)


def test_snr_helper():
    got = np.asarray(ew.snr_helper(F, G, n=10.0, k=0.0))
    np.testing.assert_allclose(got, np.abs(10.0 * np.log10(F / G)), rtol=1e-5, atol=1e-5)


def test_char_to_complex():
    raw = RNG.integers(-127, 128, size=256, dtype=np.int8)
    got = np.asarray(ew.char_to_complex(raw))
    pairs = raw.astype(np.float32).reshape(-1, 2) / 127.0
    np.testing.assert_allclose(got, pairs[:, 0] + 1j * pairs[:, 1], rtol=1e-6)


def test_unknown_op_raises():
    with pytest.raises(ValueError):
        ew.math_op(42, A, B)
