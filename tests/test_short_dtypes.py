"""DTYPE_SHORT coverage: the reference's scc/fsf FIR variants
(lib/fir_filter.h:160,192) and an int16 stream end-to-end through the
block layer (GRCLBase.h:57-62 defines DTYPE_SHORT)."""

import numpy as np

from clenabled_tpu import blocks
from clenabled_tpu.dsp import fir_filter as dsp_fir
from clenabled_tpu.runtime import DTYPE_SHORT, dtype_of
from clenabled_tpu.streaming import Flowgraph


def _conv_ref(x, taps):
    """y[m] = sum_j taps[j] * x[m + ntaps-1 - j] over history-prefixed x."""
    full = np.convolve(x, taps)
    k = len(taps) - 1
    return full[k:len(x)]


def test_fir_scc_parity():
    """int16 in, complex taps, complex64 out — widened exactly as VOLK's
    volk_16i_32fc_dot_prod_32fc (integer values are exact in f32)."""
    rng = np.random.default_rng(0)
    ntaps, n = 31, 1024
    taps = (rng.standard_normal(ntaps)
            + 1j * rng.standard_normal(ntaps)).astype(np.complex64)
    x = rng.integers(-2000, 2000, n + ntaps - 1, dtype=np.int16)
    got = np.asarray(dsp_fir.fir_filter_scc(x, taps))
    want = _conv_ref(x.astype(np.float64), taps.astype(np.complex128))
    assert got.dtype == np.complex64
    np.testing.assert_allclose(got, want.astype(np.complex64), rtol=1e-4)


def test_fir_fsf_truncation_parity():
    """float in, float taps, int16 out — C cast truncates toward zero."""
    rng = np.random.default_rng(1)
    ntaps, n = 17, 512
    taps = rng.standard_normal(ntaps).astype(np.float32)
    x = (rng.standard_normal(n + ntaps - 1) * 100).astype(np.float32)
    got = np.asarray(dsp_fir.fir_filter_fsf(x, taps))
    yf = _conv_ref(x.astype(np.float64), taps.astype(np.float64))
    want = np.trunc(_conv_ref(x, taps).astype(np.float32)).astype(np.int16)
    assert got.dtype == np.int16
    # exact away from .000x cast boundaries; the f32 dot product may land
    # on the other side of an integer for a handful of samples
    mismatch = np.sum(got != want)
    assert mismatch <= max(2, n // 100), (mismatch, n)
    np.testing.assert_allclose(got, yf, atol=1.0)


def test_fir_scc_decimation():
    rng = np.random.default_rng(2)
    ntaps, n, dec = 21, 640, 4
    taps = (rng.standard_normal(ntaps)
            + 1j * rng.standard_normal(ntaps)).astype(np.complex64)
    x = rng.integers(-500, 500, n + ntaps - 1, dtype=np.int16)
    got = np.asarray(dsp_fir.fir_filter_scc(x, taps, decimation=dec))
    want = _conv_ref(x.astype(np.float64),
                     taps.astype(np.complex128))[::dec]
    np.testing.assert_allclose(got, want.astype(np.complex64), rtol=1e-4)


def test_int16_stream_through_block_layer():
    """End-to-end DTYPE_SHORT flowgraph: int16 feed → Add (int16 math) →
    FirFilterSCC → ComplexToMag, streamed over frames with carried
    history."""
    assert dtype_of(DTYPE_SHORT) == np.int16
    rng = np.random.default_rng(3)
    ntaps = 25
    taps = (rng.standard_normal(ntaps)
            + 1j * rng.standard_normal(ntaps)).astype(np.complex64)
    add = blocks.Add()
    scc = blocks.FirFilterSCC(1, taps)
    mag = blocks.ComplexToMag()
    g = Flowgraph()
    g.external_input(add, 0)
    g.external_input(add, 1)
    g.connect(add, scc)
    g.connect(scc, mag)
    tap = g.tap(mag, name="m")
    frame = 512
    r = g.compile(frame_size=frame)
    a = rng.integers(-800, 800, 3 * frame, dtype=np.int16)
    b = rng.integers(-800, 800, 3 * frame, dtype=np.int16)
    outs = [np.asarray(r.step(a[i * frame:(i + 1) * frame],
                              b[i * frame:(i + 1) * frame])[tap])
            for i in range(3)]
    got = np.concatenate(outs)
    s = (a + b).astype(np.float64)
    want = np.abs(np.convolve(s, taps.astype(np.complex128))[:len(s)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_fsf_block_stream():
    """FirFilterFSF block: float stream in → int16 out across frames."""
    rng = np.random.default_rng(4)
    ntaps = 15
    taps = rng.standard_normal(ntaps).astype(np.float32)
    fsf = blocks.FirFilterFSF(2, taps)
    g = Flowgraph()
    g.external_input(fsf)
    tap = g.tap(fsf, name="y")
    frame = 256
    r = g.compile(frame_size=frame)
    x = (rng.standard_normal(2 * frame) * 50).astype(np.float32)
    outs = [np.asarray(r.step(x[i * frame:(i + 1) * frame])[tap])
            for i in range(2)]
    got = np.concatenate(outs)
    assert got.dtype == np.int16
    want = np.convolve(x.astype(np.float64), taps)[:len(x)][::2]
    np.testing.assert_allclose(got, want, atol=1.0)
