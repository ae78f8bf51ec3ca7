"""Channelizer parity vs a numpy transcription of the reference's
filterpfb2 + batched reverse FFT + channel_map kernels
(lib/clPolyphaseChannelizer_impl.cc:156-225)."""

import numpy as np
import pytest

from clenabled_tpu.dsp import channelizer, firdes

RNG = np.random.default_rng(99)


def cplx(n):
    return (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(np.complex64)


def ref_channelize(x, taps, m, r, ch_map):
    """Direct numpy transcription of the reference kernels (oracle)."""
    t = len(taps)
    buf = len(x) - (t - 1)
    nout = buf // r
    filt = np.zeros((nout, m), np.complex128)
    for i in range(nout):
        for j in range(m):
            acc = 0.0 + 0.0j
            for k in range(j, t, m):
                acc += x[i * r - k + t - 1] * taps[k]
            filt[i, (j + i * (m - r)) % m] = acc
    z = np.fft.ifft(filt, axis=-1) * m
    return z[:, ch_map]


@pytest.mark.parametrize("m,r", [(8, 8), (8, 4), (16, 16), (6, 3)])
def test_channelizer_parity(m, r):
    taps = firdes.low_pass(1.0, float(m), 0.5, 0.25)  # prototype
    buf = 24 * m
    x = cplx(buf + len(taps) - 1)
    ch_map = list(range(m))
    got = np.asarray(
        channelizer.polyphase_channelize(x, taps, m, r, ch_map)
    )
    want = ref_channelize(x.astype(np.complex128), taps.astype(np.float64), m, r, ch_map)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_channel_map_subset():
    m, r = 8, 8
    taps = firdes.low_pass(1.0, float(m), 0.5, 0.25)
    buf = 16 * m
    x = cplx(buf + len(taps) - 1)
    ch_map = [2, 5, 7]
    got = np.asarray(channelizer.polyphase_channelize(x, taps, m, r, ch_map))
    want = ref_channelize(x.astype(np.complex128), taps.astype(np.float64), m, r, ch_map)
    assert got.shape == (buf // r, 3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_tone_lands_in_expected_channel():
    m = 8
    fs = 8.0e6
    taps = firdes.low_pass(1.0, fs, fs / (2 * m) * 0.8, fs / (2 * m) * 0.4)
    buf = 64 * m
    q = 3  # tone at channel-3 center
    n = np.arange(buf + len(taps) - 1)
    x = np.exp(2j * np.pi * (q * fs / m) * n / fs).astype(np.complex64)
    out = np.asarray(
        channelizer.polyphase_channelize(x, taps, m, m, list(range(m)))
    )
    power = (np.abs(out[8:]) ** 2).mean(axis=0)  # skip filter ramp-in
    assert power.argmax() == q
    assert power[q] > 10 * np.sort(power)[-2]


def test_streaming_equals_oneshot():
    m, r = 8, 4
    taps = firdes.low_pass(1.0, float(m), 0.5, 0.25)
    buf = 24 * m
    x = cplx(buf * 3)
    init, apply = channelizer.make_channelizer(taps, m, r, list(range(m)))
    state = init()
    outs = []
    for i in range(3):
        state, y = apply(state, x[i * buf : (i + 1) * buf])
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=0)
    hist = np.zeros(len(taps) - 1, np.complex64)
    want = ref_channelize(
        np.concatenate([hist, x]).astype(np.complex128),
        taps.astype(np.float64), m, r, list(range(m)),
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_validates_buf_multiple():
    taps = firdes.low_pass(1.0, 8.0, 0.5, 0.25)
    with pytest.raises(ValueError):
        channelizer.polyphase_channelize(cplx(len(taps) - 1 + 17), taps, 8, 8, [0])
