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


def test_oversampled_phase_split_paths_agree():
    """The gather-free phase-split PFB (scalar and lane-packed planar
    variants) must agree bit-for-bit for every (M, R) shape class,
    including non-power-of-two M and i_offset (sharded rotation phase)."""
    import math

    import jax.numpy as jnp

    from clenabled_tpu.dsp import channelizer as C

    rng = np.random.default_rng(2)
    for (m, r) in [(16, 8), (16, 12), (8, 6), (3, 2), (12, 9)]:
        taps = rng.standard_normal(m * 4 + 3).astype(np.float32)
        taps_rm, t = C._pfb_constants(taps, m, r)
        ell = m // math.gcd(m, r)
        nout = ell * 30
        xr = rng.standard_normal(t - 1 + nout * r).astype(np.float32)
        xi = rng.standard_normal(t - 1 + nout * r).astype(np.float32)
        wr = np.asarray(C._pfb_oversampled(
            jnp.asarray(xr), taps_rm, m, r, t, nout, 5))
        wi = np.asarray(C._pfb_oversampled(
            jnp.asarray(xi), taps_rm, m, r, t, nout, 5))
        # scalar path vs the explicit commutator-gather formulation
        w = taps_rm.shape[0]
        import jax as _jax
        i_idx = _jax.lax.broadcasted_iota(jnp.int32, (nout, w * m), 0)
        n_idx = _jax.lax.broadcasted_iota(jnp.int32, (nout, w * m), 1)
        gidx = jnp.clip(i_idx * r + (t - 1) - n_idx, 0, xr.shape[-1] - 1)
        acc = C._branch_sums_gather(jnp.asarray(xr), taps_rm, gidx, nout, w, m)
        i_rot = _jax.lax.broadcasted_iota(jnp.int32, (nout, m), 0) + 5
        c_rot = _jax.lax.broadcasted_iota(jnp.int32, (nout, m), 1)
        src = jnp.mod(c_rot - i_rot * (m - r), m)
        want = np.asarray(jnp.take_along_axis(acc, src, axis=-1))
        np.testing.assert_allclose(wr, want, atol=1e-4 * max(1, np.abs(want).max()))
        # lane-packed planar variant vs scalar
        gr, gi = C._pfb_oversampled_planar(
            jnp.asarray(xr), jnp.asarray(xi), taps_rm, m, r, t, nout, 5)
        np.testing.assert_array_equal(np.asarray(gr), wr)
        np.testing.assert_array_equal(np.asarray(gi), wi)


def test_fused_oversampled_streaming_matches_xla_on_delayed_stream():
    """make_channelizer_fused_oversampled output == the XLA planar path fed
    the same stream delayed by OS_TAIL_LEN − ntaps + 1 samples (the fused
    kernel's fixed pipeline latency), across multiple frames."""
    from clenabled_tpu.dsp import pallas_kernels, planar

    m, r = 16, 8
    taps = firdes.low_pass(1.0, float(m), 0.5, 0.25)
    taps = np.concatenate([taps, np.zeros((-len(taps)) % m, np.float32)])
    h = pallas_kernels.OS_TAIL_LEN
    lag = h - len(taps) + 1
    ch_map = [0, 3, 7, 15]
    n = 2048
    x = cplx(3 * n)

    init_f, apply_f = channelizer.make_channelizer_fused_oversampled(
        taps, m, r, ch_map, interpret=True)
    state = init_f()
    got = []
    for i in range(3):
        fr = planar.PC(np.real(x[i * n : (i + 1) * n]),
                       np.imag(x[i * n : (i + 1) * n]))
        state, y = apply_f(state, fr)
        got.append(np.asarray(y.re) + 1j * np.asarray(y.im))
    got = np.concatenate(got, axis=0)

    xd = np.concatenate([np.zeros(lag, np.complex64), x])[: 3 * n]
    init_x, apply_x = channelizer.make_channelizer(taps, m, r, ch_map,
                                                   planar=True)
    sx = init_x()
    want = []
    for i in range(3):
        fr = planar.PC(np.real(xd[i * n : (i + 1) * n]),
                       np.imag(xd[i * n : (i + 1) * n]))
        sx, y = apply_x(sx, fr)
        want.append(np.asarray(y.re) + 1j * np.asarray(y.im))
    want = np.concatenate(want, axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-3,
                               atol=1e-3 * np.abs(want).max())


def test_fused_oversampled_support_matrix():
    assert channelizer.fused_oversampled_supported(16, 8, 128)
    assert channelizer.fused_oversampled_supported(16, 4, 128)
    assert channelizer.fused_oversampled_supported(16, 2, 128)
    # round 3: the (128/M) % L restriction removed — these now run fused
    assert channelizer.fused_oversampled_supported(64, 16, 256)
    assert channelizer.fused_oversampled_supported(32, 4, 160)
    assert channelizer.fused_oversampled_supported(16, 1, 128)
    assert not channelizer.fused_oversampled_supported(16, 16, 128)  # critical
    assert not channelizer.fused_oversampled_supported(16, 12, 128)  # R∤M
    assert not channelizer.fused_oversampled_supported(6, 3, 36)     # M∤128


@pytest.mark.parametrize("m,r", [(64, 16), (32, 4), (16, 1)])
def test_fused_oversampled_generalized_lane_groups(m, r):
    """Round-3 generalization: configs where L does not divide the 128/M
    lane groups (phase of lane group k in row family f is (g·f+k) mod L).
    Fused kernel == XLA planar path on the lag-delayed stream."""
    from clenabled_tpu.dsp import pallas_kernels, planar

    taps = firdes.low_pass(1.0, float(m), 0.5, 0.25)
    taps = np.concatenate([taps, np.zeros((-len(taps)) % m, np.float32)])
    lag = pallas_kernels.OS_TAIL_LEN - len(taps) + 1
    n = 2048
    x = cplx(2 * n)
    init_f, apply_f = channelizer.make_channelizer_fused_oversampled(
        taps, m, r, list(range(m)), interpret=True)
    st = init_f()
    got = []
    for i in range(2):
        fr = planar.PC(np.real(x[i * n:(i + 1) * n]),
                       np.imag(x[i * n:(i + 1) * n]))
        st, y = apply_f(st, fr)
        got.append(np.asarray(y.re) + 1j * np.asarray(y.im))
    got = np.concatenate(got)
    xd = np.concatenate([np.zeros(lag, np.complex64), x])[: 2 * n]
    init_x, apply_x = channelizer.make_channelizer(taps, m, r,
                                                   list(range(m)),
                                                   planar=True)
    sx = init_x()
    want = []
    for i in range(2):
        fr = planar.PC(np.real(xd[i * n:(i + 1) * n]),
                       np.imag(xd[i * n:(i + 1) * n]))
        sx, y = apply_x(sx, fr)
        want.append(np.asarray(y.re) + 1j * np.asarray(y.im))
    want = np.concatenate(want)
    np.testing.assert_allclose(got, want, atol=1e-5 * np.abs(want).max())


def test_fused_oversampled_deep_halo_long_prototype():
    """Round 3: os_tail_len grows the carried tail for production-size
    prototypes (25 taps/branch at M=64 reaches ~1.6k samples — past the
    default 1024 halo).  Fused == XLA oracle on the deeper-lag stream."""
    from clenabled_tpu.dsp import pallas_kernels, planar

    m, r = 64, 16
    taps = firdes.low_pass(1.0, float(m), 0.5, 0.08)  # long prototype
    taps = np.concatenate([taps, np.zeros((-len(taps)) % m, np.float32)])
    assert len(taps) > 1024  # past the default halo
    h = pallas_kernels.os_tail_len(m, r, len(taps))
    assert h > pallas_kernels.OS_TAIL_LEN
    assert channelizer.fused_oversampled_supported(m, r, len(taps))
    # prototypes whose banded consts exceed Mosaic's scoped-VMEM budget
    # are REJECTED up front (round 5: nq=32 at this (m, r) fails the
    # real chip's AOT compile with a scoped OOM — interpret mode alone
    # never caught it)
    assert not channelizer.fused_oversampled_supported(m, r, 3904)
    lag = h - len(taps) + 1
    n = 4096
    x = cplx(2 * n)
    init_f, apply_f = channelizer.make_channelizer_fused_oversampled(
        taps, m, r, list(range(m)), interpret=True)
    st = init_f()
    assert st[0].shape == (h,)
    got = []
    for i in range(2):
        fr = planar.PC(np.real(x[i * n:(i + 1) * n]),
                       np.imag(x[i * n:(i + 1) * n]))
        st, y = apply_f(st, fr)
        got.append(np.asarray(y.re) + 1j * np.asarray(y.im))
    got = np.concatenate(got)
    xd = np.concatenate([np.zeros(lag, np.complex64), x])[: 2 * n]
    init_x, apply_x = channelizer.make_channelizer(taps, m, r,
                                                   list(range(m)),
                                                   planar=True)
    sx = init_x()
    want = []
    for i in range(2):
        fr = planar.PC(np.real(xd[i * n:(i + 1) * n]),
                       np.imag(xd[i * n:(i + 1) * n]))
        sx, y = apply_x(sx, fr)
        want.append(np.asarray(y.re) + 1j * np.asarray(y.im))
    want = np.concatenate(want)
    np.testing.assert_allclose(got, want, atol=1e-5 * np.abs(want).max())


def test_fused_oversampled_deep_window_matches_fori():
    """Round 5: the deep OS-PFB branch stage's im2col window strategy
    (default for nq > 8) must match the legacy fori path to accumulation-
    order tolerance."""
    from clenabled_tpu.dsp import pallas_kernels

    m, r = 64, 16
    taps = firdes.low_pass(1.0, float(m), 0.5, 0.04)
    taps = np.concatenate([taps, np.zeros((-len(taps)) % m, np.float32)])
    taps_rm, ntaps = channelizer._pfb_constants(taps, m, r)
    h = pallas_kernels.os_tail_len(m, r, ntaps)
    rng = np.random.default_rng(3)
    n = 4096
    xr = rng.standard_normal(n).astype(np.float32)
    xi = rng.standard_normal(n).astype(np.float32)
    tr = rng.standard_normal(h).astype(np.float32)
    ti = rng.standard_normal(h).astype(np.float32)
    outs = {}
    for strat in ("window", "fori"):
        zr, zi = pallas_kernels.pfb_oversampled_fused(
            xr, xi, tr, ti, np.asarray(taps_rm), m, r,
            tile_rows=h // 128, interpret=True, deep_strategy=strat)
        outs[strat] = (np.asarray(zr), np.asarray(zi))
    scale = np.abs(outs["fori"][0]).max()
    np.testing.assert_allclose(outs["window"][0], outs["fori"][0],
                               rtol=1e-5, atol=1e-5 * scale)
    np.testing.assert_allclose(outs["window"][1], outs["fori"][1],
                               rtol=1e-5, atol=1e-5 * scale)
