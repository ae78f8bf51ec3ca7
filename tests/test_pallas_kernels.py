"""Pallas fused PFB kernel parity (interpret mode on CPU) vs the XLA path."""

import numpy as np
import pytest
import jax.numpy as jnp

from clenabled_tpu.dsp import channelizer, firdes, pallas_kernels, planar


def test_fused_pfb_kernel_matches_xla_path():
    a, m = 4, 16
    fs = 100e6
    proto = firdes.low_pass(1.0, fs, fs / (2 * m) * 0.8, fs / (2 * m) * 0.2)
    taps_rm, ntaps = channelizer._pfb_constants(proto, m, m)
    nout = 256
    rng = np.random.default_rng(5)
    comps = rng.standard_normal((2 * a, ntaps - 1 + nout * m)).astype(np.float32)

    # XLA reference: branch sums then planar inverse DFT
    acc = channelizer._branch_sums_critical_batched(comps, taps_rm, m, ntaps, nout)
    want = planar.ifft_unscaled(planar.PC(np.asarray(acc[:a]), np.asarray(acc[a:])))

    y, hr = channelizer._pack_streams(comps, taps_rm, m, ntaps, nout)
    z = np.asarray(pallas_kernels.pfb_channelize_packed(
        np.asarray(y), np.asarray(hr), a, m, tile=64, interpret=True))
    zs = z.reshape(nout, 2 * a, m)
    got_re = np.transpose(zs[:, :a], (1, 0, 2))
    got_im = np.transpose(zs[:, a:], (1, 0, 2))
    np.testing.assert_allclose(got_re, np.asarray(want.re), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(got_im, np.asarray(want.im), rtol=1e-3, atol=1e-3)


def test_idft_block_matrix_structure():
    mat = pallas_kernels._idft_block_matrix(16, 2)
    assert mat.shape == (64, 64)
    # antenna blocks are decoupled: cross-antenna blocks are zero
    assert np.all(mat[0:16, 16:32] == 0)  # re(a0) x re(a1)
    assert np.all(mat[0:16, 48:64] == 0)  # re(a0) x im(a1)


def test_flat_fused_fx_kernel_matches_xla_path():
    """fx_correlate_streams (the 1.2 GSPS flagship kernel) vs the XLA
    reference math, interpret mode."""
    import jax.numpy as jnp

    from clenabled_tpu.dsp import xengine

    a, m = 4, 16
    fs = 100e6
    proto = firdes.low_pass(1.0, fs, fs / (2 * m) * 0.8, fs / (2 * m) * 0.2)
    proto = np.concatenate([proto, np.zeros((-len(proto)) % m, np.float32)])
    taps_rm, ntaps = channelizer._pfb_constants(proto, m, m)
    w = taps_rm.shape[0]
    assert ntaps == w * m
    nout = 512
    n = nout * m
    rng = np.random.default_rng(5)
    comps = rng.standard_normal((2 * a, n)).astype(np.float32)
    hist = rng.standard_normal((2 * a, w * m - 1)).astype(np.float32)
    fd, xe = pallas_kernels.fx_correlate_streams(
        comps, hist, np.asarray(taps_rm), a, m, tile_rows=8, interpret=True)
    fd, xe = np.asarray(fd), np.asarray(xe)

    full = np.concatenate([hist[:, -(ntaps - 1):], comps], axis=-1)
    acc = channelizer._branch_sums_critical_batched(full, taps_rm, m, ntaps, nout)
    spec = planar.ifft_unscaled(planar.PC(np.asarray(acc[:a]), np.asarray(acc[a:])))
    zc = planar.to_complex(spec)
    want_fd = np.stack([
        np.abs(np.fft.ifft(zc[0] * np.conj(zc[p]), axis=-1) * m).sum(axis=0)
        for p in range(1, a)])
    np.testing.assert_allclose(fd, want_fd, rtol=1e-4,
                               atol=1e-4 * np.abs(want_fd).max())
    zt = np.transpose(zc, (1, 0, 2))[..., None]
    want_x = np.asarray(xengine.xengine_correlate(zt.astype(np.complex64), npol=1))
    scale = np.abs(want_x).max()
    np.testing.assert_allclose(xe[:, :m], want_x[..., 0].real.T,
                               rtol=1e-4, atol=1e-4 * scale)
    np.testing.assert_allclose(xe[:, m:], want_x[..., 0].imag.T,
                               rtol=1e-4, atol=1e-4 * scale)


def test_fx_v2_matches_v1_on_shifted_stream():
    """fx_correlate_streams_v2 (concat-free, double-buffered DMA, row-aligned
    tail) must equal v1 run on the same virtual stream: v2's feed is
    tail(FX_TAIL_LEN) ++ frame, v1's is hist(W·m−1) ++ frame', so v1 with
    hist' = tail[:hlen] and frame' = tail[hlen:] ++ frame[:n−(H−hlen)]
    consumes the identical sample stream."""
    a, m = 4, 16
    fs = 100e6
    proto = firdes.low_pass(1.0, fs, fs / (2 * m) * 0.8, fs / (2 * m) * 0.2)
    proto = np.concatenate([proto, np.zeros((-len(proto)) % m, np.float32)])
    taps_rm, ntaps = channelizer._pfb_constants(proto, m, m)
    w = taps_rm.shape[0]
    hlen = w * m - 1
    big_h = pallas_kernels.FX_TAIL_LEN
    n = 512 * m                      # multiple of 128·tile_rows (tile_rows=8)
    rng = np.random.default_rng(11)
    xr = rng.standard_normal((a, n)).astype(np.float32)
    xi = rng.standard_normal((a, n)).astype(np.float32)
    tr = rng.standard_normal((a, big_h)).astype(np.float32)
    ti = rng.standard_normal((a, big_h)).astype(np.float32)

    fd2, xe2 = pallas_kernels.fx_correlate_streams_v2(
        xr, xi, tr, ti, np.asarray(taps_rm), a, m, tile_rows=8,
        interpret=True)

    vfeed = np.concatenate(
        [np.concatenate([tr, ti], axis=0),
         np.concatenate([xr, xi], axis=0)], axis=-1)   # [2A, H + n]
    hist1 = vfeed[:, :hlen]
    comps1 = vfeed[:, hlen : hlen + n]
    fd1, xe1 = pallas_kernels.fx_correlate_streams(
        comps1, hist1, np.asarray(taps_rm), a, m, tile_rows=8,
        interpret=True)
    np.testing.assert_allclose(np.asarray(fd2), np.asarray(fd1), rtol=1e-5,
                               atol=1e-5 * np.abs(np.asarray(fd1)).max())
    np.testing.assert_allclose(np.asarray(xe2), np.asarray(xe1), rtol=1e-5,
                               atol=1e-5 * np.abs(np.asarray(xe1)).max())


def test_fx_v2_pair_lists():
    """v2 honors explicit fd/xe pair lists (dual-pol pseudo-stations)."""
    nstreams, m = 4, 16
    fs = 100e6
    proto = firdes.low_pass(1.0, fs, fs / (2 * m) * 0.8, fs / (2 * m) * 0.2)
    proto = np.concatenate([proto, np.zeros((-len(proto)) % m, np.float32)])
    taps_rm, _ = channelizer._pfb_constants(proto, m, m)
    big_h = pallas_kernels.FX_TAIL_LEN
    n = 256 * m
    rng = np.random.default_rng(3)
    xr = rng.standard_normal((nstreams, n)).astype(np.float32)
    xi = rng.standard_normal((nstreams, n)).astype(np.float32)
    tr = rng.standard_normal((nstreams, big_h)).astype(np.float32)
    ti = rng.standard_normal((nstreams, big_h)).astype(np.float32)
    pairs = [(0, 1), (2, 3), (1, 1)]
    fd2, xe2 = pallas_kernels.fx_correlate_streams_v2(
        xr, xi, tr, ti, np.asarray(taps_rm), nstreams, m, tile_rows=8,
        interpret=True, fd_pairs=[(0, 3)], xe_pairs=pairs)
    hlen = taps_rm.shape[0] * m - 1
    vfeed = np.concatenate(
        [np.concatenate([tr, ti], axis=0),
         np.concatenate([xr, xi], axis=0)], axis=-1)
    fd1, xe1 = pallas_kernels.fx_correlate_streams(
        vfeed[:, hlen : hlen + n], vfeed[:, :hlen], np.asarray(taps_rm),
        nstreams, m, tile_rows=8, interpret=True, fd_pairs=[(0, 3)],
        xe_pairs=pairs)
    assert np.asarray(fd2).shape == (1, m)
    assert np.asarray(xe2).shape == (len(pairs), 2 * m)
    np.testing.assert_allclose(np.asarray(fd2), np.asarray(fd1), rtol=1e-5,
                               atol=1e-5 * np.abs(np.asarray(fd1)).max())
    np.testing.assert_allclose(np.asarray(xe2), np.asarray(xe1), rtol=1e-5,
                               atol=1e-5 * np.abs(np.asarray(xe1)).max())


def test_fx_v2_narrow_ingest_dtypes():
    """bf16/int8 ingest (the reference's IChar sample path,
    lib/clXEngine_impl.cc:831-858) must match the f32 kernel exactly when
    the sample values are exactly representable in the narrow dtype."""
    import jax.numpy as jnp

    a, m = 2, 16
    fs = 100e6
    proto = firdes.low_pass(1.0, fs, fs / (2 * m) * 0.8, fs / (2 * m) * 0.2)
    proto = np.concatenate([proto, np.zeros((-len(proto)) % m, np.float32)])
    taps_rm, _ = channelizer._pfb_constants(proto, m, m)
    n = 512 * m
    rng = np.random.default_rng(9)

    for dt in (jnp.int8, jnp.bfloat16):
        tail_len = pallas_kernels.fx_tail_len(dt)
        tile = tail_len // 128  # tile_rows must be >= the dtype's halo
        if dt == jnp.int8:
            xr_n = rng.integers(-127, 128, (a, n)).astype(np.int8)
            xi_n = rng.integers(-127, 128, (a, n)).astype(np.int8)
            tr_n = rng.integers(-127, 128, (a, tail_len)).astype(np.int8)
            ti_n = rng.integers(-127, 128, (a, tail_len)).astype(np.int8)
        else:
            mk = lambda shape: np.asarray(
                rng.standard_normal(shape).astype(np.float32)
                .astype(jnp.bfloat16))
            xr_n, xi_n = mk((a, n)), mk((a, n))
            tr_n, ti_n = mk((a, tail_len)), mk((a, tail_len))
        fd_n, xe_n = pallas_kernels.fx_correlate_streams_v2(
            xr_n, xi_n, tr_n, ti_n, np.asarray(taps_rm), a, m,
            tile_rows=tile, interpret=True, mxu_dtype=jnp.float32)

        # f32 reference over the SAME virtual-stream window: the narrow run
        # lags the frame end by tail_len, the f32 run by 1024, so feed the
        # f32 kernel the stream re-framed 1024 samples into the narrow tail
        f32_tail = pallas_kernels.fx_tail_len(jnp.float32)
        as32 = lambda v: np.asarray(v, np.float32)
        sr = np.concatenate([as32(tr_n), as32(xr_n)], axis=-1)
        si = np.concatenate([as32(ti_n), as32(xi_n)], axis=-1)
        fd_f, xe_f = pallas_kernels.fx_correlate_streams_v2(
            sr[:, f32_tail : f32_tail + n], si[:, f32_tail : f32_tail + n],
            sr[:, :f32_tail], si[:, :f32_tail],
            np.asarray(taps_rm), a, m, tile_rows=tile, interpret=True)
        np.testing.assert_allclose(np.asarray(fd_n), np.asarray(fd_f),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(xe_n), np.asarray(xe_f),
                                   rtol=1e-6, atol=1e-6)

        # the narrow-ingest DEFAULT (bf16 MXU operands, f32 accumulation)
        # rounds only the taps/DFT entries: relative error must sit below
        # the 8-bit input quantization floor (~0.4%)
        fd_d, xe_d = pallas_kernels.fx_correlate_streams_v2(
            xr_n, xi_n, tr_n, ti_n, np.asarray(taps_rm), a, m,
            tile_rows=tile, interpret=True)
        for got, ref in ((fd_d, fd_f), (xe_d, xe_f)):
            got, ref = np.asarray(got), np.asarray(ref)
            rel = np.abs(got - ref).max() / np.abs(ref).max()
            assert rel < 4e-3, rel


def test_flat_fused_kernel_dual_pol_8_streams():
    """npol=2 via pseudo-stations: 4 antennas × 2 pols = 8 streams with
    explicit XX/XY/YX/YY pair lists — matches xengine_correlate_planar."""
    from clenabled_tpu.dsp import xengine

    s_ant, npol, m = 4, 2, 16
    nstreams = s_ant * npol
    fs = 100e6
    proto = firdes.low_pass(1.0, fs, fs / (2 * m) * 0.8, fs / (2 * m) * 0.2)
    proto = np.concatenate([proto, np.zeros((-len(proto)) % m, np.float32)])
    taps_rm, ntaps = channelizer._pfb_constants(proto, m, m)
    w = taps_rm.shape[0]
    nout = 256
    n = nout * m
    rng = np.random.default_rng(7)
    comps = rng.standard_normal((2 * nstreams, n)).astype(np.float32)
    hist = rng.standard_normal((2 * nstreams, w * m - 1)).astype(np.float32)

    # dual-pol xGPU pair list: for each station pair (s1>=s2) the 4 products
    st = xengine.baseline_stations(s_ant)
    xe_pairs = []
    for s1, s2 in st:
        for p0 in range(npol):
            for p1 in range(npol):
                xe_pairs.append((int(s1) * npol + p0, int(s2) * npol + p1))
    fd, xe = pallas_kernels.fx_correlate_streams(
        comps, hist, np.asarray(taps_rm), nstreams, m, tile_rows=8,
        interpret=True, xe_pairs=xe_pairs, fd_pairs=[(0, 2), (0, 4)])
    xe = np.asarray(xe)

    # reference: channelize each stream, then planar X-Engine with npol=2
    full = np.concatenate([hist[:, -(ntaps - 1):], comps], axis=-1)
    acc = channelizer._branch_sums_critical_batched(full, taps_rm, m, ntaps, nout)
    spec = planar.ifft_unscaled(
        planar.PC(np.asarray(acc[:nstreams]), np.asarray(acc[nstreams:])))
    zc = planar.to_complex(spec)                       # [streams, T, m]
    z4 = zc.reshape(s_ant, npol, nout, m).transpose(2, 0, 3, 1)  # [T,S,F,P]
    want = planar.to_complex(xengine.xengine_correlate_planar(
        planar.from_complex(z4), npol=npol))           # [F, nb, 4]
    got = (xe[:, :m] + 1j * xe[:, m:]).reshape(len(st), npol * npol, m)
    got = np.transpose(got, (2, 0, 1))                 # [F, nb, 4]
    np.testing.assert_allclose(got, want, rtol=1e-4,
                               atol=1e-4 * np.abs(want).max())


def test_ofs_filter_matches_overlap_add():
    """The fused overlap-save kernel must reproduce the overlap-add OFA
    filter (dsp.fft_filter, reference sizing) sample for sample, including
    the carried tail across multiple frames."""
    from clenabled_tpu.dsp import fft_filter as ofa

    ntaps = 241
    rng = np.random.default_rng(13)
    taps = rng.standard_normal(ntaps).astype(np.float32)
    plan = pallas_kernels.OfsPlan(taps, chunks_per_tile=2)
    assert plan.n == 1280 and plan.n2 == 10 and plan.stride == 8
    # default chunks_per_tile yields a power-of-two frame quantum
    assert pallas_kernels.OfsPlan(taps).quantum & (
        pallas_kernels.OfsPlan(taps).quantum - 1) == 0

    frames = 2
    n = 2 * plan.quantum
    x = (rng.standard_normal((frames * n,))
         + 1j * rng.standard_normal((frames * n,))).astype(np.complex64)

    # reference: direct convolution (what the OFA path computes)
    want = np.convolve(x, taps.astype(np.complex64))[: frames * n]

    tr = np.zeros(plan.tail_len, np.float32)
    ti = np.zeros(plan.tail_len, np.float32)
    got = []
    for k in range(frames):
        fr = x.real[k * n : (k + 1) * n].astype(np.float32)
        fi = x.imag[k * n : (k + 1) * n].astype(np.float32)
        yr, yi = pallas_kernels.ofs_filter_planar(fr, fi, tr, ti, plan,
                                                  interpret=True)
        got.append(np.asarray(yr) + 1j * np.asarray(yi))
        tr, ti = fr[n - plan.tail_len:], fi[n - plan.tail_len:]
    got = np.concatenate(got)
    tol = 1e-4 * np.abs(want).max()
    np.testing.assert_allclose(got.real, want.real, atol=tol)
    np.testing.assert_allclose(got.imag, want.imag, atol=tol)


def test_ofs_plan_sizing_large_taps():
    """Non-power-of-two row counts (ntaps=385 → K'−1=384, N=2048)."""
    from clenabled_tpu.dsp import fft_filter as ofa

    rng = np.random.default_rng(3)
    taps = rng.standard_normal(385).astype(np.float32)
    plan = pallas_kernels.OfsPlan(taps, chunks_per_tile=1)
    assert plan.tail_len == 384
    n = 2 * plan.quantum
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    want = np.convolve(x, taps.astype(np.complex64))[:n]
    yr, yi = pallas_kernels.ofs_filter_planar(
        x.real.astype(np.float32), x.imag.astype(np.float32),
        np.zeros(plan.tail_len, np.float32), np.zeros(plan.tail_len, np.float32),
        plan, interpret=True)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    tol = 1e-4 * np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=tol)


def test_pfb_oversampled_fused_matches_xla_path():
    """pfb_oversampled_fused (R|M) vs channelizer._pfb_oversampled_planar +
    unscaled inverse DFT on the same virtual stream, incl. rotation."""
    m, r = 16, 8
    fs = 100e6
    proto = firdes.low_pass(1.0, fs, fs / (2 * m) * 0.8, fs / (2 * m) * 0.2)
    proto = np.concatenate([proto, np.zeros((-len(proto)) % m, np.float32)])
    taps_rm, ntaps = channelizer._pfb_constants(proto, m, r)
    w = taps_rm.shape[0]
    assert ntaps == w * m
    n = 4096                            # multiple of 128·tile_rows (8)
    H = pallas_kernels.OS_TAIL_LEN
    rng = np.random.default_rng(21)
    vr = rng.standard_normal(H + n).astype(np.float32)
    vi = rng.standard_normal(H + n).astype(np.float32)

    zr, zi = pallas_kernels.pfb_oversampled_fused(
        vr[H:], vi[H:], vr[:H], vi[:H], np.asarray(taps_rm), m, r,
        tile_rows=8, interpret=True)
    nout = n // r
    assert zr.shape == (nout, m)

    ar, ai = channelizer._pfb_oversampled_planar(
        vr[: w * m - 1 + nout * r], vi[: w * m - 1 + nout * r],
        np.asarray(taps_rm), m, r, w * m, nout)
    want = planar.ifft_unscaled(planar.PC(ar, ai))
    np.testing.assert_allclose(np.asarray(zr), np.asarray(want.re),
                               rtol=1e-3, atol=2e-3 * np.abs(want.re).max())
    np.testing.assert_allclose(np.asarray(zi), np.asarray(want.im),
                               rtol=1e-3, atol=2e-3 * np.abs(want.im).max())


def test_pfb_oversampled_fused_streaming_continuity():
    """Two consecutive fused calls (carried tail + i_offset) equal one XLA
    pass over the concatenated stream — the rotation phase is global."""
    m, r = 16, 4                         # 4x oversampled, L = 4 phases
    fs = 100e6
    proto = firdes.low_pass(1.0, fs, fs / (2 * m) * 0.8, fs / (2 * m) * 0.2)
    proto = np.concatenate([proto, np.zeros((-len(proto)) % m, np.float32)])
    taps_rm, _ = channelizer._pfb_constants(proto, m, r)
    w = taps_rm.shape[0]
    H = pallas_kernels.OS_TAIL_LEN
    n1 = n2 = 2048
    rng = np.random.default_rng(5)
    v = (rng.standard_normal((2, H + n1 + n2)).astype(np.float32))
    f1, f2 = v[:, H : H + n1], v[:, H + n1 :]
    t1 = v[:, :H]
    t2 = v[:, n1 : H + n1]               # last H samples before frame 2

    z1 = pallas_kernels.pfb_oversampled_fused(
        f1[0], f1[1], t1[0], t1[1], np.asarray(taps_rm), m, r,
        tile_rows=8, interpret=True)
    z2 = pallas_kernels.pfb_oversampled_fused(
        f2[0], f2[1], t2[0], t2[1], np.asarray(taps_rm), m, r,
        tile_rows=8, interpret=True, i_offset=n1 // r)
    got_re = np.concatenate([np.asarray(z1[0]), np.asarray(z2[0])])
    got_im = np.concatenate([np.asarray(z1[1]), np.asarray(z2[1])])

    nout = (n1 + n2) // r
    ar, ai = channelizer._pfb_oversampled_planar(
        v[0, : w * m - 1 + nout * r], v[1, : w * m - 1 + nout * r],
        np.asarray(taps_rm), m, r, w * m, nout)
    want = planar.ifft_unscaled(planar.PC(ar, ai))
    np.testing.assert_allclose(got_re, np.asarray(want.re), rtol=1e-3,
                               atol=2e-3 * np.abs(want.re).max())
    np.testing.assert_allclose(got_im, np.asarray(want.im), rtol=1e-3,
                               atol=2e-3 * np.abs(want.im).max())


def test_fx_v2_precision_kwarg():
    """precision="float32" plumbs through (on hardware it forces exact
    multi-pass f32 MXU dots — measured 1.7e-7 rel vs this interpreter path,
    vs 2.8e-3 for the default single bf16-operand pass; BENCH_TPU.md)."""
    nstreams, m = 2, 16
    fs = 100e6
    proto = firdes.low_pass(1.0, fs, fs / (2 * m) * 0.8, fs / (2 * m) * 0.2)
    proto = np.concatenate([proto, np.zeros((-len(proto)) % m, np.float32)])
    taps_rm, _ = channelizer._pfb_constants(proto, m, m)
    big_h = pallas_kernels.FX_TAIL_LEN
    n = 256 * m
    rng = np.random.default_rng(5)
    xr = rng.standard_normal((nstreams, n)).astype(np.float32)
    xi = rng.standard_normal((nstreams, n)).astype(np.float32)
    tr = np.zeros((nstreams, big_h), np.float32)
    fd0, xe0 = pallas_kernels.fx_correlate_streams_v2(
        xr, xi, tr, tr, np.asarray(taps_rm), nstreams, m, tile_rows=8,
        interpret=True)
    fd1, xe1 = pallas_kernels.fx_correlate_streams_v2(
        xr, xi, tr, tr, np.asarray(taps_rm), nstreams, m, tile_rows=8,
        interpret=True, precision="float32")
    np.testing.assert_allclose(np.asarray(fd1), np.asarray(fd0),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(xe1), np.asarray(xe0),
                               rtol=1e-6, atol=1e-6)


def test_fx_v2_deep_prototype():
    """Round 4: the flagship kernel's prototype-depth ceiling is removed —
    a production-class 1600-tap prototype (w=100 branches, nq=14 banded
    groups -> the fori accumulation path; f32 halo grows 8 -> 16 rows) must
    run fused and match the XLA reference math on the same virtual
    stream.  Mirrors the os_tail_len treatment (VERDICT r3 item 5);
    reference depth freedom: lib/clFilter_impl.cc:152-243."""
    import jax.numpy as jnp

    from clenabled_tpu.dsp import xengine

    a, m = 2, 16
    ntaps0 = 1600
    proto = (np.sinc(np.linspace(-4, 4, ntaps0))
             * np.hanning(ntaps0)).astype(np.float32)
    proto = np.concatenate([proto, np.zeros((-len(proto)) % m, np.float32)])
    taps_rm, ntaps = channelizer._pfb_constants(proto, m, m)
    w = taps_rm.shape[0]
    assert w > 8 * 128 // m            # deep enough to force the fori path

    big_h = pallas_kernels.fx_tail_len(jnp.float32, m, ntaps)
    assert big_h == 2048               # halo grew 8 -> 16 rows
    assert pallas_kernels.fx_tail_len(jnp.float32) == 1024  # default intact

    nout = 1024
    n = nout * m
    rng = np.random.default_rng(17)
    xr = rng.standard_normal((a, n)).astype(np.float32)
    xi = rng.standard_normal((a, n)).astype(np.float32)
    tr = rng.standard_normal((a, big_h)).astype(np.float32)
    ti = rng.standard_normal((a, big_h)).astype(np.float32)

    fd2, xe2 = pallas_kernels.fx_correlate_streams_v2(
        xr, xi, tr, ti, np.asarray(taps_rm), a, m, tile_rows=16,
        interpret=True)
    fd2, xe2 = np.asarray(fd2), np.asarray(xe2)

    # XLA reference on the identical virtual stream (tail ++ frame)
    hlen = ntaps - 1
    vfeed = np.concatenate(
        [np.concatenate([tr, ti], axis=0),
         np.concatenate([xr, xi], axis=0)], axis=-1)
    full = vfeed[:, : hlen + n]
    acc = channelizer._branch_sums_critical_batched(full, taps_rm, m,
                                                    ntaps, nout)
    spec = planar.ifft_unscaled(
        planar.PC(np.asarray(acc[:a]), np.asarray(acc[a:])))
    zc = planar.to_complex(spec)
    want_fd = np.stack([
        np.abs(np.fft.ifft(zc[0] * np.conj(zc[p]), axis=-1) * m).sum(axis=0)
        for p in range(1, a)])
    np.testing.assert_allclose(fd2, want_fd, rtol=1e-4,
                               atol=1e-4 * np.abs(want_fd).max())
    zt = np.transpose(zc, (1, 0, 2))[..., None]
    want_x = np.asarray(
        xengine.xengine_correlate(zt.astype(np.complex64), npol=1))
    scale = np.abs(want_x).max()
    np.testing.assert_allclose(xe2[:, :m], want_x[..., 0].real.T,
                               rtol=1e-4, atol=1e-4 * scale)
    np.testing.assert_allclose(xe2[:, m:], want_x[..., 0].imag.T,
                               rtol=1e-4, atol=1e-4 * scale)


def test_fx_pipeline_fused_deep_prototype_wiring():
    """make_fx_pipeline_fused sizes carried tails from the prototype depth
    and runs the 1600-tap design end-to-end (interpret), matching the
    planar XLA pipeline with the same prototype on the aligned window."""
    import jax.numpy as jnp

    from clenabled_tpu.pipelines import (FxPipelineConfig,
                                         make_fx_pipeline_fused,
                                         make_fx_pipeline_planar)

    ntaps0 = 1600
    proto = (np.sinc(np.linspace(-4, 4, ntaps0))
             * np.hanning(ntaps0)).astype(np.float32)
    cfg = FxPipelineConfig(num_antennas=2, num_channels=16,
                           samples_per_step=1 << 15)
    fn, (xr0, xi0, tr0, ti0) = make_fx_pipeline_fused(
        cfg, interpret=True, proto_taps=proto)
    assert tr0.shape[-1] == 2048       # deep-proto tail
    rng = np.random.default_rng(23)
    n = cfg.samples_per_step
    xr = rng.standard_normal((2, n)).astype(np.float32)
    xi = rng.standard_normal((2, n)).astype(np.float32)
    tr = rng.standard_normal(tr0.shape).astype(np.float32)
    ti = rng.standard_normal(ti0.shape).astype(np.float32)
    fd_f, xre_f, xim_f, ntr, nti = fn(xr, xi, tr, ti)
    np.testing.assert_array_equal(np.asarray(ntr), xr[:, n - 2048:])

    # planar oracle on the shifted window (fused lags by tail_len)
    fn_p, (pxr, pxi, phr, phi) = make_fx_pipeline_planar(
        cfg, use_pallas=False, proto_taps=proto)
    hlen = phr.shape[-1]               # ntaps - 1
    sr = np.concatenate([tr, xr], axis=-1)
    si = np.concatenate([ti, xi], axis=-1)
    # the fused step covers virtual-stream window [0, tail + n); the
    # planar oracle consumes hist(hlen) ++ frame(n) over the same window
    fd_p, xre_p, xim_p, _, _ = fn_p(
        sr[:, hlen : hlen + n], si[:, hlen : hlen + n],
        sr[:, :hlen], si[:, :hlen])
    np.testing.assert_allclose(np.asarray(fd_f), np.asarray(fd_p),
                               rtol=1e-4,
                               atol=1e-4 * np.abs(np.asarray(fd_p)).max())
    sc = np.abs(np.asarray(xre_p)).max()
    np.testing.assert_allclose(np.asarray(xre_f), np.asarray(xre_p),
                               rtol=1e-4, atol=1e-4 * sc)
    np.testing.assert_allclose(np.asarray(xim_f), np.asarray(xim_p),
                               rtol=1e-4, atol=1e-4 * sc)


def test_fx_v2_deep_prototype_narrow_ingest():
    """Deep prototype + int8 ingest: the fori branch path widens narrow
    feeds through the f32 VMEM scratch (Mosaic rejects dynamic sublane
    starts on narrow memrefs — round-4 job 314); must match the f32
    kernel exactly on int8-representable samples."""
    import jax.numpy as jnp

    a, m = 2, 16
    ntaps0 = 1600
    proto = (np.sinc(np.linspace(-4, 4, ntaps0))
             * np.hanning(ntaps0)).astype(np.float32)
    proto = np.concatenate([proto, np.zeros((-len(proto)) % m, np.float32)])
    taps_rm, ntaps = channelizer._pfb_constants(proto, m, m)

    tail8 = pallas_kernels.fx_tail_len(jnp.int8, m, ntaps)
    assert tail8 == 4096                # int8 sublane floor already covers
    rng = np.random.default_rng(29)
    n = 1 << 14
    xr8 = rng.integers(-63, 64, (a, n)).astype(np.int8)
    xi8 = rng.integers(-63, 64, (a, n)).astype(np.int8)
    tr8 = rng.integers(-63, 64, (a, tail8)).astype(np.int8)
    ti8 = rng.integers(-63, 64, (a, tail8)).astype(np.int8)
    fd8, xe8 = pallas_kernels.fx_correlate_streams_v2(
        xr8, xi8, tr8, ti8, np.asarray(taps_rm), a, m, tile_rows=32,
        interpret=True, mxu_dtype=jnp.float32)

    # f32 oracle over the SAME virtual-stream window (re-framed so the
    # deeper int8 tail lines up — as test_fx_v2_narrow_ingest_dtypes)
    tail_f = pallas_kernels.fx_tail_len(jnp.float32, m, ntaps)
    as32 = lambda v: np.asarray(v, np.float32)
    sr = np.concatenate([as32(tr8), as32(xr8)], axis=-1)
    si = np.concatenate([as32(ti8), as32(xi8)], axis=-1)
    # both virtual streams start at sr[0]; outputs cover positions [0, n)
    # regardless of tail depth (the tail only sets the halo)
    fd_f, xe_f = pallas_kernels.fx_correlate_streams_v2(
        sr[:, tail_f: tail_f + n], si[:, tail_f: tail_f + n],
        sr[:, :tail_f], si[:, :tail_f],
        np.asarray(taps_rm), a, m, tile_rows=32, interpret=True)
    np.testing.assert_allclose(np.asarray(fd8), np.asarray(fd_f),
                               rtol=1e-5, atol=1e-5 * np.abs(fd_f).max())
    np.testing.assert_allclose(np.asarray(xe8), np.asarray(xe_f),
                               rtol=1e-5, atol=1e-5 * np.abs(np.asarray(xe_f)).max())


def test_fft_batched_fused_matches_planar():
    """Round-4 fused batched FFT kernel: one Pallas pass (window → block
    DFT_n2 → twiddle → DFT_128 → in-VMEM reorder) must match planar.fft
    for forward/inverse, multiple sizes, windowed, multi-tile grids."""
    import jax.numpy as jnp

    from clenabled_tpu.dsp import window as win_mod

    rng = np.random.default_rng(41)
    for fft_size, nvec in [(2048, 5), (512, 9), (256, 4)]:
        n = fft_size * nvec
        xr = rng.standard_normal(n).astype(np.float32)
        xi = rng.standard_normal(n).astype(np.float32)
        for inverse in (False, True):
            got_r, got_i = pallas_kernels.fft_batched_fused(
                jnp.asarray(xr), jnp.asarray(xi), fft_size,
                inverse=inverse, interpret=True)
            want = planar.fft(
                planar.PC(jnp.asarray(xr.reshape(nvec, fft_size)),
                          jnp.asarray(xi.reshape(nvec, fft_size))),
                inverse=inverse)
            scale = np.abs(np.asarray(want.re)).max()
            np.testing.assert_allclose(
                np.asarray(got_r).reshape(nvec, fft_size),
                np.asarray(want.re), rtol=1e-4, atol=1e-4 * scale,
                err_msg=f"size {fft_size} inv {inverse}")
            np.testing.assert_allclose(
                np.asarray(got_i).reshape(nvec, fft_size),
                np.asarray(want.im), rtol=1e-4, atol=1e-4 * scale)
    # windowed forward
    w = win_mod.blackman_harris(2048)
    n = 2048 * 3
    xr = rng.standard_normal(n).astype(np.float32)
    xi = rng.standard_normal(n).astype(np.float32)
    got_r, got_i = pallas_kernels.fft_batched_fused(
        jnp.asarray(xr), jnp.asarray(xi), 2048, window=w, interpret=True)
    xw = (xr.reshape(3, 2048) * np.asarray(w),
          xi.reshape(3, 2048) * np.asarray(w))
    want = planar.fft(planar.PC(jnp.asarray(xw[0]), jnp.asarray(xw[1])))
    scale = np.abs(np.asarray(want.re)).max()
    np.testing.assert_allclose(np.asarray(got_r).reshape(3, 2048),
                               np.asarray(want.re), rtol=1e-4,
                               atol=1e-4 * scale)


def test_fir_direct_mxu_matches_vpu():
    """Round-4 banded-matmul FIR: fir_direct_mxu must match fir_direct
    (the VPU shifted-MAC form) for shallow and DEEP (nq > 8, fori path)
    tap counts, including multi-tile grids."""
    rng = np.random.default_rng(31)
    for ntaps, tile in [(49, 8), (241, 8), (1600, 4)]:
        taps = rng.standard_normal(ntaps).astype(np.float32)
        n = 128 * 32
        x = rng.standard_normal(ntaps - 1 + n).astype(np.float32)
        want = np.asarray(pallas_kernels.fir_direct(
            x, taps, tile_rows=8, interpret=True))
        got = np.asarray(pallas_kernels.fir_direct_mxu(
            x, taps, tile_rows=tile, interpret=True))
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5 * scale,
                                   err_msg=f"ntaps {ntaps}")


def test_fir_direct_mxu_rejects_misaligned_frames():
    """ADVICE r4: fir_direct_mxu validates the frame length up front
    (mirroring fir_direct) instead of dying in an opaque reshape or a
    ZeroDivisionError for n < 128."""
    taps = np.ones(9, np.float32)
    for bad_n in (100, 64, 0):
        x = np.zeros(8 + bad_n, np.float32)
        with pytest.raises(ValueError, match="multiple"):
            pallas_kernels.fir_direct_mxu(x, taps, interpret=True)


def test_make_fir_filter_planar_precision_kwarg():
    """ADVICE r4: precision="float32" plumbs through make_fir_filter_planar
    to fir_direct_mxu (exact multi-pass f32 dots on TPU).  On the CPU
    interpreter dots are exact either way — this pins the plumbing and
    parity, the on-chip accuracy delta is documented in fir_direct_mxu."""
    from clenabled_tpu.dsp import fir_filter as dsp_fir
    from clenabled_tpu.dsp import planar

    rng = np.random.default_rng(7)
    taps = rng.standard_normal(33).astype(np.float32)
    n = 128 * 8
    init, apply_exact = dsp_fir.make_fir_filter_planar(
        taps, tile_rows=8, interpret=True, precision="float32")
    _, apply_default = dsp_fir.make_fir_filter_planar(
        taps, tile_rows=8, interpret=True)
    fr = planar.PC(jnp.asarray(rng.standard_normal(n), jnp.float32),
                   jnp.asarray(rng.standard_normal(n), jnp.float32))
    _, y_exact = apply_exact(init(), fr)
    _, y_default = apply_default(init(), fr)
    want = np.convolve(np.concatenate([np.zeros(32), np.asarray(fr.re)]),
                       taps, mode="valid")
    scale = np.abs(want).max()
    np.testing.assert_allclose(np.asarray(y_exact.re), want,
                               rtol=1e-5, atol=1e-5 * scale)
    np.testing.assert_allclose(np.asarray(y_default.re), want,
                               rtol=1e-5, atol=1e-5 * scale)


def test_fx_v2_deep_window_matches_fori():
    """Round 5: the im2col window strategy (deep default) must equal the
    round-4 fori path bit-for-bit in interpret mode, f32 and int8."""
    import jax.numpy as jnp

    a, m = 2, 16
    ntaps0 = 1600
    proto = (np.sinc(np.linspace(-4, 4, ntaps0))
             * np.hanning(ntaps0)).astype(np.float32)
    proto = np.concatenate([proto, np.zeros((-len(proto)) % m, np.float32)])
    taps_rm, ntaps = channelizer._pfb_constants(proto, m, m)

    for dt in (jnp.float32, jnp.int8):
        big_h = pallas_kernels.fx_tail_len(dt, m, ntaps)
        n = 1024 * m
        rng = np.random.default_rng(23)
        if dt == jnp.float32:
            mk = lambda s: rng.standard_normal(s).astype(np.float32)
        else:
            mk = lambda s: rng.integers(-63, 64, s).astype(np.int8)
        xr, xi = mk((a, n)), mk((a, n))
        tr, ti = mk((a, big_h)), mk((a, big_h))
        outs = {}
        for strat in ("window", "fori"):
            fd, xe = pallas_kernels.fx_correlate_streams_v2(
                np.asarray(xr), xi, tr, ti, np.asarray(taps_rm), a, m,
                tile_rows=32, interpret=True, deep_strategy=strat)
            outs[strat] = (np.asarray(fd), np.asarray(xe))
        # one deep dot accumulates in a different order than nq chained
        # dots — identical math, last-ulp f32 rounding differences only
        np.testing.assert_allclose(outs["window"][0], outs["fori"][0],
                                   rtol=1e-5, err_msg=f"{dt} fd")
        np.testing.assert_allclose(outs["window"][1], outs["fori"][1],
                                   rtol=1e-5,
                                   atol=1e-6 * np.abs(outs["fori"][1]).max(),
                                   err_msg=f"{dt} xe")
