"""Tests for signal source (carried phase) and demodulators (quadrature
demod history, Costas loop recurrence vs a numpy reference loop)."""

import math

import numpy as np

from clenabled_tpu.dsp import demod, siggen


def test_siggen_complex_continuous_across_frames():
    fs, f0, n = 1e6, 123e3, 4096
    init, gen = siggen.make_signal_source(fs, siggen.SIGSOURCE_COS, f0, 1.0, n)
    state = init()
    frames = []
    for _ in range(4):
        state, frame = gen(state)
        frames.append(np.asarray(frame))
    got = np.concatenate(frames)
    t = np.arange(4 * n, dtype=np.float64)
    ang = 2 * np.pi * f0 / fs * t
    want = np.cos(ang) + 1j * np.sin(ang)
    # float32 trig on wrapped angles: expect ~1e-4 absolute agreement
    np.testing.assert_allclose(got, want.astype(np.complex64), atol=5e-4)


def test_siggen_float_waveforms():
    fs, f0, n = 48e3, 1e3, 480
    for wf, ref in [(siggen.SIGSOURCE_COS, np.cos), (siggen.SIGSOURCE_SIN, np.sin)]:
        init, gen = siggen.make_signal_source(fs, wf, f0, 2.0, n, dtype=np.float32)
        _, frame = gen(init())
        ang = 2 * np.pi * f0 / fs * np.arange(n)
        np.testing.assert_allclose(np.asarray(frame), 2.0 * ref(ang), atol=5e-4)


def test_quadrature_demod_matches_reference_formula():
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(1000) + 1j * rng.standard_normal(1000)).astype(
        np.complex64
    )
    gain = 0.7
    y, last = demod.quadrature_demod(x, gain)
    # reference: out[i] = gain*atan2(imag, real) of x[i+1]*conj(x[i]), with
    # 1-sample history; our frame-aligned form outputs y[i] from (x[i-1],x[i])
    prod = x[1:] * np.conj(x[:-1])
    want = gain * np.arctan2(prod.imag, prod.real)
    np.testing.assert_allclose(np.asarray(y)[1:], want, rtol=1e-4, atol=1e-5)
    assert abs(np.asarray(y)[0]) < 1e-6  # first sample vs itself (fma noise)
    assert np.asarray(last)[0] == x[-1]


def test_quadrature_demod_fm_tone():
    # constant-frequency tone → constant output = gain * 2π f/fs
    fs, f0, n = 1e6, 50e3, 2048
    t = np.arange(n) / fs
    x = np.exp(2j * np.pi * f0 * t).astype(np.complex64)
    y, _ = demod.quadrature_demod(x, 1.0)
    np.testing.assert_allclose(
        np.asarray(y)[1:], 2 * np.pi * f0 / fs, rtol=1e-3
    )


def _costas_numpy(x, loop_bw, order, n_out=None):
    """Reference recurrence transcribed from lib/clCostasLoop_impl.cc:151-312."""
    alpha, beta = demod.costas_gains(loop_bw)
    phase = freq = 0.0
    out = np.zeros_like(x)
    for i in range(len(x)):
        n_r, n_i = math.cos(-phase), math.sin(-phase)
        o_r = x[i].real * n_r - x[i].imag * n_i
        o_i = x[i].real * n_i + x[i].imag * n_r
        out[i] = o_r + 1j * o_i
        if order == 2:
            error = o_r * o_i
        else:
            error = (1.0 if o_r > 0 else -1.0) * o_i - (
                1.0 if o_i > 0 else -1.0
            ) * o_r
        error = 0.5 * (abs(error + 1) - abs(error - 1))
        freq += beta * error
        phase += freq + alpha * error
        if phase > 2 * math.pi or phase < -2 * math.pi:
            phase = (phase / (2 * math.pi) - int(phase / (2 * math.pi))) * 2 * math.pi
        freq = min(max(freq, -1.0), 1.0)
    return out


def test_costas_matches_reference_recurrence():
    rng = np.random.default_rng(11)
    # BPSK with small phase offset
    bits = rng.integers(0, 2, 512) * 2 - 1
    x = (bits * np.exp(1j * 0.3)).astype(np.complex64)
    for order in (2, 4):
        run = demod.make_costas_loop(0.02, order)
        state, out = run(demod.costas_init(), x)
        want = _costas_numpy(x.astype(np.complex128), 0.02, order)
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-3, atol=2e-3)


def test_costas_locks_bpsk_phase_offset():
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, 8000) * 2 - 1
    x = (bits * np.exp(1j * 0.5)).astype(np.complex64)
    run = demod.make_costas_loop(0.05, 2)
    state, out = run(demod.costas_init(), x)
    tail = np.asarray(out)[-1000:]
    # locked: imaginary part driven to ~0
    assert np.abs(tail.imag).mean() < 0.02
    # carried state: a second frame starts already locked (no re-acquisition)
    _, out2 = run(state, x)
    head = np.asarray(out2)[:200]
    assert np.abs(head.imag).mean() < 0.02


def test_costas_order_validated():
    import pytest

    with pytest.raises(ValueError):
        demod.make_costas_loop(0.02, 3)


def test_costas_chunked_matches_sequential():
    """Speculative chunk-parallel Costas tracks the sequential scan across
    frames: bitwise when the certificate passes, within float dither of
    the branch-corrected trajectory otherwise."""
    import jax.numpy as jnp

    from clenabled_tpu.dsp import planar

    rng = np.random.default_rng(0)
    n = 4096
    nfr = 3
    # BPSK at a small carrier offset: the loop locks quickly at bw=0.1
    bits = rng.integers(0, 2, nfr * n) * 2 - 1
    t = np.arange(nfr * n)
    x = (bits * np.exp(1j * (2 * np.pi * 0.002 * t + 0.7))).astype(np.complex64)

    run_seq = demod.make_costas_loop_planar(0.1, 2)
    run_chk = demod.make_costas_loop_chunked(0.1, 2, chunk=1024, warmup=512)
    seq_state = demod.costas_init()
    chk_state = run_chk.init_state()
    for k in range(nfr):
        fr = planar.PC(jnp.asarray(x.real[k * n:(k + 1) * n]),
                       jnp.asarray(x.imag[k * n:(k + 1) * n]))
        seq_state, want = run_seq(seq_state, fr)
        chk_state, got, diag = run_chk(chk_state, fr)
        assert float(diag["residual"]) < 1e-3
        if bool(diag["exact"]):
            np.testing.assert_array_equal(np.asarray(got.re),
                                          np.asarray(want.re))
            np.testing.assert_array_equal(np.asarray(got.im),
                                          np.asarray(want.im))
        else:
            # branch-corrected trajectory: same signal, float dither only
            # (skip the first loop time constant after each seam)
            np.testing.assert_allclose(np.asarray(got.re),
                                       np.asarray(want.re), atol=2e-2)
            np.testing.assert_allclose(np.asarray(got.im),
                                       np.asarray(want.im), atol=2e-2)


def test_costas_chunked_ulp_residual_when_locked():
    """After acquisition the seam residual sits at the float32 ulp floor
    (trajectories contract to within rounding dither but modulated inputs
    prevent a bitwise merge) and no branch hops occur."""
    import jax.numpy as jnp

    from clenabled_tpu.dsp import planar

    rng = np.random.default_rng(3)
    n = 1 << 15
    bits = rng.integers(0, 2, 2 * n) * 2 - 1
    t = np.arange(2 * n)
    x = (bits * np.exp(1j * (2 * np.pi * 0.002 * t + 0.7))).astype(np.complex64)
    run_chk = demod.make_costas_loop_chunked(0.1, 2, chunk=4096, warmup=2048)
    st = run_chk.init_state()
    for k in range(2):
        fr = planar.PC(jnp.asarray(x.real[k * n:(k + 1) * n]),
                       jnp.asarray(x.imag[k * n:(k + 1) * n]))
        st, _, diag = run_chk(st, fr)
        assert float(diag["residual"]) < 1e-5
    assert int(diag["branch_hops"]) == 0


def test_costas_chunked_validates_frame():
    import pytest

    from clenabled_tpu.dsp import planar

    run = demod.make_costas_loop_chunked(0.1, 2, chunk=1024, warmup=256)
    st = run.init_state()
    with pytest.raises(ValueError):
        run(st, planar.PC(np.zeros(1000, np.float32),
                          np.zeros(1000, np.float32)))


def test_qdemod_fused_kernel_matches_xla():
    """Round-4 Pallas qdemod (lane-roll shift + SMEM cross-tile carry):
    matches the XLA form to the in-kernel polynomial atan2's ~1e-5 rad
    envelope, including the carried-sample seam and multi-tile carries."""
    import jax.numpy as jnp

    from clenabled_tpu.dsp import demod, pallas_kernels, planar

    rng = np.random.default_rng(7)
    n = 4096                       # rows=32, tile 8 → 4 tiles in interpret
    xr = rng.standard_normal(n).astype(np.float32)
    xi = rng.standard_normal(n).astype(np.float32)
    last = planar.PC(jnp.asarray([0.3], jnp.float32),
                     jnp.asarray([-0.7], jnp.float32))
    want, nl = demod.quadrature_demod_planar(
        planar.PC(jnp.asarray(xr), jnp.asarray(xi)), 2.5, last,
        use_pallas=False)
    got = pallas_kernels.qdemod_fused(
        jnp.asarray(xr), jnp.asarray(xi), last.re[0], last.im[0], 2.5,
        tile_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=5e-5)
    # and through the auto-routing wrapper (forced on)
    got2, nl2 = demod.quadrature_demod_planar(
        planar.PC(jnp.asarray(xr), jnp.asarray(xi)), 2.5, last,
        use_pallas=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=1e-4, atol=5e-5)
    np.testing.assert_array_equal(np.asarray(nl2.re), np.asarray(nl.re))


def test_qdemod_planar_outconcat_matches_reference_form():
    """The round-4 sliced-views restructuring must equal the original
    input-concat formulation exactly (it is the same arithmetic on the
    same values, just without materialized shifted copies)."""
    import jax.numpy as jnp

    from clenabled_tpu.dsp import demod, planar

    rng = np.random.default_rng(8)
    n = 777                        # odd length, no kernel route
    x = planar.PC(jnp.asarray(rng.standard_normal(n), jnp.float32),
                  jnp.asarray(rng.standard_normal(n), jnp.float32))
    last = planar.PC(jnp.asarray([0.1], jnp.float32),
                     jnp.asarray([0.2], jnp.float32))
    got, _ = demod.quadrature_demod_planar(x, 1.5, last, use_pallas=False)
    pr = jnp.concatenate([last.re, x.re[:-1]])
    pi = jnp.concatenate([last.im, x.im[:-1]])
    prod = planar.mul_conj(x, planar.PC(pr, pi))
    want = jnp.float32(1.5) * jnp.arctan2(prod.im, prod.re)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_costas_scalar_matches_scan_exact_mode():
    """Round 5: the scalar-core Costas kernel runs the SAME exact
    recurrence as the lax.scan form — locked-loop trajectories agree to
    f32 rounding (1-ulp polynomial sincos), state carries across frames,
    and the block-level scalar=True option wires it up."""
    import jax.numpy as jnp

    from clenabled_tpu import blocks
    from clenabled_tpu.dsp import demod, pallas_kernels, planar

    rng = np.random.default_rng(9)
    n = 4096
    t = np.arange(n)
    sig = (np.exp(1j * (0.02 * t + 0.3))
           * np.where(rng.random(n) > 0.5, 1, -1))
    sig = sig + 0.01 * (rng.standard_normal(n)
                        + 1j * rng.standard_normal(n))
    xr = jnp.asarray(sig.real.astype(np.float32))
    xi = jnp.asarray(sig.imag.astype(np.float32))

    for order in (2, 4):
        run_scan = demod.make_costas_loop_planar(0.02, order)
        run_scal = demod.make_costas_loop_scalar(0.02, order, chunk=1024)
        st_a, st_b = demod.costas_init(), demod.costas_init()
        # two frames: state must carry across the frame seam identically
        for lo, hi in ((0, n // 2), (n // 2, n)):
            fr = planar.PC(xr[lo:hi], xi[lo:hi])
            st_a, out_a = run_scan(st_a, fr)
            st_b, out_b = run_scal(st_b, fr)
            np.testing.assert_allclose(np.asarray(out_b.re),
                                       np.asarray(out_a.re), atol=5e-6)
            np.testing.assert_allclose(np.asarray(out_b.im),
                                       np.asarray(out_a.im), atol=5e-6)
        np.testing.assert_allclose(float(st_b.phase), float(st_a.phase),
                                   atol=1e-5)
        np.testing.assert_allclose(float(st_b.freq), float(st_a.freq),
                                   atol=1e-6)

    import pytest

    blk = blocks.CostasLoop(0.02, 2, planar=True, scalar=True)
    st = blk.init_state()
    st, (out,), _ = blk.apply(st, [planar.PC(xr[:2048], xi[:2048])])
    assert np.asarray(out.re).shape == (2048,)

    with pytest.raises(ValueError, match="planar"):
        blocks.CostasLoop(0.02, 2, scalar=True)


def test_costas_scalar_flag_conflicts_rejected():
    """Review finding (round 5): scalar is exclusive with chunked and with
    num_streams — silent fallback to a different engine is an error."""
    import pytest

    from clenabled_tpu import blocks

    with pytest.raises(ValueError, match="exclusive"):
        blocks.CostasLoop(0.02, 2, planar=True, chunked=True, scalar=True)
    with pytest.raises(ValueError, match="exclusive"):
        blocks.CostasLoop(0.02, 2, planar=True, scalar=True, num_streams=4)
