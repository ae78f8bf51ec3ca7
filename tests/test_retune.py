"""Live set_taps: the reference rebuilds kernels/buffers at runtime while
the flowgraph keeps running (lib/clFilter_impl.cc:417-479).  Here
Runner.set_taps re-traces the step and Block.migrate_state carries the
filter tail across the rebuild — where old and new taps agree the output
stream is identical to an uninterrupted run."""

import numpy as np
import pytest

from clenabled_tpu import blocks
from clenabled_tpu.streaming import Flowgraph


def _run_chain(taps_a, taps_b, frames, use_time, retune_after, frame,
               decimation=1):
    """Run a Filter over `frames` frames, retuning taps_a→taps_b after
    `retune_after` frames.  Returns concatenated output."""
    flt = blocks.Filter(decimation, taps_a, use_time=use_time)
    g = Flowgraph()
    g.external_input(flt)
    tap = g.tap(flt, name="y")
    r = g.compile(frame_size=frame)
    outs = []
    for i, x in enumerate(frames):
        if i == retune_after:
            r.set_taps(flt, taps_b)
        outs.append(np.asarray(r.step(x)[tap]))
    return np.concatenate(outs)


def _frames(n_frames, frame, seed=0):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal(n_frames * frame)
         + 1j * rng.standard_normal(n_frames * frame)).astype(np.complex64)
    return x, [x[i * frame:(i + 1) * frame] for i in range(n_frames)]


@pytest.mark.parametrize("use_time", [True, False])
def test_retune_same_taps_stream_unchanged(use_time):
    """Retune to IDENTICAL taps mid-stream == no retune at all."""
    taps = np.hanning(33).astype(np.float32)
    frame = 1024 if use_time else blocks.Filter(
        1, taps, use_time=False).quantum * 4
    x, frames = _frames(6, frame)
    base = _run_chain(taps, taps, frames, use_time, retune_after=None,
                      frame=frame)
    retuned = _run_chain(taps, taps.copy(), frames, use_time, retune_after=3,
                         frame=frame)
    np.testing.assert_array_equal(base, retuned)


def test_retune_td_new_taps_exact_from_retune_point():
    """TD state is input-domain history, so with unchanged ntaps the
    post-retune output equals a convolution of the CONTINUOUS input with
    the new taps from the very first post-retune sample."""
    taps_a = np.hanning(33).astype(np.float32)
    taps_b = (np.hanning(33) * np.cos(np.arange(33))).astype(np.float32)
    frame = 512
    x, frames = _frames(6, frame, seed=1)
    got = _run_chain(taps_a, taps_b, frames, True, retune_after=3,
                     frame=frame)
    want_post = np.convolve(x, taps_b)[:len(x)][3 * frame:]
    np.testing.assert_allclose(got[3 * frame:], want_post, rtol=1e-4,
                               atol=1e-4)


@pytest.mark.parametrize("ntaps_b", [17, 65])
def test_retune_td_ntaps_change(ntaps_b):
    """Tap-count change: history is truncated (keep most recent) or
    left-padded with zeros; outputs are exact once the new filter window
    fits inside the kept history."""
    ntaps_a = 33
    taps_a = np.hanning(ntaps_a).astype(np.float32)
    taps_b = np.hanning(ntaps_b).astype(np.float32)
    frame = 512
    x, frames = _frames(6, frame, seed=2)
    got = _run_chain(taps_a, taps_b, frames, True, retune_after=3,
                     frame=frame)
    want_post = np.convolve(x, taps_b)[:len(x)][3 * frame:]
    settle = max(0, ntaps_b - ntaps_a)
    np.testing.assert_allclose(got[3 * frame + settle:], want_post[settle:],
                               rtol=1e-4, atol=1e-4)


def test_retune_ofa_new_taps_post_transient():
    """FD (overlap-add) state is the output-domain tail: after a retune the
    cross-boundary contributions still use the old taps (exactly the
    reference's behavior — the carried tail was computed before set_taps),
    so outputs match the new-tap convolution after ntaps−1 samples."""
    ntaps = 33
    taps_a = np.hanning(ntaps).astype(np.float32)
    taps_b = (np.hanning(ntaps) * np.cos(np.arange(ntaps))).astype(np.float32)
    flt = blocks.Filter(1, taps_a, use_time=False)
    frame = flt.quantum * 4
    x, frames = _frames(6, frame, seed=3)
    got = _run_chain(taps_a, taps_b, frames, False, retune_after=3,
                     frame=frame)
    want_post = np.convolve(x, taps_b)[:len(x)][3 * frame:]
    np.testing.assert_allclose(got[3 * frame + ntaps - 1:],
                               want_post[ntaps - 1:], rtol=1e-4, atol=1e-4)


def test_retune_quantum_violation_raises():
    """A retune that changes the OFA chunk quantum past the compiled frame
    size must fail loudly, not corrupt the stream."""
    taps_a = np.hanning(33).astype(np.float32)
    flt = blocks.Filter(1, taps_a, use_time=False)
    g = Flowgraph()
    g.external_input(flt)
    g.tap(flt, name="y")
    frame = flt.quantum
    r = g.compile(frame_size=frame)
    r.step(np.zeros(frame, np.complex64))
    big = np.hanning(4097).astype(np.float32)  # quantum grows past frame
    old_taps = np.asarray(flt.taps())
    old_quantum = flt.quantum
    with pytest.raises(ValueError):
        r.set_taps(flt, big)
    # atomic: the failed retune rolled the block back — it still reports
    # the OLD taps/quantum and the stream keeps running on them
    np.testing.assert_array_equal(np.asarray(flt.taps()), old_taps)
    assert flt.quantum == old_quantum
    r.step(np.zeros(frame, np.complex64))


def test_retune_downstream_state_untouched():
    """refresh() migrates only the reconfigured block; other blocks'
    carried state (here a decimating OFA filter's tail) flows on."""
    taps = np.hanning(33).astype(np.float32)
    taps2 = (np.hanning(33) * 0.5).astype(np.float32)
    f1 = blocks.Filter(1, taps, use_time=True, name="f1")
    f2 = blocks.Filter(1, taps, use_time=True, name="f2")
    g = Flowgraph()
    g.external_input(f1)
    g.connect(f1, f2)
    tap = g.tap(f2, name="y")
    frame = 512
    x, frames = _frames(6, frame, seed=4)
    r = g.compile(frame_size=frame)
    outs = []
    for i, fr in enumerate(frames):
        if i == 3:
            r.set_taps(f1, taps2)
        outs.append(np.asarray(r.step(fr)[tap]))
    got = np.concatenate(outs)
    # reference: conv chain where f1's taps switch at sample 3·frame
    y1_a = np.convolve(x, taps)[:len(x)]
    y1_b = np.convolve(x, taps2)[:len(x)]
    y1 = np.concatenate([y1_a[:3 * frame], y1_b[3 * frame:]])
    want = np.convolve(y1, taps)[:len(x)]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
