"""Stream synchronizer + late block features (Fft num_streams,
SignalSource retune)."""

import numpy as np
import pytest

from clenabled_tpu import blocks
from clenabled_tpu.streaming import Flowgraph
from clenabled_tpu.streaming.sync import StreamSynchronizer


def test_synchronizer_aligns_to_highest_rounded():
    sync = StreamSynchronizer(4, block_multiple=16)
    plan = sync.plan([100, 117, 96, 110])
    # highest = 117, rounded up to multiple of 16 = 128
    assert plan.sync_timestamp == 128
    assert plan.discard_frames == [28, 11, 32, 18]
    assert not plan.synchronized
    plan2 = sync.plan([128, 128, 128, 128])
    assert plan2.synchronized and plan2.sync_timestamp == 128


def test_synchronizer_validates():
    sync = StreamSynchronizer(2)
    with pytest.raises(ValueError):
        sync.plan([1, 2, 3])


def _tagged(start, n, base):
    from clenabled_tpu.streaming.sync import TaggedFrame

    return [TaggedFrame(start + k, base + start + k) for k in range(n)]


def test_synchronized_ingest_discards_and_publishes_sync():
    """Tag-consuming alignment (clXEngine_impl.cc:1158-1226): leading
    frames are discarded so all streams start at the highest timestamp
    rounded to the block multiple, and the sync PDU callback fires."""
    from clenabled_tpu.streaming.sync import SynchronizedIngest

    synced = []
    ing = SynchronizedIngest(
        [_tagged(100, 60, 0), _tagged(117, 60, 1000), _tagged(96, 60, 2000)],
        block_multiple=16, on_sync=synced.append)
    tuples = list(ing)
    assert synced == [128]
    assert ing.discarded == [28, 11, 32]
    # all yielded tuples aligned; payloads carry the matching timestamps
    assert tuples[0] == (128, 1128, 2128)
    assert len(tuples) == 60 - 32          # shortest stream bounds output
    assert tuples[-1] == (155, 1155, 2155)


def test_synchronized_ingest_resyncs_after_drop():
    """A mid-stream dropped frame triggers re-alignment on the surviving
    streams and the on_resync notification (failure detection the
    reference lacks)."""
    from clenabled_tpu.streaming.sync import SynchronizedIngest, TaggedFrame

    a = _tagged(0, 40, 0)
    b = _tagged(0, 40, 1000)
    del b[20:23]  # stream b drops frames 20..22
    resyncs = []
    ing = SynchronizedIngest([a, b], block_multiple=1,
                             on_resync=lambda o, n: resyncs.append((o, n)))
    tuples = list(ing)
    assert resyncs == [(20, 23)]
    # aligned before the drop and after the resync, nothing interleaved
    assert tuples[:20] == [(k, 1000 + k) for k in range(20)]
    assert tuples[20:] == [(k, 1000 + k) for k in range(23, 40)]


def test_synchronized_ingest_drives_runner():
    """End-to-end: SynchronizedIngest feeds Runner.run directly (aligned
    multi-antenna feeds into a 2-input flowgraph)."""
    import jax.numpy as jnp

    from clenabled_tpu.streaming.sync import SynchronizedIngest, TaggedFrame

    fg = Flowgraph()
    mult = blocks.MultiplyConjugate()
    fg.external_input(mult, 0)
    fg.external_input(mult, 1)
    fg.tap(mult, name="prod")
    runner = fg.compile(frame_size=64)

    rng = np.random.default_rng(0)
    n_frames, offset = 8, 3
    base = rng.standard_normal((n_frames + offset, 64)) \
        + 1j * rng.standard_normal((n_frames + offset, 64))
    base = base.astype(np.complex64)
    s1 = [TaggedFrame(k, jnp.asarray(base[k])) for k in range(n_frames + offset)]
    s2 = [TaggedFrame(k + offset, jnp.asarray(base[k + offset]))
          for k in range(n_frames)]
    ing = SynchronizedIngest([s1, s2], block_multiple=1)
    outs = runner.run(ing)
    assert len(outs) == n_frames
    for k, out in enumerate(outs):
        want = base[k + offset] * np.conj(base[k + offset])
        np.testing.assert_allclose(np.asarray(out["prod"]), want, rtol=1e-5,
                                   atol=1e-5)


def test_fft_num_streams():
    rng = np.random.default_rng(0)
    fft = blocks.Fft(256, num_streams=3)
    g = Flowgraph()
    for p in range(3):
        g.external_input(fft, p)
    taps = [g.tap(fft, p, name=f"s{p}") for p in range(3)]
    r = g.compile(frame_size=512)
    xs = [(rng.standard_normal(512) + 1j * rng.standard_normal(512)
           ).astype(np.complex64) for _ in range(3)]
    out = r.step(*xs)
    for p in range(3):
        want = np.fft.fft(xs[p].reshape(2, 256), axis=-1).reshape(-1)
        np.testing.assert_allclose(np.asarray(out[taps[p]]), want,
                                   rtol=1e-4, atol=1e-3)


def test_signal_source_retune():
    fs, n = 1e6, 4096
    src = blocks.SignalSource(fs, 1, 100e3, 1.0, n)
    g = Flowgraph()
    g.connect(src, blocks.ComplexToMag())  # dummy consumer
    tap = g.tap(src, name="iq")
    r = g.compile()
    f1 = np.asarray(r.step()[tap])
    src.set_frequency(200e3)
    assert src.frequency() == 200e3
    r2 = g.compile()
    r2.states = r.states  # carried phase stays valid across retune
    f2 = np.asarray(r2.step()[tap])
    spec1 = np.abs(np.fft.fft(f1))
    spec2 = np.abs(np.fft.fft(f2))
    assert abs(spec1.argmax() / n * fs - 100e3) < fs / n
    assert abs(spec2.argmax() / n * fs - 200e3) < fs / n


def test_synchronized_ingest_resync_respects_block_multiple():
    """After a drop, re-alignment rounds UP to the block multiple so the
    resumed stream stays on the original integration grid (:111-116)."""
    from clenabled_tpu.streaming.sync import SynchronizedIngest

    a = _tagged(0, 40, 0)
    b = _tagged(0, 40, 1000)
    del b[18:21]  # b resumes at 21 — next grid point is 24
    resyncs = []
    ing = SynchronizedIngest([a, b], block_multiple=8,
                             on_resync=lambda o, n: resyncs.append((o, n)))
    tuples = list(ing)
    assert resyncs == [(18, 24)]
    assert tuples[:18] == [(k, 1000 + k) for k in range(18)]
    assert tuples[18:] == [(k, 1000 + k) for k in range(24, 40)]


def test_xcorrelate_processes_every_window_in_superframe():
    """A frame larger than accumulate_frames*signal_length (a legal
    multi-rate super-frame) must correlate ALL its windows — no silent
    sample drop (round-2 review finding)."""
    import jax.numpy as jnp

    from clenabled_tpu.blocks import XCorrelate

    sl = 256
    blk = XCorrelate(2, signal_length=sl, max_search_index=16,
                     accumulate_frames=2)
    rng = np.random.default_rng(4)
    n = 4 * sl   # twice the quantum
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    y = np.roll(x, 5)
    state = blk.init_state()
    state, _, msg = blk.apply(state, [jnp.asarray(x), jnp.asarray(y)])
    lags = np.asarray(msg["corr"]["corrective_lags"])
    assert lags.shape[0] == 4          # every window, not just the first 2
    assert int(state) == 4             # counter tracks the true stream
    np.testing.assert_array_equal(lags[:, 0], [-5, -5, -5, -5])
