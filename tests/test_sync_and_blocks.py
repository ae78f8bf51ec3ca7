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
