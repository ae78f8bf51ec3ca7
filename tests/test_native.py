"""Native C++ runtime components: build, ring buffer, unpack parity,
rolling file writer."""

import json
import os
import time

import numpy as np
import pytest

from clenabled_tpu import native


def test_native_builds():
    assert native.get_lib() is not None, native.build_error()


def test_ringbuffer_roundtrip():
    rb = native.RingBuffer(1 << 16)
    assert rb.capacity == 1 << 16
    data = np.arange(1000, dtype=np.float32)
    assert rb.write(data) == data.nbytes
    assert rb.available() == data.nbytes
    out = rb.read(data.nbytes, dtype=np.float32)
    np.testing.assert_array_equal(out, data)
    assert rb.available() == 0
    rb.close()


def test_ringbuffer_wraparound_and_backpressure():
    rb = native.RingBuffer(1024)  # rounds to pow2
    chunk = np.arange(100, dtype=np.uint8)
    total_written = 0
    for _ in range(8):
        total_written += rb.write(chunk)
    # drain half, write more (wrap), verify FIFO order preserved
    first = rb.read(300)
    np.testing.assert_array_equal(first, np.tile(chunk, 8)[:300])
    rb.write(chunk)
    rest = rb.read(10 ** 6)
    expected = np.concatenate([np.tile(chunk, 8)[300:total_written], chunk])
    np.testing.assert_array_equal(rest, expected)
    # full buffer refuses extra bytes instead of overwriting
    big = np.zeros(5000, np.uint8)
    wrote = rb.write(big)
    assert wrote <= rb.capacity
    rb.close()


def test_unpack_4bit_matches_jax_lut():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, 4096, dtype=np.uint8)
    re, im = native.unpack_4bit_planar(raw)
    from clenabled_tpu.dsp import xengine
    want = np.asarray(xengine.unpack_packed_4bit(raw))
    np.testing.assert_allclose(re + 1j * im, want, rtol=1e-6)


def test_unpack_i8_matches():
    rng = np.random.default_rng(1)
    raw = rng.integers(-127, 128, 8192, dtype=np.int8)
    re, im = native.unpack_i8_planar(raw)
    from clenabled_tpu.dsp import xengine
    want = np.asarray(xengine.unpack_char(raw))
    np.testing.assert_allclose(re + 1j * im, want, rtol=1e-6)


def test_marshal_xengine():
    t, s, cp = 8, 4, 6
    blocks = [np.arange(t * cp, dtype=np.float32) + 100 * i for i in range(s)]
    out = native.marshal_xengine_planar(blocks, t, cp)
    assert out.shape == (t, s, cp)
    for si in range(s):
        np.testing.assert_array_equal(out[:, si, :],
                                      blocks[si].reshape(t, cp))


def test_rolling_file_writer(tmp_path):
    base = str(tmp_path / "xout")
    sidecar = json.dumps({"channels": 256, "format": "triangular order"})
    w = native.RollingFileWriter(base, rollover_bytes=1000,
                                 sidecar_json=sidecar)
    chunk = np.arange(100, dtype=np.float32)  # 400 bytes
    for _ in range(6):  # 2400 bytes -> 3 files of <=1000
        w.write(chunk)
    deadline = time.time() + 5
    while w.queue_depth() > 0 and time.time() < deadline:
        time.sleep(0.01)
    w.close()
    bins = sorted(p for p in os.listdir(tmp_path) if p.endswith(".bin"))
    metas = sorted(p for p in os.listdir(tmp_path) if p.endswith(".json"))
    assert len(bins) == 3 and len(metas) == 3
    total = sum(os.path.getsize(tmp_path / p) for p in bins)
    assert total == 2400
    meta = json.load(open(tmp_path / metas[0]))
    assert meta["channels"] == 256
    # data integrity across rollover
    data = np.concatenate([
        np.fromfile(tmp_path / p, dtype=np.float32) for p in bins])
    np.testing.assert_array_equal(data, np.tile(chunk, 6))
