"""Production-style streaming ingest — native ring buffer + flowgraph.

A capture thread produces packed 4-bit I/Q bytes into the lock-free native
ring (the role of the reference's pinned double buffers + worker thread,
lib/clXEngine_impl.cc:304-382); the main loop pops fixed frames, unpacks to
planar float pairs in C++ (native.unpack_4bit_planar), and drives a
LowPass → QuadratureDemod flowgraph, reporting sustained throughput from
the Runner's built-in counters.

Run: python examples/streaming_ingest.py [--seconds 3]
"""

import argparse
import threading
import time

import numpy as np

from clenabled_tpu import blocks, native
from clenabled_tpu.dsp import planar
from clenabled_tpu.streaming import Flowgraph


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--frame", type=int, default=1 << 16)
    args = ap.parse_args()

    frame = args.frame
    rb = native.RingBuffer(1 << 24)
    stop = threading.Event()

    def capture():
        """Simulated SDR front-end: packed 4-bit bytes at max rate."""
        rng = np.random.default_rng(0)
        chunk = rng.integers(0, 256, 1 << 18, dtype=np.uint8)
        while not stop.is_set():
            if rb.space() >= chunk.nbytes:
                rb.write(chunk)
            else:
                time.sleep(0.0005)

    producer = threading.Thread(target=capture, daemon=True)
    producer.start()

    lpf = blocks.LowPassFilter(1, 1.0, 10e6, 1.5e6, 500e3, use_time=True,
                               planar=True)
    qd = blocks.QuadratureDemod(1.0, planar=True)
    g = Flowgraph()
    g.external_input(lpf)
    g.connect(lpf, qd)
    tap = g.tap(qd, name="audio")
    r = g.compile(frame_size=frame)

    deadline = time.time() + args.seconds
    frames = 0
    out = None
    while time.time() < deadline:
        raw = rb.read(frame)  # 1 byte = 1 packed complex sample
        if len(raw) < frame:
            time.sleep(0.0005)
            continue
        re, im = native.unpack_4bit_planar(raw)
        out = r.step(planar.PC(re, im))[tap]
        frames += 1
    if out is not None:
        np.asarray(out)  # block on the last frame
    stop.set()
    msps = frames * frame / max(r.stats["wall_s"], 1e-9) / 1e6
    print(f"ingest chain sustained {msps:.1f} MSPS over {frames} frames "
          f"(ring → C++ unpack → LPF → demod)")


if __name__ == "__main__":
    main()
