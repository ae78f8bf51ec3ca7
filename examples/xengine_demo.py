"""X-Engine interferometry demo — the reference's examples/xcorr_clxengine.grc:
4 antennas with a correlated source between two of them, integrated by the
FX correlator; the triangular correlation matrix leaves via the "xcorr"
message port and is written to rolling files with a JSON sidecar (the
clXEngine direct-to-disk path, via the native writer).

Run: python examples/xengine_demo.py
"""

import json
import os
import tempfile
import time

import numpy as np

from clenabled_tpu import blocks, native
from clenabled_tpu.dsp import xengine as dsp_xengine
from clenabled_tpu.streaming import Flowgraph


def main():
    stations, channels, integration, npol = 4, 64, 128, 1
    rng = np.random.default_rng(2)

    xe = blocks.XEngine(
        data_type=1, polarization=npol, num_inputs=stations,
        num_channels=channels, integration=integration,
        antenna_list=[f"ant{i}" for i in range(stations)],
    )
    g = Flowgraph()
    for s in range(stations):
        g.external_input(xe, s)
    frame = integration * channels * npol
    r = g.compile(frame_size=frame)

    outdir = tempfile.mkdtemp(prefix="xengine_")
    sidecar = json.dumps({
        "antennas": xe.antenna_list, "channels": channels,
        "polarizations": npol, "baselines": dsp_xengine.num_baselines(stations),
        "data_format": "triangular order",
    })
    writer = native.RollingFileWriter(os.path.join(outdir, "xcorr"),
                                      rollover_bytes=1 << 20,
                                      sidecar_json=sidecar)

    def on_xcorr(m):
        mat = np.asarray(m["matrix"])
        writer.write(mat.astype(np.complex64).view(np.float32))
        st = dsp_xengine.baseline_stations(stations)
        cross = np.abs(mat).mean(axis=(0, 2))
        best = max((k for k in range(len(st)) if st[k][0] != st[k][1]),
                   key=lambda k: cross[k])
        print(f"  strongest cross baseline: ant{st[best][0]}–ant{st[best][1]}")

    r.on_message("xengine.xcorr", on_xcorr)

    for it in range(3):
        # common source between antennas 0 and 2
        common = (rng.standard_normal((integration, channels))
                  + 1j * rng.standard_normal((integration, channels))
                  ).astype(np.complex64)
        feeds = []
        for s in range(stations):
            z = 0.2 * (rng.standard_normal((integration, channels))
                       + 1j * rng.standard_normal((integration, channels))
                       ).astype(np.complex64)
            if s in (0, 2):
                z += common
            feeds.append(z.reshape(-1))
        print(f"integration {it}:")
        r.step(*feeds)

    time.sleep(0.2)
    writer.close()
    print("output files:", sorted(os.listdir(outdir)))


if __name__ == "__main__":
    main()
