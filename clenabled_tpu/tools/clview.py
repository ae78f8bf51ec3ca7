"""clview equivalent: list devices/mesh with capabilities
(lib/clview.cc:43-246 prints platform ids, clock, compute units, workgroup
limits, fp64/FMA/SVM — here: platform, chip kind, coords, memory)."""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description="TPU/device info (clview)")
    ap.add_argument("--cpu", action="store_true", help="show CPU backend view")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from clenabled_tpu.runtime.device import (device_info, get_context,
                                              is_axon, supports_complex)

    infos = device_info()
    print(f"Devices: {len(infos)}")
    for i in infos:
        line = (f"  [{i['id']}] {i['platform']}  kind={i['device_kind']}  "
                f"process={i['process_index']}")
        if i.get("coords") is not None:
            line += f"  coords={i['coords']}"
        if i.get("bytes_limit"):
            line += f"  hbm={i['bytes_limit'] / 2**30:.1f}GiB"
        print(line)
    ctx = get_context()
    print(f"Default mesh: {dict(ctx.mesh.shape)} on platform {ctx.platform}")
    # capability report (the fp64/FMA/SVM probe analogue)
    print(f"complex64 supported: {supports_complex()}"
          + ("  (axon tunnel: use planar=True blocks / PC streams)"
             if is_axon() else ""))


if __name__ == "__main__":
    main()
