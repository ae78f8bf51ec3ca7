"""Device & mesh core.

Replaces the reference's per-block OpenCL device selection
(lib/GRCLBase.cpp:115-196 — platform scan, device-by-type or
platformId:devId pick, capability probes, per-block context/queue) with a
single shared :class:`DeviceContext` holding one `jax.sharding.Mesh`.

The reference scales by pinning different *blocks* to different devices
(README.md:110).  Here scale comes from sharding the *data* (time-blocks,
channels, stations) across the mesh — see `clenabled_tpu.sharding` — so there
is exactly one context shared by the whole flowgraph.
"""

from __future__ import annotations

import dataclasses
import threading
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass
class DeviceContext:
    """Process-wide device/mesh context.

    Attributes:
      mesh: the device mesh all sharded flowgraphs run over.  Defaults to a
        1-D mesh over every local device with axis name ``"shard"``.
      platform: jax platform string ("tpu", "cpu", ...).
    """

    mesh: Mesh
    platform: str

    @property
    def num_devices(self) -> int:
        return int(np.prod(list(self.mesh.shape.values()))) if self.mesh.shape else 1

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return (
            f"DeviceContext(platform={self.platform!r}, "
            f"mesh={dict(self.mesh.shape)!r})"
        )


_lock = threading.Lock()
_context: Optional[DeviceContext] = None


def _default_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), axis_names=("shard",))


def get_context() -> DeviceContext:
    """Return (lazily creating) the shared device context."""
    global _context
    with _lock:
        if _context is None:
            mesh = _default_mesh()
            _context = DeviceContext(mesh=mesh, platform=jax.devices()[0].platform)
        return _context


def set_default_mesh(mesh: Mesh) -> DeviceContext:
    """Install a mesh as the shared context (e.g. a 2-D (host, chip) mesh)."""
    global _context
    with _lock:
        _context = DeviceContext(
            mesh=mesh, platform=list(mesh.devices.flat)[0].platform
        )
        return _context


def supports_complex() -> bool:
    """Capability probe — the analogue of GRCLBase's fp64/FMA probes
    (lib/GRCLBase.cpp:300-342) deciding kernel codegen.  The 'axon' PJRT
    backend (tunneled TPU) has no complex64 support at all — and a single
    complex op poisons the whole client session — so anything running there
    must use the planar (re, im) float32 path (dsp.planar)."""
    return not is_axon()


def is_axon() -> bool:
    """True when running through the experimental axon TPU tunnel (its
    devices report platform 'tpu', so detect via the registered backend)."""
    try:
        import jax._src.xla_bridge as xb
        return "axon" in xb.backends()
    except Exception:  # pragma: no cover - defensive
        return False


def is_tpu_backend() -> bool:
    """True when the default JAX backend executes on a TPU — native
    ``tpu`` or the tunneled ``axon`` PJRT backend.  This is the gate for
    routing to Mosaic/Pallas TPU kernels: a GPU (or any other non-CPU,
    non-TPU) backend must NOT take those paths, since the kernels only
    lower through Mosaic (ADVICE r4: the old ``!= "cpu"`` gates would
    have sent GPU backends into un-lowerable pallas_calls)."""
    return jax.default_backend() in ("tpu", "axon")


def device_info() -> list[dict]:
    """Per-device capability summary — the role of `clview`
    (lib/clview.cc:43-246: platform/device ids, clock, compute units,
    workgroup limits, fp64/FMA/SVM).  TPU equivalents: platform, chip kind,
    process index, local ordinal, memory stats and core count where exposed.
    """
    out = []
    for d in jax.devices():
        info = {
            "id": d.id,
            "platform": d.platform,
            "device_kind": getattr(d, "device_kind", "unknown"),
            "process_index": d.process_index,
            "coords": getattr(d, "coords", None),
            "core_on_chip": getattr(d, "core_on_chip", None),
        }
        if not is_axon():
            # memory_stats RPCs fail on the axon tunnel, and ANY failed
            # axon call poisons the whole client session (round-3 job 235:
            # clview ran first in a shared session and every later op got
            # UNIMPLEMENTED) — don't even try there
            try:
                stats = d.memory_stats()
                if stats:
                    info["bytes_limit"] = stats.get("bytes_limit")
                    info["bytes_in_use"] = stats.get("bytes_in_use")
            except Exception:
                pass
        out.append(info)
    return out
