"""Station-sharded X-Engine: all_to_all from station-sharding to
channel-sharding, then local per-channel Gram matmuls.

Capture is naturally station-sharded (each chip ingests its antennas'
streams — the analogue of the reference's per-antenna input ports,
lib/clXEngine_impl.cc:88-90), but the cross-multiply needs ALL stations per
channel.  One ``all_to_all`` over the mesh axis re-shards [T, S/D, F, P] →
[T, S, F/D, P]; each chip then owns the complete correlation output for its
channel slice — no further communication, and the integration state stays
channel-sharded on-device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from clenabled_tpu.dsp import xengine as dsp_xengine


def sharded_xengine(z, mesh: Mesh, axis: str = "shard", npol: int = 2,
                    output_format: int = dsp_xengine.CLXCORR_TRIANGULAR_ORDER):
    """One-shot correlate: z [T, S, F, P] station-sharded on dim 1 →
    output channel-sharded on dim 0 ([F, nb, npol²] or [F, SP, SP])."""
    d = mesh.shape[axis]
    z = jnp.asarray(z, jnp.complex64)
    t, s, f, p = z.shape
    if s % d or f % d:
        raise ValueError(f"stations ({s}) and channels ({f}) must divide mesh size {d}")

    @partial(jax.shard_map, mesh=mesh,
             in_specs=P(None, axis, None, None),
             out_specs=P(axis))
    def run(z_local):  # [T, S/D, F, P]
        # station-shard -> channel-shard: split channel dim, concat stations
        z_all = jax.lax.all_to_all(z_local, axis, split_axis=2, concat_axis=1,
                                   tiled=True)  # [T, S, F/D, P]
        return dsp_xengine.xengine_correlate(z_all, npol=npol,
                                             output_format=output_format)

    return run(z)


def make_sharded_xengine(num_inputs: int, num_channels: int, npol: int,
                         integration_time: int, mesh: Mesh,
                         axis: str = "shard",
                         output_format: int = dsp_xengine.CLXCORR_TRIANGULAR_ORDER,
                         pipeline_integration: int = 0):
    """Streaming form with channel-sharded accumulation state.

    apply(state, frames [T, S, F, P] station-sharded) →
    (state, (matrix channel-sharded, ready)).
    """
    d = mesh.shape[axis]
    if num_inputs % d or num_channels % d:
        raise ValueError("stations and channels must divide mesh size")
    nb = dsp_xengine.num_baselines(num_inputs)
    if output_format == dsp_xengine.CLXCORR_TRIANGULAR_ORDER:
        out_shape = (num_channels, nb, npol * npol)
    else:
        out_shape = (num_channels, num_inputs * npol, num_inputs * npol)
    pipe = max(1, pipeline_integration)

    def init_state():
        return (jnp.zeros(out_shape, jnp.complex64), jnp.zeros((), jnp.int32))

    @jax.jit
    @partial(jax.shard_map, mesh=mesh,
             in_specs=((P(axis), P()), P(None, axis, None, None)),
             out_specs=((P(axis), P()), (P(axis), P())))
    def step(state, z_local):
        accum, count = state
        z_all = jax.lax.all_to_all(z_local, axis, split_axis=2, concat_axis=1,
                                   tiled=True)
        corr = dsp_xengine.xengine_correlate(z_all, npol=npol,
                                             output_format=output_format)
        accum = accum + corr
        count = count + 1
        ready = count >= pipe
        out = jnp.where(ready, accum, jnp.zeros_like(accum))
        new_accum = jnp.where(ready, jnp.zeros_like(accum), accum)
        new_count = jnp.where(ready, jnp.int32(0), count)
        return (new_accum, new_count), (out, ready)

    def apply(state, frames):
        frames = jnp.asarray(frames, jnp.complex64)
        if frames.shape != (integration_time, num_inputs, num_channels, npol):
            raise ValueError(
                f"frames shape {frames.shape} != "
                f"{(integration_time, num_inputs, num_channels, npol)}"
            )
        return step(state, frames)

    return init_state, apply
