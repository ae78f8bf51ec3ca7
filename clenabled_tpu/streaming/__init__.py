"""Streaming block & flowgraph runtime.

The reference relies on GNU Radio's scheduler and block contracts
(set_history, set_output_multiple, sync_decimator, forecast, PMT message
ports).  XLA is functional, so those contracts become explicit here:

- a :class:`Block` is a pure ``apply(state, inputs) -> (state, outputs,
  messages)`` with declared arity, rate change and frame quantum;
- a :class:`Flowgraph` wires blocks into a DAG and compiles the WHOLE chain
  into one jitted step over fixed-size frames (one XLA program per
  flowgraph — no per-block dispatch, no host round-trips between blocks);
- the :class:`Runner` owns the carried state pytree, feeds host samples in,
  and dispatches PDU-style messages to host callbacks (the role of the
  reference's "corr"/"xcorr"/"sync" message ports).
"""

from clenabled_tpu.streaming.block import Block, FunctionBlock  # noqa: F401
from clenabled_tpu.streaming.graph import Flowgraph, Runner  # noqa: F401
from clenabled_tpu.streaming.sync import (  # noqa: F401
    StreamSynchronizer, SynchronizedIngest, SyncPlan, TaggedFrame)
