"""Multi-stream synchronizer — the clXEngine internal ATA-SNAP synchronizer
(lib/clXEngine_impl.cc:1158-1226) as a host-side utility.

The reference reads per-stream timestamp tags and, until synchronized,
consumes samples from each stream so all N inputs align on the HIGHEST
starting timestamp, stepping in multiples of 16 frames (:111-116).  Here the
capture layer tracks a starting timestamp per stream (one tick per frame of
``frame_len`` samples); :meth:`plan` returns how many frames each stream
must discard, and the sync timestamp to publish (the "sync" PDU analogue).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class SyncPlan:
    sync_timestamp: int
    discard_frames: list[int]  # per stream

    @property
    def synchronized(self) -> bool:
        return all(d == 0 for d in self.discard_frames)


class StreamSynchronizer:
    """Aligns N streams on their highest starting timestamp."""

    def __init__(self, num_inputs: int, block_multiple: int = 16):
        if num_inputs < 1:
            raise ValueError("need at least one stream")
        # the reference requires integrations in multiples of 16 (:111-116)
        self.num_inputs = num_inputs
        self.block_multiple = block_multiple

    def plan(self, start_timestamps: list[int]) -> SyncPlan:
        """Given each stream's next-frame timestamp, compute per-stream
        frames to discard so all start at the same (highest, rounded up to
        the block multiple) timestamp."""
        if len(start_timestamps) != self.num_inputs:
            raise ValueError(
                f"expected {self.num_inputs} timestamps, got "
                f"{len(start_timestamps)}"
            )
        target = max(start_timestamps)
        bm = self.block_multiple
        if target % bm:
            target += bm - (target % bm)
        return SyncPlan(
            sync_timestamp=target,
            discard_frames=[target - t for t in start_timestamps],
        )
