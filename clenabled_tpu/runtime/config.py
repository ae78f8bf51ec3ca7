"""Block-size / alignment policy and debug flags.

The reference sizes device buffers per GR call and grows them on demand
(lib/clMathOp_impl.cc:371-373) and rounds work sizes to the kernel's preferred
workgroup multiple (lib/clMathOp_impl.cc:90-97).  Under XLA every distinct
shape is a distinct compiled program, so the policy here is the opposite:
*fix* the frame size per flowgraph (pad/bucket host input up to it) so the
whole chain compiles exactly once.
"""

from __future__ import annotations

import os

# VPU lanes are 128 wide; float32 native tile is (8, 128).  Frames that are
# multiples of 1024 keep every elementwise kernel and FFT layout aligned.
ALIGN = 1024

# Default samples per scheduler step.  8192 matches the reference's default
# correlator analysis window (grc/clenabled_clXCorrelate.block.yml) and is a
# good TPU frame: big enough to amortize dispatch, small enough for VMEM.
DEFAULT_FRAME_SIZE = 8192

DEBUG = bool(int(os.environ.get("CLENABLED_TPU_DEBUG", "0")))


def round_up(n: int, multiple: int = ALIGN) -> int:
    """Round ``n`` up to a multiple (the shape-bucketing policy)."""
    return -(-n // multiple) * multiple


def validate_frame_size(n: int) -> int:
    if n <= 0:
        raise ValueError(f"frame size must be positive, got {n}")
    return n
