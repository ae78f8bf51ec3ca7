"""Stream data-type registry.

Mirrors the reference's data-type codes (GRCLBase.h:57-62:
``DTYPE_COMPLEX/FLOAT/INT/SHORT/BYTE/PACKEDXY``) so block constructors accept
the same integer codes, mapped onto JAX dtypes.

- ``DTYPE_COMPLEX``  — complex64 sample stream (gr_complex)
- ``DTYPE_FLOAT``    — float32
- ``DTYPE_INT``      — int32
- ``DTYPE_SHORT``    — int16
- ``DTYPE_BYTE``     — int8 (interleaved I/Q bytes for the X-Engine "IChar"
                       input, lib/clXEngine_impl.cc:843-855)
- ``DTYPE_PACKEDXY`` — packed 4-bit I/Q pairs, two pols per byte-pair
                       (lib/clXEngine_impl.cc:831-858); stored as uint8 here
                       and unpacked on-device (see dsp.xengine.unpack_packed_4bit)
"""

from __future__ import annotations

import jax.numpy as jnp

DTYPE_COMPLEX = 1
DTYPE_FLOAT = 2
DTYPE_INT = 3
DTYPE_SHORT = 4
DTYPE_BYTE = 5
DTYPE_PACKEDXY = 6

_JAX_DTYPES = {
    DTYPE_COMPLEX: jnp.complex64,
    DTYPE_FLOAT: jnp.float32,
    DTYPE_INT: jnp.int32,
    DTYPE_SHORT: jnp.int16,
    DTYPE_BYTE: jnp.int8,
    DTYPE_PACKEDXY: jnp.uint8,
}

_ITEMSIZE = {
    DTYPE_COMPLEX: 8,
    DTYPE_FLOAT: 4,
    DTYPE_INT: 4,
    DTYPE_SHORT: 2,
    DTYPE_BYTE: 1,
    DTYPE_PACKEDXY: 1,
}


def dtype_of(code: int):
    """JAX dtype for a reference data-type code."""
    try:
        return _JAX_DTYPES[code]
    except KeyError:
        raise ValueError(f"unknown dtype code {code!r}") from None


def itemsize_of(code: int) -> int:
    """Bytes per item for a reference data-type code."""
    try:
        return _ITEMSIZE[code]
    except KeyError:
        raise ValueError(f"unknown dtype code {code!r}") from None
