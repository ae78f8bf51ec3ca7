"""Shared handling of the reference's legacy OpenCL device-selection kwargs."""

from __future__ import annotations

# Device-selector constants, parity with include/clenabled/GRCLBase.h:64-70.
OCLTYPE_GPU = 1
OCLTYPE_ACCELERATOR = 2
OCLTYPE_CPU = 3
OCLTYPE_ANY = 4
OCLDEVICESELECTOR_FIRST = 1
OCLDEVICESELECTOR_SPECIFIC = 2

_LEGACY_KWARGS = (
    "openCLPlatformType",
    "openclPlatform",
    "devSelector",
    "platformId",
    "devId",
    "setDebug",
    "nthreads",
    "idataType",
    "iDataSize",
)


def strip_legacy_kwargs(kwargs: dict) -> dict:
    """Accept-and-ignore the reference's per-block device tuple; raise on
    anything else unexpected."""
    for k in _LEGACY_KWARGS:
        kwargs.pop(k, None)
    if kwargs:
        raise TypeError(f"unexpected keyword arguments: {sorted(kwargs)}")
    return kwargs
