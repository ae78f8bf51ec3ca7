"""Shared timing/platform helpers for the benchmark CLIs.

The reference times N=200 iterations with std::chrono around each work()
call (lib/test_clenabled.cc:151-200) and lets --cpu/--gpu pick the OpenCL
device; here --cpu forces the JAX CPU backend (the hardware-free path) and
the default is whatever accelerator the session has.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def select_platform(args) -> None:
    """Apply --cpu/--tpu before any computation happens."""
    if getattr(args, "cpu", False):
        jax.config.update("jax_platforms", "cpu")


def platform_banner() -> str:
    d = jax.devices()[0]
    return f"{d.platform}:{getattr(d, 'device_kind', '?')} x{len(jax.devices())}"


def time_fn(fn, *args, iterations: int = 200, warmup: int = 3):
    """Average seconds per call (post-compile), jax-async aware."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iterations):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / iterations


def time_stateful(fn, state, *args, iterations: int = 200, warmup: int = 3):
    """Like time_fn for (state, x) -> (state, y) streaming kernels."""
    for _ in range(warmup):
        state, out = fn(state, *args)
    jax.block_until_ready((state, out))
    start = time.perf_counter()
    for _ in range(iterations):
        state, out = fn(state, *args)
    jax.block_until_ready((state, out))
    return (time.perf_counter() - start) / iterations


def rand_complex(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )


def rand_float(n, seed=0):
    return np.random.default_rng(seed).standard_normal(n).astype(np.float32)


def report(name: str, block_size: int, secs: float, extra: str = "") -> None:
    sps = block_size / secs
    print(f"{name:<28s} {sps/1e6:>12.3f} Msps   ({secs*1e6:8.1f} us/call"
          f"{', ' + extra if extra else ''})")
