"""Shared timing/platform helpers for the benchmark CLIs.

The reference times N=200 iterations with std::chrono around each work()
call (lib/test_clenabled.cc:151-200) and lets --cpu/--gpu pick the OpenCL
device; here --cpu forces the JAX CPU backend (the hardware-free path) and
the default is whatever accelerator the session has.

Remote-runtime discipline (BENCH_TPU.md "recalibration"): one sync costs
25-40 ms RTT and `jax.block_until_ready` can silently no-op on long-lived
sessions, so per-call time is measured as a TWO-POINT SLOPE — time K1 and
K2 reps and take (t2−t1)/(K2−K1) — with a tiny scalar readback as the
fence (device execution is in-order).
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


def _fence(out) -> None:
    """Force completion of everything queued before ``out``: a scalar
    readback of the first array leaf (in-order execution makes this a full
    fence; block_until_ready is NOT trusted — see module docstring)."""
    import jax.numpy as jnp

    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "astype")]
    if leaves:
        float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:8]))


def slope_per_call(t1, k1, t2, k2):
    """Per-call seconds from a two-point measurement.  Falls back to the
    naive average t2/k2 when the slope collapses >10× below it (tiny/fast
    runs where timer noise swamps the difference)."""
    s = (t2 - t1) / (k2 - k1)
    avg = t2 / k2
    if s <= avg / 10:
        s = avg
    return max(s, 1e-9)


def time_fn(fn, *args, iterations: int = 200, warmup: int = 3):
    """Seconds per call (post-compile) via the two-point slope."""
    del warmup
    out = fn(*args)
    _fence(out)
    k1 = max(1, iterations // 8)
    k2 = iterations
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(k1):
            out = fn(*args)
        _fence(out)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(k2):
            out = fn(*args)
        _fence(out)
        t2 = time.perf_counter() - t0
        s = slope_per_call(t1, k1, t2, k2)
        best = s if best is None else min(best, s)
    return best


def time_stateful(fn, state, *args, iterations: int = 200, warmup: int = 3):
    """Like time_fn for (state, x) -> (state, y) streaming kernels (the
    carried state chains the reps — true steady-state)."""
    del warmup
    state0 = state
    state, out = fn(state0, *args)
    _fence((state, out))

    def run(k):
        s = state0
        for _ in range(k):
            s, out = fn(s, *args)
        _fence((s, out))

    k1 = max(1, iterations // 8)
    k2 = iterations
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        run(k1)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(k2)
        t2 = time.perf_counter() - t0
        s_ = slope_per_call(t1, k1, t2, k2)
        best = s_ if best is None else min(best, s_)
    return best


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
