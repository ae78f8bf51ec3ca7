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


def _full_sum(out):
    """Reduction folding every output leaf into a scalar so no step of a
    scanned measurement is dead code (a DCE'd step loses its DMAs too —
    BENCH_TPU.md round-2 caution).  Sum of SQUARES, not a plain sum: XLA
    reassociates a linear reduce THROUGH a matmul (sum(x@F) becomes
    x@sum(F), eliminating the op being measured — caught live: an FFT
    row printed an impossible 71 GSPS); a quadratic cannot be folded.
    One extra read pass; used only when the stacked-ys form would not
    fit memory."""
    import jax
    import jax.numpy as jnp

    acc = jnp.float32(0)
    for leaf in jax.tree_util.tree_leaves(out):
        if not hasattr(leaf, "ravel"):
            continue
        f = leaf.astype(jnp.float32)
        acc = acc + jnp.sum(f * f)
    return acc


def _out_bytes(out):
    import jax

    return sum(getattr(x, "size", 0) * getattr(x, "dtype", np.float32).itemsize
               for x in jax.tree_util.tree_leaves(out)
               if hasattr(x, "size"))


_YS_BYTES_CAP = 1 << 30   # stack per-step outputs up to this much (HBM 16G)


def _scan_slope(run1, run2, k1, k2, rounds: int = 5):
    """Per-step seconds from two scan lengths.  NO per-call avg fallback
    (slope_per_call's rescue is for per-dispatch timing; in scanned mode
    the dispatch constant can be 30x the step and falling back to t2/k2
    would print the constant).  The shared machine's stall phases can
    flip mid-round and produce NEGATIVE slopes — take the MEDIAN of the
    positive rounds (min-of-rounds picks exactly the corrupted one)."""
    import statistics

    slopes = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        _fence(run1())
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _fence(run2())
        t2 = time.perf_counter() - t0
        s = (t2 - t1) / (k2 - k1)
        if s > 0:
            slopes.append(s)
    if not slopes:               # every round corrupted: report the avg
        return max(t2 / k2, 1e-9)
    return statistics.median(slopes)


def time_stateful_scan(fn, state, *args, reps=64):
    """Seconds per step with DEVICE-SIDE chained reps: one dispatch runs
    ``reps`` steps via lax.scan (the carried state serializes them), so
    the printed number excludes BOTH the sync RTT and the ~1 ms/call
    tunnel dispatch cost — it is what a Runner at the compile() default
    (steps_per_dispatch="auto") actually sustains.  A two-point slope
    over scan lengths reps//4 and reps cancels the residual per-dispatch
    constant."""
    import jax
    import jax.numpy as jnp

    # decide the anti-DCE form from one probe call: stack per-step
    # outputs as scan ys when they fit (each step writes its own slot —
    # exactly a real streaming run, no extra passes), else fold a FULL
    # sum into the carry
    probe_out = fn(state, *args)[1]
    use_ys = _out_bytes(probe_out) * reps <= _YS_BYTES_CAP

    # args ride as jit PARAMETERS, not closure constants — closed-over
    # device arrays inflate the remote-compile payload past the tunnel's
    # size limit (HTTP 413, round-3 hazard)
    def make(k):
        def body(carry, _, a=()):
            st, acc = carry
            st2, out = fn(st, *a)
            if use_ys:
                return (st2, acc), out
            return (st2, acc + _full_sum(out)), None

        return jax.jit(lambda st, *a: jax.lax.scan(
            lambda c, x: body(c, x, a), (st, jnp.float32(0)),
            None, length=k))

    k1 = max(1, reps // 4)
    k2 = reps
    f1, f2 = make(k1), make(k2)
    _fence(f1(state, *args))
    _fence(f2(state, *args))
    return _scan_slope(lambda: f1(state, *args), lambda: f2(state, *args),
                       k1, k2)


def time_fn_scan(fn, *args, reps=64):
    """time_stateful_scan for stateless kernels.  Each step consumes a
    DISTINCT rolled copy of the inputs as scan xs: with a constant input
    XLA unrolls the scan and fuses consecutive fusible (elementwise)
    steps into one read→registers→write pass, eliding 1−1/k of the HBM
    traffic — measured 4× OVER the HBM roof before this fix (probe 343,
    CLAUDE.md round-4 findings).  Streaming distinct slices per step
    forces real reads; per-step outputs stack as ys (real writes).
    reps shrink to keep the stacked inputs+outputs within the memory
    cap."""
    import jax
    import jax.numpy as jnp

    probe_out = fn(*args)
    in_bytes = _out_bytes(args)
    per_step = in_bytes + _out_bytes(probe_out)
    if per_step:
        reps = max(4, min(reps, int(_YS_BYTES_CAP // per_step)))

    def stack_rolled(a, k):
        return jax.tree.map(
            lambda x: jnp.stack([jnp.roll(x, 8 * j, axis=-1)
                                 for j in range(k)]), a)

    def make(k):
        def body(acc, xs_step):
            out = fn(*xs_step)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return acc + leaf.astype(jnp.float32).ravel()[0], out

        return jax.jit(lambda xs: jax.lax.scan(
            body, jnp.float32(0), xs, length=k))

    k1 = max(1, reps // 4)
    k2 = reps
    f1, f2 = make(k1), make(k2)
    xs1 = tuple(stack_rolled(a, k1) for a in args)
    xs2 = tuple(stack_rolled(a, k2) for a in args)
    _fence(f1(xs1))
    _fence(f2(xs2))
    return _scan_slope(lambda: f1(xs1), lambda: f2(xs2), k1, k2)
