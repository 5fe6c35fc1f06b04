"""Device timing + roofline harness.

The reference's performance tooling is torch.profiler tables and CUDA-event
timing (benchmark/compare_prefill.py:13-28); the TPU equivalents live here.
The central subtlety of this environment: the TPU is reached via a tunnel
where `block_until_ready` does not truly block and a host<->device sync
costs ~25-40ms. `scan_timeit` therefore runs N chained iterations inside
ONE jitted `lax.scan` and differences the N vs 2N wall-clock times, which
cancels the sync cost exactly and leaves per-iteration device time.
"""

from __future__ import annotations

import time

import jax
import jax.lax as lax
import jax.numpy as jnp

# Public HBM bandwidth per chip, bytes/s.
HBM_BW = {
    "TPU v6 lite": 1640e9,  # Trillium
    "TPU v5 lite": 819e9,  # v5e
    "TPU v5p": 2765e9,
    "TPU v5": 819e9,
    "TPU v4": 1228e9,
}

# Peak dense bf16 matmul throughput per chip, FLOP/s.
PEAK_BF16 = {
    "TPU v6 lite": 918e12,
    "TPU v5 lite": 197e12,
    "TPU v5p": 459e12,
    "TPU v5": 197e12,
    "TPU v4": 275e12,
}


def device_bw() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in HBM_BW.items():
        if kind.startswith(k):
            return v
    return 819e9


def device_peak_flops() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in PEAK_BF16.items():
        if kind.startswith(k):
            return v
    return 197e12


def _readback(x) -> float:
    return float(jax.tree.leaves(x)[0].reshape(-1)[0])


def measure_rtt() -> float:
    """Median host<->device sync round-trip of a trivial jitted op."""
    triv = jax.jit(lambda c: c + 1.0)
    _ = _readback(triv(jnp.float32(0)))
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        _ = _readback(triv(jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def scan_timeit(step_fn, carry0, args=(), iters: int = 0,
                rtt: float = 0.0, target_s: float = 0.75) -> float:
    """Per-iteration seconds of step_fn(carry, *args), measured inside one
    device program. Large arrays MUST be passed via `args`, not closed over
    — jit-embedded constants are re-shipped through the tunnel at compile.

    Runs the loop at N and 2N iterations and differences the wall times,
    cancelling the (large, jittery) sync RTT; N is auto-sized from a pilot
    run so device time dominates the residual jitter. The trip count is a
    *runtime* argument (lax.fori_loop), so every N reuses one executable —
    compiles are ~60s each through this environment's remote helper.
    """

    @jax.jit
    def run(c, n, *a):
        return lax.fori_loop(0, n, lambda _, c: step_fn(c, *a), c)

    def measure(n):
        n = jnp.int32(n)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _ = _readback(run(carry0, n, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    _ = _readback(run(carry0, jnp.int32(2), *args))  # compile + warm
    if iters <= 0:
        pilot = measure(8)
        est = max((pilot - rtt) / 8, 1e-6)
        iters = int(min(512, max(8, target_s / est)))
    t_n = measure(iters)
    t_2n = measure(2 * iters)
    return max(t_2n - t_n, 1e-9) / iters


def chain(q, out):
    """Data-depend q on out without changing its value in bf16/f32 ulps
    enough to matter, and without letting XLA fold the dependency away."""
    return q + (out.astype(jnp.float32) * 1e-7).astype(q.dtype)


def roofline_pct(bytes_moved: int, seconds: float) -> float:
    return 100.0 * bytes_moved / seconds / device_bw()
