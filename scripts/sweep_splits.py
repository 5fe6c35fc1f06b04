"""On-chip split-count sweep: validate num_splits_heuristic / TPU_PARALLEL_UNITS.

The reference picks decode splits from SM wave occupancy
(/root/reference/csrc/mfa/api.cpp:269-302); our TPU analog targets
TPU_PARALLEL_UNITS grid cells (dispatch/config.py:num_splits_heuristic).
VERDICT r1 flagged that constant as unmeasured ("2 is a safe target" for a
1-TensorCore v5e). This sweep measures decode latency for forced
num_splits in {1,2,4,8,16} at LOW-occupancy shapes (batch*kv_heads < units
is the only regime the heuristic can trigger splits in) and prints which
split count actually wins per shape, plus what the heuristic picks.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/sweep_splits.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import _chain, measure_rtt, scan_timeit  # noqa: E402
from mfa_tpu.dispatch.config import num_splits_heuristic  # noqa: E402
from mfa_tpu.kernels.decode import decode_attention  # noqa: E402


def bench(rtt, batch, heads, kv_heads, d, kv_len, num_splits):
    q0 = jax.random.normal(jax.random.key(0), (batch, heads, d),
                           jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (batch, kv_heads, kv_len, d),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), k.shape, jnp.bfloat16)
    lens = jnp.full((batch,), kv_len, jnp.int32)

    def step(q, k, v, lens):
        return _chain(q, decode_attention(q, k, v, lens,
                                          num_splits=num_splits))

    return scan_timeit(step, q0, args=(k, v, lens), rtt=rtt)


def main():
    rtt = measure_rtt()
    print(f"# split sweep (rtt {rtt*1e3:.1f} ms)")
    print(f"{'shape':>24} {'heuristic':>9} | " + " ".join(
        f"s={s:>2}" for s in (1, 2, 4, 8, 16)))
    # low-occupancy shapes: single request / few kv heads, long KV
    for batch, heads, kv_heads, kv_len in [
        (1, 32, 1, 8192), (1, 32, 1, 32768),
        (1, 32, 8, 8192), (1, 32, 8, 32768),
        (2, 32, 8, 16384), (4, 32, 8, 8192),
    ]:
        h = num_splits_heuristic(batch, kv_heads, kv_len, 512)
        times = []
        for s in (1, 2, 4, 8, 16):
            dt = bench(rtt, batch, heads, kv_heads, 128, kv_len, s)
            times.append(dt * 1e3)
        best = min(range(5), key=lambda i: times[i])
        row = " ".join(f"{t:5.2f}" for t in times)
        print(f"b{batch} h{heads}/{kv_heads} kv{kv_len:>6}".rjust(24)
              + f" {h:>9} | {row}   best=s{(1, 2, 4, 8, 16)[best]}")


if __name__ == "__main__":
    main()
