"""Prefill latency sweep (reference: benchmark/compare_prefill.py).

Sweeps seqlen at the reference's README config (batch 48, 24 heads, d=128,
causal off by default there; we report both) and prints a table of latency
plus achieved TFLOP/s. Timing uses the scan-loop methodology from bench.py
(robust to the tunnel RTT of this environment).

Usage: python benchmark/compare_prefill.py [--batch 48] [--heads 24]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import _chain, measure_rtt, scan_timeit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--heads", type=int, default=24)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--seqlens", type=int, nargs="+",
                    default=[256, 512, 1024, 2048, 4096])
    ap.add_argument("--causal", action="store_true")
    args = ap.parse_args()

    from mfa_tpu.kernels.prefill import prefill_attention

    rtt = measure_rtt()
    print(f"# prefill sweep b={args.batch} h={args.heads} d={args.head_dim} "
          f"causal={args.causal} (rtt {rtt*1e3:.1f} ms)")
    print(f"{'seqlen':>8} {'ms':>10} {'TFLOP/s':>10}")
    for s in args.seqlens:
        q0 = jax.random.normal(jax.random.key(0),
                               (args.batch, args.heads, s, args.head_dim),
                               jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), q0.shape, jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), q0.shape, jnp.bfloat16)

        def step(q, k, v):
            return _chain(q, prefill_attention(q, k, v, causal=args.causal))

        iters = max(4, min(16, (2048 // s) * 4))
        dt = scan_timeit(step, q0, args=(k, v), iters=iters, rtt=rtt)
        frac = 0.5 if args.causal else 1.0
        flops = 4 * args.batch * args.heads * s * s * args.head_dim * frac
        print(f"{s:>8} {dt*1e3:>10.3f} {flops/dt/1e12:>10.1f}")


if __name__ == "__main__":
    main()
