"""Prefill profile at one config + parity assert (reference: benchmark/prefill.py).

The reference uses torch.profiler to print a kernel-time table for one
prefill config (benchmark/prefill.py:50-66); the TPU analog is a
jax.profiler trace (viewable in TensorBoard / Perfetto) plus the
RTT-cancelling latency measurement. Asserts parity against the pure-jnp
oracle before timing, like the reference's benchmark/decode.py parity
check.

Usage:
  python benchmark/prefill.py [--batch 48] [--seqlen 1024] [--trace DIR]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mfa_tpu.utils.timing import chain, measure_rtt, scan_timeit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--heads", type=int, default=24)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--seqlen", type=int, default=1024)
    ap.add_argument("--causal", action="store_true", default=True)
    ap.add_argument("--no-causal", dest="causal", action="store_false")
    ap.add_argument("--trace", type=str, default=None,
                    help="write a jax.profiler trace to this directory")
    args = ap.parse_args()

    from mfa_tpu.kernels.prefill import prefill_attention
    from mfa_tpu.ref.oracle import attention_ref

    b, h, d, s = args.batch, args.heads, args.head_dim, args.seqlen
    q = jax.random.normal(jax.random.key(0), (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, h, s, d), jnp.bfloat16)

    # parity check on a small slice first (full config would be slow on CPU
    # oracle and is unnecessary for a numerics gate)
    out = prefill_attention(q[:2], k[:2], v[:2], causal=args.causal)
    ref = attention_ref(
        jnp.swapaxes(q[:2], 1, 2), jnp.swapaxes(k[:2], 1, 2),
        jnp.swapaxes(v[:2], 1, 2), causal=args.causal,
    )
    diff = float(jnp.abs(out.astype(jnp.float32)
                         - jnp.swapaxes(ref, 1, 2).astype(jnp.float32)).max())
    assert diff < 2e-2, f"prefill parity failed: max_diff={diff}"
    print(f"parity vs oracle: max_diff={diff:.5f}  OK")

    rtt = measure_rtt()

    def step(qc, k, v):
        return chain(qc, prefill_attention(qc, k, v, causal=args.causal))

    if args.trace:
        with jax.profiler.trace(args.trace):
            o = jax.jit(prefill_attention, static_argnames=("causal",))(
                q, k, v, causal=args.causal
            )
            jax.block_until_ready(o)
        print(f"profiler trace written to {args.trace}")

    dt = scan_timeit(step, q, args=(k, v), iters=8, rtt=rtt)
    frac = 0.5 if args.causal else 1.0
    flops = 4 * b * h * s * s * d * frac
    print(f"prefill b={b} h={h} s={s} d={d} causal={args.causal}: "
          f"{dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
