"""On-chip sweep of the causal-prefill diag_block sub-tiling parameter."""
import sys

import jax
import jax.numpy as jnp

from mfa_tpu.utils.timing import chain, measure_rtt, scan_timeit


def main():
    from mfa_tpu.kernels.prefill import prefill_attention

    rtt = measure_rtt()
    print(f"rtt {rtt*1e3:.1f} ms", file=sys.stderr)
    for seq in (2048, 8192):
        batch = 8 if seq == 2048 else 1
        heads, d = 24, 128
        q0 = jax.random.normal(jax.random.key(0), (batch, heads, seq, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (batch, heads, seq, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), (batch, heads, seq, d), jnp.bfloat16)
        flops = 4 * batch * heads * seq * seq * d * 0.5
        for dsub in (0, 128, 256, 512):
            def step(q, k, v):
                return chain(q, prefill_attention(q, k, v, causal=True,
                                                  diag_block=dsub))
            try:
                dt = scan_timeit(step, q0, args=(k, v), rtt=rtt)
                print(f"s={seq} dsub={dsub}: {dt*1e3:.3f} ms, "
                      f"{flops/dt/1e12:.1f} TFLOP/s", flush=True)
            except Exception as e:
                print(f"s={seq} dsub={dsub}: FAILED {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
