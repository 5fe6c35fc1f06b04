"""A/B the bound-softmax prefill path vs the classic max-tracking path
on chip, at the headline shapes. Usage: python scripts/ab_bound.py [s ...]"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from mfa_tpu.kernels.prefill import prefill_attention
from mfa_tpu.utils.timing import chain, measure_rtt, scan_timeit


def main():
    seqs = [int(a) for a in sys.argv[1:]] or [2048, 8192]
    h, d = 24, 128
    rtt = measure_rtt()
    print(f"rtt ~{rtt*1e3:.1f} ms")
    for s in seqs:
        b = 16384 // s * 2
        q = jax.random.normal(jax.random.key(0), (b, h, s, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (b, h, s, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), (b, h, s, d), jnp.bfloat16)
        flops = 4 * b * h * s * s * d * 0.5
        # diag_block semantics: None = auto, 0 = FORCE the monolithic
        # diagonal (prefill_attention treats 0 as an explicit monolith
        # sentinel — the r2 probe's `_d or None` silently remapped 0 to
        # auto, so the monolith row was never actually measured).
        for bound, diag in ((False, None), (True, None), (True, 0),
                            (True, 512), (True, 256), (True, 128)):
            def step(qc, k, v, _b=bound, _d=diag):
                return chain(qc, prefill_attention(
                    qc, k, v, causal=True, bound_softmax=_b,
                    diag_block=_d))
            t = scan_timeit(step, q, args=(k, v), iters=8, rtt=rtt)
            print(f"s={s} b={b} bound={bound} diag={diag}: {t*1e3:.3f} ms "
                  f"{flops/t/1e12:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
