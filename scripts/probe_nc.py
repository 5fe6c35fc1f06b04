"""Isolate the causal-structure cost: run the production prefill kernel
NONCAUSAL at the bench shapes and compare its RAW TFLOP/s against the
probe_passes ceiling (~158 raw on v5e, noncausal rect 1024^2 stream).
Usage: python scripts/probe_nc.py
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from mfa_tpu.kernels.prefill import prefill_attention
from mfa_tpu.utils.timing import chain, measure_rtt, scan_timeit


def main():
    h, d = 24, 128
    rtt = measure_rtt()
    print(f"rtt ~{rtt*1e3:.1f} ms", flush=True)
    for b, s, causal in [(8, 2048, False), (2, 8192, False),
                         (2, 4096, False), (8, 2048, True),
                         (2, 4096, True)]:
        q = jax.random.normal(jax.random.key(0), (b, h, s, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (b, h, s, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), (b, h, s, d), jnp.bfloat16)
        raw = 4 * b * h * s * s * d
        for name, kw in [("bound", dict()),
                         ("classic", dict(bound_softmax=False))]:
            def step(qc, k, v, _kw=kw, _c=causal):
                return chain(qc, prefill_attention(qc, k, v, causal=_c,
                                                   **_kw))
            t = scan_timeit(step, q, args=(k, v), rtt=rtt)
            eff = raw * (0.5 if causal else 1.0)
            print(f"b={b} s={s} causal={causal} {name}: {t*1e3:.3f} ms "
                  f"raw {raw*(0.5 if causal else 1.0)/t/1e12:.1f} "
                  f"useful {eff/t/1e12:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
