"""Round-3 prefill probe at the BENCH shapes (b8/s2048, b2/s8192).

Measures the current default plus classic and diag-slab variants so tuning
decisions are made at the shapes the driver actually captures (the round-2
probe ran b16/b4 and mistuned the default — VERDICT.md weak #1/#4).
Usage: python scripts/probe_r3.py [variant ...]
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from mfa_tpu.kernels.prefill import prefill_attention
from mfa_tpu.utils.timing import chain, measure_rtt, scan_timeit

SHAPES = [(8, 2048), (2, 8192)]


def main():
    h, d = 24, 128
    rtt = measure_rtt()
    print(f"rtt ~{rtt*1e3:.1f} ms", flush=True)
    for b, s in SHAPES:
        q = jax.random.normal(jax.random.key(0), (b, h, s, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (b, h, s, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), (b, h, s, d), jnp.bfloat16)
        flops = 4 * b * h * s * s * d * 0.5
        variants = [
            ("default (merged)", dict()),
            ("unchecked", dict(bound_softmax="unchecked")),
            ("unchecked d256 s256", dict(bound_softmax="unchecked",
                                         diag_block=256, kv_slab=256)),
            ("unchecked d512 s0", dict(bound_softmax="unchecked",
                                       diag_block=512, kv_slab=0)),
        ]
        for name, kw in variants:
            def step(qc, k, v, _kw=kw):
                return chain(qc, prefill_attention(qc, k, v, causal=True,
                                                   **_kw))
            try:
                t = scan_timeit(step, q, args=(k, v), iters=48, rtt=rtt)
                print(f"b={b} s={s} {name}: {t*1e3:.3f} ms "
                      f"{flops/t/1e12:.1f} TFLOP/s", flush=True)
            except Exception as e:
                print(f"b={b} s={s} {name}: FAILED {type(e).__name__} "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
