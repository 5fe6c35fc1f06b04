"""Prefill kernel at the SERVING wave shape (b16 32q/8kv s512 d128):
the engine prefill pads admitted prompts to page buckets and runs
llama's flash path — small single-cell grids where per-call overheads
dominate. Usage: python scripts/probe_serve_shape.py"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from mfa_tpu.kernels.prefill import prefill_attention
from mfa_tpu.utils.timing import chain, measure_rtt, scan_timeit


def main():
    rtt = measure_rtt()
    print(f"rtt ~{rtt*1e3:.1f} ms", flush=True)
    for b, h, hkv, s in [(16, 32, 8, 512), (16, 32, 8, 256)]:
        q = jax.random.normal(jax.random.key(0), (b, h, s, 128), jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (b, hkv, s, 128), jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), (b, hkv, s, 128), jnp.bfloat16)
        flops = 4 * b * h * s * s * 128 * 0.5
        for name, kw in [
            ("default", dict()),
            ("d0 s0", dict(diag_block=0, kv_slab=0)),
            ("classic", dict(bound_softmax=False)),
            ("bht default", dict(flat_grid=False)),
        ]:
            def step(qc, k, v, _kw=kw):
                return chain(qc, prefill_attention(qc, k, v, causal=True,
                                                   **_kw))
            try:
                t = scan_timeit(step, q, args=(k, v), iters=64, rtt=rtt)
                print(f"b={b} s={s} {name}: {t*1e3:.3f} ms "
                      f"{flops/t/1e12:.1f} TFLOP/s", flush=True)
            except Exception as e:
                print(f"b={b} s={s} {name}: FAILED {type(e).__name__} "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
