"""Backward-pass probe at the bench shape (fwd+bwd, causal, h24 d128).

A/Bs the fused single-pass kernel against the classic two-kernel split
(VERDICT r2: captured 68.7 TFLOP/s vs a 135 claim — reconcile at the
bench's own shapes). Usage: python scripts/probe_bwd.py [batch ...]
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from mfa_tpu.kernels.backward import flash_attention_bwd
from mfa_tpu.kernels.prefill import prefill_attention
from mfa_tpu.utils.timing import chain, measure_rtt, scan_timeit


def main():
    batches = [int(a) for a in sys.argv[1:]] or [8, 4]
    h, d, s = 24, 128, 2048
    rtt = measure_rtt()
    print(f"rtt ~{rtt*1e3:.1f} ms", flush=True)
    for b in batches:
        q = jax.random.normal(jax.random.key(0), (b, h, s, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (b, h, s, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), (b, h, s, d), jnp.bfloat16)
        do = jax.random.normal(jax.random.key(3), (b, h, s, d), jnp.bfloat16)
        # 7 matmuls total (fwd 2 + bwd 5) = 3.5x the causal fwd cost
        flops = 3.5 * 4 * b * h * s * s * d * 0.5

        def step_full(qc, k, v, do, _fused):
            out, lse = prefill_attention(qc, k, v, causal=True,
                                         return_lse=True)
            dq, dk, dv = flash_attention_bwd(qc, k, v, out, lse, do,
                                             causal=True, fused=_fused)
            return chain(qc, dq + dk + dv)

        for name, fused in (("fused", True), ("2-kernel", False)):
            def step(qc, k, v, do, _f=fused):
                return step_full(qc, k, v, do, _f)
            try:
                t = scan_timeit(step, q, args=(k, v, do), iters=48, rtt=rtt)
                print(f"b={b} s={s} {name}: {t*1e3:.3f} ms "
                      f"{flops/t/1e12:.1f} TFLOP/s", flush=True)
            except Exception as e:
                print(f"b={b} s={s} {name}: FAILED {type(e).__name__} "
                      f"{str(e)[:200]}", flush=True)

        # bwd-only (no fwd in the loop): isolates the kernel
        out, lse = prefill_attention(q, k, v, causal=True, return_lse=True)
        bflops = 2.5 * 4 * b * h * s * s * d * 0.5
        for name, kw in (("bwd-only fused", dict(fused=True)),
                         ("bwd-only slab512", dict(fused=True, kv_slab=512)),
                         ("bwd-only slab256", dict(fused=True, kv_slab=256)),
                         ("bwd-only d256", dict(fused=True, block_q=1024,
                                                block_k=1024)),
                         ("bwd-only 2-kernel", dict(fused=False))):
            def step(qc, k, v, do, out, lse, _kw=kw):
                dq, dk, dv = flash_attention_bwd(qc, k, v, out, lse, do,
                                                 causal=True, **_kw)
                return chain(qc, dq + dk + dv)
            try:
                t = scan_timeit(step, q, args=(k, v, do, out, lse),
                                iters=48, rtt=rtt)
                print(f"b={b} s={s} {name}: {t*1e3:.3f} ms "
                      f"{bflops/t/1e12:.1f} TFLOP/s", flush=True)
            except Exception as e:
                print(f"b={b} s={s} {name}: FAILED {type(e).__name__} "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
