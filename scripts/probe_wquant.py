"""INT8 weight-matmul strategy probe at decode shapes.

Weight streaming bounds the full-model decode step (probe_decode_step),
so what matters at batch<=64 is HBM bytes, not MXU throughput. Variants:

  bf16           x[b,4096] @ w_bf16[4096,14336]          (117 MB stream)
  qmm            (x @ w_int8.astype(bf16)) * scale       (59 MB IF XLA
                 fuses the convert into the dot's operand stream — this
                 is what models/wquant.qmm emits)
  w8a8           per-row int8 x, int8xint8 dot -> int32, rescale (59 MB,
                 native int8 MXU; accuracy differs)
  deq-materialize x @ (w_int8.astype(bf16) * scale[None]) (whether the
                 scale multiply forces a bf16 HBM materialization)

Pass/fail: qmm time ~ 0.5x bf16 -> the convert fuses, wquant.qmm is the
right default. qmm ~ 1.5x bf16 -> XLA materializes; a Pallas dequant
matmul kernel is needed.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_wquant.py
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from mfa_tpu.models.wquant import quantize_weight  # noqa: E402
from mfa_tpu.utils.timing import chain, measure_rtt, scan_timeit  # noqa: E402


def main():
    rtt = measure_rtt()
    print(f"rtt ~{rtt*1e3:.1f} ms", flush=True)
    din, dout = 4096, 14336
    for batch in (16, 64):
        x0 = jax.random.normal(jax.random.key(0), (batch, din),
                               jnp.bfloat16)
        w = jax.random.normal(jax.random.key(1), (din, dout),
                              jnp.bfloat16)
        qw = quantize_weight(w)
        wq8, scale = qw.qw, qw.scale
        w_deq_bf16 = (wq8.astype(jnp.bfloat16)
                      * scale.astype(jnp.bfloat16)[None, :])
        bf16_bytes = din * dout * 2
        int8_bytes = din * dout + dout * 4

        def t(name, fn, args, bytes_):
            dt = scan_timeit(fn, x0, args=args, rtt=rtt, iters=48)
            print(f"b={batch} {name}: {dt*1e3:.3f} ms "
                  f"{bytes_/dt/1e9:.0f} GB/s of its stream", flush=True)
            return dt

        def f_bf16(x, w):
            return chain(x, (x @ w)[:, :din])

        def f_qmm(x, wq8, scale):
            out = (x @ wq8.astype(x.dtype)) * scale.astype(x.dtype)
            return chain(x, out[:, :din])

        def f_deqmat(x, w_deq):
            return chain(x, (x @ w_deq)[:, :din])

        def f_w8a8(x, wq8, scale):
            ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
            xs = jnp.where(ax == 0, 1.0, ax / 127.0)
            xi = jnp.clip(jnp.round(x.astype(jnp.float32) / xs[:, None]),
                          -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xi, wq8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            out = (acc.astype(jnp.float32) * xs[:, None]
                   * scale[None, :]).astype(x.dtype)
            return chain(x, out[:, :din])

        tb = t("bf16", f_bf16, (w,), bf16_bytes)
        tq = t("qmm (fused dequant)", f_qmm, (wq8, scale), int8_bytes)
        t("deq-materialized", f_deqmat, (w_deq_bf16,), bf16_bytes)
        t8 = t("w8a8 int8 dot", f_w8a8, (wq8, scale), int8_bytes)
        print(f"b={batch}: qmm speedup vs bf16 = {tb/tq:.2f}x, "
              f"w8a8 = {tb/t8:.2f}x", flush=True)


if __name__ == "__main__":
    main()
