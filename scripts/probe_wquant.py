"""INT8 weight-matmul strategy probe at decode shapes.

Weight streaming bounds the full-model decode step (probe_decode_step),
so what matters at batch<=64 is HBM bytes. METHODOLOGY: a single
loop-invariant weight can stay VMEM-resident across scan iterations
(first version of this probe measured bf16 ABOVE the HBM roofline), so
each timed step sweeps L=8 stacked weights [8, 4096, 14336] — 936 MB
bf16 / 470 MB int8, far beyond VMEM — matching how layer-scanned decode
actually streams.

Variants:
  bf16           x @ w_bf16                      (117 MB/layer stream)
  qmm-xla        (x @ w_int8.astype(bf16)) * s   (what XLA does with the
                 naive graph — materializes the convert, 2.5x traffic)
  w8a8           per-row int8 x, int8xint8 dot -> int32, rescale
  pallas         kernels/wmatmul.int8_matmul (int8 tiles DMA'd, VPU
                 convert in-register, fused scale) — wquant.qmm's TPU
                 backend

MEASURED (v5e, 2026-08-20, iters=48): bf16 1.285 ms; qmm-xla slower
than bf16 (the materialization); pallas ~0.65 ms (~2x) — see probe
output in repo history / PERF notes.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_wquant.py
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from mfa_tpu.kernels.wmatmul import int8_matmul  # noqa: E402
from mfa_tpu.models.wquant import quantize_weight  # noqa: E402
from mfa_tpu.utils.timing import chain, measure_rtt, scan_timeit  # noqa: E402

L = 8


def main():
    rtt = measure_rtt()
    print(f"rtt ~{rtt*1e3:.1f} ms", flush=True)
    din, dout = 4096, 14336
    ws = jax.random.normal(jax.random.key(1), (L, din, dout), jnp.bfloat16)
    qw = quantize_weight(ws)  # [L, din, dout] int8 + [L, dout] scales
    wq8, scale = qw.qw, qw.scale
    bf16_bytes = L * din * dout * 2
    int8_bytes = L * (din * dout + dout * 4)

    for batch in (16, 64):
        x0 = jax.random.normal(jax.random.key(0), (batch, din),
                               jnp.bfloat16)

        def t(name, fn, args, bytes_):
            dt = scan_timeit(fn, x0, args=args, rtt=rtt, iters=48)
            print(f"b={batch} {name}: {dt*1e3:.3f} ms "
                  f"{bytes_/dt/1e9:.0f} GB/s of its stream", flush=True)
            return dt

        # each variant scans the L stacked weights inside one step
        def f_bf16(x, ws):
            def body(c, w):
                o = c @ w
                return chain(c, jnp.sum(o, axis=1, keepdims=True)), 0
            out, _ = jax.lax.scan(body, x, ws)
            return out

        def f_qmm_xla(x, wq8, scale):
            def body(c, xs):
                w8, s = xs
                o = (c @ w8.astype(c.dtype)) * s.astype(c.dtype)
                return chain(c, jnp.sum(o, axis=1, keepdims=True)), 0
            out, _ = jax.lax.scan(body, x, (wq8, scale))
            return out

        def f_w8a8(x, wq8, scale):
            def body(c, xs):
                w8, s = xs
                ax = jnp.max(jnp.abs(c.astype(jnp.float32)), axis=-1)
                cs = jnp.where(ax == 0, 1.0, ax / 127.0)
                ci = jnp.clip(
                    jnp.round(c.astype(jnp.float32) / cs[:, None]),
                    -127, 127).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    ci, w8, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                o = (acc.astype(jnp.float32) * cs[:, None] * s[None, :]
                     ).astype(c.dtype)
                return chain(c, jnp.sum(o, axis=1, keepdims=True)), 0
            out, _ = jax.lax.scan(body, x, (wq8, scale))
            return out

        def f_pallas(x, wq8, scale):
            def body(c, xs):
                w8, s = xs
                o = int8_matmul(c, w8, s)
                return chain(c, jnp.sum(o, axis=1, keepdims=True)), 0
            out, _ = jax.lax.scan(body, x, (wq8, scale))
            return out

        tb = t("bf16", f_bf16, (ws,), bf16_bytes)
        tq = t("qmm-xla (naive dequant)", f_qmm_xla, (wq8, scale),
               int8_bytes)
        t8 = t("w8a8 int8 dot", f_w8a8, (wq8, scale), int8_bytes)
        tp = t("pallas int8_matmul", f_pallas, (wq8, scale), int8_bytes)
        print(f"b={batch}: vs bf16 — qmm-xla {tb/tq:.2f}x, "
              f"w8a8 {tb/t8:.2f}x, pallas {tb/tp:.2f}x", flush=True)


if __name__ == "__main__":
    main()
