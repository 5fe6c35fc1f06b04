"""Headline benchmark: decode attention HBM roofline with INT8 paged KV.

Prints ONE JSON line:
  {"metric": "decode_hbm_roofline_pct", "value": N, "unit": "%",
   "vs_baseline": N/85.0}

North star (BASELINE.json): decode attention at >85% of the HBM roofline
with INT8 KV-cache at KV length 8192, Llama-3-8B-shaped heads (32 q / 8 kv,
head_dim 128). vs_baseline is the achieved fraction of that 85% target, so
1.0 = target met, >1.0 = beaten.

Timing is pipelined (N async dispatches, one block) so the tunnel/dispatch
latency of this environment doesn't pollute the kernel measurement — the
same way a serving loop keeps the device queue full. Secondary numbers
(bf16 decode, prefill TFLOP/s) go to stderr.
"""

from __future__ import annotations

import json
import math
import sys
import time

import jax
import jax.numpy as jnp

# Public HBM bandwidth per chip, bytes/s.
HBM_BW = {
    "TPU v5 lite": 819e9,  # v5e
    "TPU v5": 819e9,
    "TPU v4": 1228e9,
    "TPU v5p": 2765e9,
    "TPU v6 lite": 1640e9,  # Trillium
}


def device_bw() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in HBM_BW.items():
        if kind.startswith(k):
            return v
    return 819e9


def timeit(fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_decode_int8(batch=24, heads=32, kv_heads=8, d=128, kv_len=8192,
                      page=128):
    from mfa_tpu.kernels.paged import paged_attention
    from mfa_tpu.kernels.quant import quantize_rows

    pps = kv_len // page
    num_pages = batch * pps + 1
    key = jax.random.key(0)
    q = jax.random.normal(key, (batch, heads, d), jnp.bfloat16)
    k_pages = jax.random.normal(jax.random.key(1), (kv_heads, num_pages, page, d))
    v_pages = jax.random.normal(jax.random.key(2), (kv_heads, num_pages, page, d))
    kq, ks = quantize_rows(k_pages, "int8")
    vq, vs = quantize_rows(v_pages, "int8")
    table = (
        jax.random.permutation(jax.random.key(3), num_pages - 1)[: batch * pps] + 1
    ).reshape(batch, pps).astype(jnp.int32)
    lens = jnp.full((batch,), kv_len, jnp.int32)

    fn = jax.jit(
        lambda q, kq, vq, lens, table, ks, vs: paged_attention(
            q, kq, vq, lens, table, k_scales=ks, v_scales=vs
        )
    )
    dt = timeit(fn, q, kq, vq, lens, table, ks, vs)

    payload = 2 * batch * kv_heads * kv_len * d * 1  # int8 K+V
    scales = 2 * batch * kv_heads * kv_len * 4  # fp32 row scales
    qo = batch * heads * d * (2 + 4)  # q in + o out (rough)
    bytes_moved = payload + scales + qo
    gbps = bytes_moved / dt / 1e9
    pct = 100.0 * bytes_moved / dt / device_bw()
    return dt, gbps, pct


def bench_decode_bf16(batch=24, heads=24, kv_heads=24, d=128, kv_len=8192):
    from mfa_tpu.kernels.decode import decode_attention

    key = jax.random.key(0)
    q = jax.random.normal(key, (batch, heads, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (batch, kv_heads, kv_len, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (batch, kv_heads, kv_len, d), jnp.bfloat16)
    lens = jnp.full((batch,), kv_len, jnp.int32)
    fn = jax.jit(lambda *a: decode_attention(*a))
    dt = timeit(fn, q, k, v, lens)
    bytes_moved = 2 * batch * kv_heads * kv_len * d * 2
    return dt, bytes_moved / dt / 1e9


def bench_prefill(batch=8, seq=2048, heads=24, d=128):
    from mfa_tpu import flash_attn_func

    key = jax.random.key(0)
    q = jax.random.normal(key, (batch, seq, heads, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (batch, seq, heads, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (batch, seq, heads, d), jnp.bfloat16)
    fn = lambda q, k, v: flash_attn_func(q, k, v, True)
    dt = timeit(fn, q, k, v, iters=10)
    flops = 4 * batch * heads * seq * seq * d * 0.5  # causal
    return dt, flops / dt / 1e12


def main():
    dt, gbps, pct = bench_decode_int8()
    print(
        f"[bench] int8 paged decode kv=8192: {dt*1e3:.3f} ms, {gbps:.0f} GB/s, "
        f"{pct:.1f}% of HBM roofline",
        file=sys.stderr,
    )
    try:
        dtb, gbpsb = bench_decode_bf16()
        print(
            f"[bench] bf16 decode kv=8192 (b24 h24): {dtb*1e3:.3f} ms, "
            f"{gbpsb:.0f} GB/s",
            file=sys.stderr,
        )
        dtp, tflops = bench_prefill()
        print(
            f"[bench] bf16 causal prefill b8 s2048 h24 d128: {dtp*1e3:.3f} ms, "
            f"{tflops:.1f} TFLOP/s",
            file=sys.stderr,
        )
    except Exception as e:  # secondary benches must not kill the headline
        print(f"[bench] secondary bench failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "decode_hbm_roofline_pct",
                "value": round(pct, 2),
                "unit": "%",
                "vs_baseline": round(pct / 85.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
