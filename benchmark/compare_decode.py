"""Decode latency sweep (reference: benchmark/compare_decode.py).

Sweeps KV length at the reference's README decode config (batch 24,
24 heads, d=128, seqlen_q=1) for bf16 contiguous, bf16 paged, and int8
paged caches, reporting latency, GB/s, and % of the HBM roofline.

Usage: python benchmark/compare_decode.py [--batch 24] [--heads 24]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import _chain, device_bw, measure_rtt, scan_timeit  # noqa: E402


def bench_contig(rtt, batch, heads, kv_heads, d, kv_len):
    from mfa_tpu.kernels.decode import decode_attention

    q0 = jax.random.normal(jax.random.key(0), (batch, heads, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (batch, kv_heads, kv_len, d),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), k.shape, jnp.bfloat16)
    lens = jnp.full((batch,), kv_len, jnp.int32)

    def step(q, k, v, lens):
        return _chain(q, decode_attention(q, k, v, lens))

    dt = scan_timeit(step, q0, args=(k, v, lens), rtt=rtt)
    return dt, 2 * batch * kv_heads * kv_len * d * 2


def bench_paged(rtt, batch, heads, kv_heads, d, kv_len, page=128, quant=None):
    from mfa_tpu.kernels.paged import paged_attention
    from mfa_tpu.kernels.quant import quantize_rows

    pps = kv_len // page
    num_pages = batch * pps + 1
    q0 = jax.random.normal(jax.random.key(0), (batch, heads, d), jnp.bfloat16)
    kp = jax.random.normal(jax.random.key(1), (kv_heads, num_pages, page, d))
    vp = jax.random.normal(jax.random.key(2), kp.shape)
    table = (
        jax.random.permutation(jax.random.key(3), num_pages - 1)[: batch * pps]
        + 1
    ).reshape(batch, pps).astype(jnp.int32)
    lens = jnp.full((batch,), kv_len, jnp.int32)
    if quant:
        from mfa_tpu.cache.paged_cache import pack_pages_payload

        kq, ks = quantize_rows(kp, quant)
        vq, vs = quantize_rows(vp, quant)
        if quant == "int4":  # token-pair nibble-packed pages
            kq = pack_pages_payload("int4", kq.reshape(kv_heads, -1, d),
                                    num_pages, page)
            vq = pack_pages_payload("int4", vq.reshape(kv_heads, -1, d),
                                    num_pages, page)
        qd = quant if quant == "int4" else None

        def step(q, kq, vq, lens, table, ks, vs):
            return _chain(q, paged_attention(q, kq, vq, lens, table,
                                             k_scales=ks, v_scales=vs,
                                             quant_dtype=qd))

        dt = scan_timeit(step, q0, args=(kq, vq, lens, table, ks, vs),
                         rtt=rtt)
        itemsize = 0.5 if quant == "int4" else 1
        extra = 2 * batch * kv_heads * kv_len * 4  # scales
    else:
        kpb = kp.astype(jnp.bfloat16)
        vpb = vp.astype(jnp.bfloat16)

        def step(q, kp, vp, lens, table):
            return _chain(q, paged_attention(q, kp, vp, lens, table))

        dt = scan_timeit(step, q0, args=(kpb, vpb, lens, table),
                         rtt=rtt)
        itemsize = 2
        extra = 0
    return dt, int(2 * batch * kv_heads * kv_len * d * itemsize) + extra


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--heads", type=int, default=24)
    ap.add_argument("--kv-heads", type=int, default=None)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--kv-lens", type=int, nargs="+",
                    default=[512, 1024, 2048, 4096, 8192])
    args = ap.parse_args()
    kv_heads = args.kv_heads or args.heads

    rtt = measure_rtt()
    bw = device_bw()
    print(f"# decode sweep b={args.batch} h={args.heads}/{kv_heads} "
          f"d={args.head_dim} (rtt {rtt*1e3:.1f} ms, roofline {bw/1e9:.0f} GB/s)")
    print(f"{'kv_len':>8} {'variant':>12} {'ms':>9} {'GB/s':>8} {'%roof':>7}")
    for kv_len in args.kv_lens:
        for name, fn in [
            ("bf16", lambda: bench_contig(rtt, args.batch, args.heads,
                                          kv_heads, args.head_dim, kv_len)),
            ("bf16-paged", lambda: bench_paged(rtt, args.batch, args.heads,
                                               kv_heads, args.head_dim, kv_len)),
            ("int8-paged", lambda: bench_paged(rtt, args.batch, args.heads,
                                               kv_heads, args.head_dim, kv_len,
                                               quant="int8")),
            ("int4-paged", lambda: bench_paged(rtt, args.batch, args.heads,
                                               kv_heads, args.head_dim, kv_len,
                                               quant="int4")),
        ]:
            dt, nbytes = fn()
            print(f"{kv_len:>8} {name:>12} {dt*1e3:>9.3f} "
                  f"{nbytes/dt/1e9:>8.0f} {100*nbytes/dt/bw:>7.1f}")


if __name__ == "__main__":
    main()
