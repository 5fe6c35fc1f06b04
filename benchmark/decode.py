"""Decode profile at one config + parity assert (reference: benchmark/decode.py).

Mirrors the reference's benchmark/decode.py (profile one paged-decode
config, assert parity first, benchmark/decode.py:27-49) with the TPU
tooling: parity vs the pure-jnp oracle, optional jax.profiler trace,
RTT-cancelling latency, and the HBM-roofline fraction the north star
tracks (BASELINE.md).

Usage:
  python benchmark/decode.py [--batch 24] [--kv-len 8192] [--quant int8]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from mfa_tpu.utils.timing import (  # noqa: E402
    chain, device_bw, measure_rtt, scan_timeit,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--heads", type=int, default=24)
    ap.add_argument("--kv-heads", type=int, default=24)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--kv-len", type=int, default=8192)
    ap.add_argument("--page", type=int, default=128)
    ap.add_argument("--quant", choices=["none", "int8", "fp8"], default="none")
    ap.add_argument("--trace", type=str, default=None)
    args = ap.parse_args()

    from mfa_tpu.kernels.paged import paged_attention
    from mfa_tpu.kernels.quant import quantize_rows
    from mfa_tpu.ref.oracle import paged_decode_ref

    b, h, hkv, d = args.batch, args.heads, args.kv_heads, args.head_dim
    page, kv_len = args.page, args.kv_len
    pps = kv_len // page
    num_pages = b * pps + 1

    q = jax.random.normal(jax.random.key(0), (b, h, d), jnp.bfloat16)
    k_pages = jax.random.normal(jax.random.key(1), (hkv, num_pages, page, d))
    v_pages = jax.random.normal(jax.random.key(2), (hkv, num_pages, page, d))
    table = (
        jax.random.permutation(jax.random.key(3), num_pages - 1)[: b * pps] + 1
    ).reshape(b, pps).astype(jnp.int32)
    lens = jnp.full((b,), kv_len, jnp.int32)

    elem = 2.0
    if args.quant != "none":
        kq, ks = quantize_rows(k_pages, args.quant)
        vq, vs = quantize_rows(v_pages, args.quant)
        elem = 1.0 + 4.0 / d  # int8/fp8 payload + fp32 scale per row
        kwargs = dict(k_scales=ks, v_scales=vs)
    else:
        kq = k_pages.astype(jnp.bfloat16)
        vq = v_pages.astype(jnp.bfloat16)
        ks = vs = None
        kwargs = {}

    # parity on a 2-sequence slice vs the fp32 oracle
    out = paged_attention(q[:2], kq, vq, lens[:2], table[:2], **kwargs)
    pool_k = jnp.transpose(
        kq.astype(jnp.float32)
        * (ks[..., None] if ks is not None else 1.0), (1, 2, 0, 3))
    pool_v = jnp.transpose(
        vq.astype(jnp.float32)
        * (vs[..., None] if vs is not None else 1.0), (1, 2, 0, 3))
    ref = paged_decode_ref(
        q[:2, None].astype(jnp.float32), pool_k, pool_v, lens[:2], table[:2]
    )[:, 0]
    diff = float(jnp.abs(out.astype(jnp.float32) - ref).max())
    assert diff < 3e-2, f"decode parity failed: max_diff={diff}"
    print(f"parity vs oracle: max_diff={diff:.5f}  OK")

    rtt = measure_rtt()

    def step(qc, kq, vq, lens, table, *scales):
        kw = dict(k_scales=scales[0], v_scales=scales[1]) if scales else {}
        return chain(qc, paged_attention(qc, kq, vq, lens, table, **kw))

    extra = (ks, vs) if args.quant != "none" else ()
    if args.trace:
        with jax.profiler.trace(args.trace):
            o = paged_attention(q, kq, vq, lens, table, **kwargs)
            jax.block_until_ready(o)
        print(f"profiler trace written to {args.trace}")

    dt = scan_timeit(step, q, args=(kq, vq, lens, table) + extra,
                     iters=32, rtt=rtt)
    bytes_moved = b * kv_len * hkv * d * 2 * elem
    bw = bytes_moved / dt
    pct = 100.0 * bw / device_bw()
    print(f"decode b={b} h={h}/{hkv} d={d} kv={kv_len} quant={args.quant}: "
          f"{dt*1e3:.3f} ms  {bw/1e9:.0f} GB/s  ({pct:.1f}% of HBM roofline)")


if __name__ == "__main__":
    main()
