"""Autotune sweep: measure tile/page-block choices on the live chip.

Sweeps the prefill (block_q, block_k) grid and the paged-decode
pages_per_compute_block on the attached TPU and prints the winners next to
what dispatch/config.py currently picks. The shipped defaults were chosen
with exactly this tool on v5e; re-run on new hardware generations and
update choose_prefill_config / the paged-kernel VMEM budget if the winners
move.

Usage: python benchmark/autotune.py [--seqlen 2048] [--kv-len 8192]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from mfa_tpu.utils.timing import chain, measure_rtt, scan_timeit  # noqa: E402


def tune_prefill(args, rtt):
    from mfa_tpu.dispatch.config import choose_prefill_config
    from mfa_tpu.kernels.prefill import prefill_attention

    b, h, d, s = args.batch, args.heads, args.head_dim, args.seqlen
    q = jax.random.normal(jax.random.key(0), (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, h, s, d), jnp.bfloat16)
    flops = 4 * b * h * s * s * d * 0.5
    best = None
    print(f"# prefill sweep b={b} h={h} s={s} d={d} causal")
    for bq in (256, 512, 1024):
        for bk in (256, 512, 1024, 2048):
            if bq > s or bk > s:
                continue

            def step(qc, k, v):
                return chain(qc, prefill_attention(
                    qc, k, v, causal=True, block_q=bq, block_k=bk))

            try:
                dt = scan_timeit(step, q, args=(k, v), iters=8, rtt=rtt)
            except Exception as e:  # tile rejected by Mosaic / VMEM
                print(f"  bq={bq:5d} bk={bk:5d}: skipped ({type(e).__name__})")
                continue
            tf = flops / dt / 1e12
            mark = ""
            if best is None or dt < best[0]:
                best = (dt, bq, bk)
                mark = "  <-- best"
            print(f"  bq={bq:5d} bk={bk:5d}: {dt*1e3:7.3f} ms "
                  f"{tf:6.1f} TFLOP/s{mark}")
    cur = choose_prefill_config(s, s, d, 2)
    print(f"best: block_q={best[1]} block_k={best[2]}; "
          f"config.py picks block_q={cur.block_q} block_k={cur.block_k}")


def tune_paged_decode(args, rtt):
    from mfa_tpu.kernels.paged import paged_attention
    from mfa_tpu.kernels.quant import quantize_rows

    b, h, hkv, d = args.batch, 32, 8, args.head_dim
    page, kv_len = args.page, args.kv_len
    pps = kv_len // page
    num_pages = b * pps + 1
    q = jax.random.normal(jax.random.key(0), (b, h, d), jnp.bfloat16)
    kq, ks = quantize_rows(
        jax.random.normal(jax.random.key(1), (hkv, num_pages, page, d)),
        "int8")
    vq, vs = quantize_rows(
        jax.random.normal(jax.random.key(2), (hkv, num_pages, page, d)),
        "int8")
    table = jnp.arange(1, 1 + b * pps, dtype=jnp.int32).reshape(b, pps)
    lens = jnp.full((b,), kv_len, jnp.int32)
    bytes_moved = b * kv_len * hkv * d * 2 * (1 + 4.0 / d)
    print(f"# paged int8 decode sweep b={b} {h}q/{hkv}kv d={d} kv={kv_len} "
          f"page={page}")
    best = None
    for ppb in (1, 2, 4, 8, 16, 32, 64):
        if ppb > pps:
            continue

        def step(qc, kq, vq, lens, table, ks, vs):
            return chain(qc, paged_attention(
                qc, kq, vq, lens, table, k_scales=ks, v_scales=vs,
                pages_per_compute_block=ppb))

        try:
            dt = scan_timeit(step, q, args=(kq, vq, lens, table, ks, vs),
                             iters=16, rtt=rtt)
            if dt < 1e-6:  # 2N-N differencing collapsed (tunnel jitter)
                dt = scan_timeit(step, q,
                                 args=(kq, vq, lens, table, ks, vs),
                                 iters=32, rtt=rtt)
        except Exception as e:
            print(f"  ppb={ppb:3d}: skipped ({type(e).__name__})")
            continue
        if dt < 1e-6:
            print(f"  ppb={ppb:3d}: unreliable measurement, skipped")
            continue
        gbs = bytes_moved / dt / 1e9
        mark = ""
        if best is None or dt < best[0]:
            best = (dt, ppb)
            mark = "  <-- best"
        print(f"  ppb={ppb:3d}: {dt*1e3:7.3f} ms {gbs:6.0f} GB/s{mark}")
    print(f"best: pages_per_compute_block={best[1]} "
          f"(kernel default: VMEM-budget cap, usually whole-sequence)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--heads", type=int, default=24)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--seqlen", type=int, default=2048)
    ap.add_argument("--kv-len", type=int, default=8192)
    ap.add_argument("--page", type=int, default=128)
    ap.add_argument("--skip-prefill", action="store_true")
    ap.add_argument("--skip-decode", action="store_true")
    args = ap.parse_args()
    rtt = measure_rtt()
    print(f"(sync rtt {rtt*1e3:.1f} ms)")
    if not args.skip_prefill:
        tune_prefill(args, rtt)
    if not args.skip_decode:
        tune_paged_decode(args, rtt)


if __name__ == "__main__":
    main()
