"""Multimodal (image-block mask) prefill: flash kernel vs dense path.

Measures kernels/blockmask.py:image_block_prefill against the retained
dense reference (llama._attention_dense_masked) on Gemma3-shaped prompts
(one mm_tokens_per_image=256 image run per prompt), sweeping prompt
length. The dense path materializes [b, h, s, s] fp32 scores per call —
expect it to fall off a memory cliff where the flash tiling does not.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmark/multimodal_prefill.py
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import _chain, measure_rtt, scan_timeit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--kv-heads", type=int, default=4)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--image-tokens", type=int, default=256)
    ap.add_argument("--seqlens", type=int, nargs="+",
                    default=[512, 1024, 2048, 4096])
    args = ap.parse_args()

    from mfa_tpu.kernels.blockmask import image_block_prefill
    from mfa_tpu.models import llama

    cfg = llama.LlamaConfig.tiny(dim=args.heads * args.head_dim,
                                 heads=args.heads, kv_heads=args.kv_heads)
    rtt = measure_rtt()
    print(f"# multimodal prefill b={args.batch} {args.heads}q/"
          f"{args.kv_heads}kv d={args.head_dim} "
          f"image run={args.image_tokens} (rtt {rtt*1e3:.1f} ms)")
    print(f"{'seqlen':>8} {'flash ms':>10} {'TFLOP/s':>9} {'dense ms':>10} "
          f"{'speedup':>8}")
    for s in args.seqlens:
        shape_q = (args.batch, args.heads, s, args.head_dim)
        shape_k = (args.batch, args.kv_heads, s, args.head_dim)
        q = jax.random.normal(jax.random.key(0), shape_q, jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), shape_k, jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), shape_k, jnp.bfloat16)
        bids = np.full((args.batch, s), -1, np.int32)
        start = max(0, s // 4)
        bids[:, start:start + args.image_tokens] = 0
        bids = jnp.asarray(bids)

        def flash(q, k, v, bids=bids):
            return _chain(q, image_block_prefill(q, k, v, bids))

        iters = max(4, min(16, (2048 // s) * 4))
        dtf = scan_timeit(flash, q, args=(k, v), iters=iters, rtt=rtt)
        # causal flops + the extra bidirectional half of the image block
        flops = 4 * args.batch * args.heads * args.head_dim * (
            s * s * 0.5 + args.image_tokens ** 2 * 0.5)
        tflops = flops / dtf / 1e12

        # dense path on the model layout [b, s, h, d]
        q4 = jnp.swapaxes(q, 1, 2)
        k4 = jnp.swapaxes(k, 1, 2)
        v4 = jnp.swapaxes(v, 1, 2)
        same = (bids[:, :, None] == bids[:, None, :]) & (bids[:, :, None] >= 0)

        def dense(q4, k4, v4, same=same):
            return _chain(q4, llama._attention_dense_masked(
                q4, k4, v4, cfg, -1, same))

        try:
            dtd = scan_timeit(dense, q4, args=(k4, v4), iters=iters, rtt=rtt)
            dense_ms, speed = f"{dtd*1e3:10.3f}", f"{dtd/dtf:7.2f}x"
        except Exception as e:
            dense_ms, speed = f"OOM/{type(e).__name__}"[:10].rjust(10), "   inf"
        print(f"{s:>8} {dtf*1e3:10.3f} {tflops:9.1f} {dense_ms} {speed}",
              flush=True)


if __name__ == "__main__":
    main()
