"""Serving throughput benchmark: continuous-batching decode tokens/s.

BASELINE.md north star: tokens/s on Llama-3-8B-shaped decode (32 q heads /
8 kv heads, head_dim 128) with quantized KV, at 1 chip and on a TP mesh.
A full 8B does not fit one v5e chip in bf16, so the default runs a
layer-slice (--layers, default 4) and also reports per-layer decode time,
which extrapolates linearly in layer count (each layer is the same
matmul+attention block).

Usage:
  python benchmark/serve.py [--layers 4] [--batch 16] [--prompt-len 512]
                            [--gen 32] [--quant int8] [--tp N]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--dim", type=int, default=4096)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--ffn", type=int, default=14336)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--prompt-len", type=int, default=512)
    ap.add_argument("--gen", type=int, default=32)
    ap.add_argument("--page", type=int, default=128)
    ap.add_argument("--quant", choices=["none", "int8", "fp8", "int4"], default="none")
    ap.add_argument("--tp", type=int, default=1, help="model-axis mesh size")
    ap.add_argument("--burst", type=int, default=8,
                    help="decode steps fused on-device per host sync")
    ap.add_argument("--spec", type=int, default=0,
                    help="speculative tokens per step (0 = off; draft = "
                         "1-layer slice of the same shape)")
    ap.add_argument("--prefix-cache", action="store_true")
    args = ap.parse_args()

    from mfa_tpu.models import llama
    from mfa_tpu.serve.engine import Engine
    from mfa_tpu.shard.mesh import MODEL_AXIS, make_mesh

    cfg = llama.LlamaConfig(
        vocab_size=args.vocab, dim=args.dim, n_layers=args.layers,
        n_heads=args.heads, n_kv_heads=args.kv_heads, ffn_dim=args.ffn,
        dtype=jnp.bfloat16,
    )
    params = llama.init_params(jax.random.key(0), cfg)
    mesh = (
        make_mesh({MODEL_AXIS: args.tp}, jax.devices()[: args.tp])
        if args.tp > 1
        else None
    )

    pages_per_seq = (args.prompt_len + args.gen) // args.page + 2
    num_pages = args.batch * pages_per_seq + 1
    quant = None if args.quant == "none" else args.quant
    spec_kw = {}
    if args.spec:
        draft_cfg = llama.LlamaConfig(
            vocab_size=args.vocab, dim=args.dim // 4, n_layers=1,
            n_heads=args.heads // 4, n_kv_heads=max(1, args.kv_heads // 4),
            ffn_dim=args.ffn // 4, dtype=jnp.bfloat16,
        )
        spec_kw = dict(
            draft_params=llama.init_params(jax.random.key(7), draft_cfg),
            draft_cfg=draft_cfg, spec_tokens=args.spec,
        )
    eng = Engine(
        params, cfg, num_pages=num_pages, page_size=args.page,
        max_seqs=args.batch, pages_per_seq=pages_per_seq,
        quant_dtype=quant, mesh=mesh, prefix_cache=args.prefix_cache,
        **spec_kw,
    )
    prompts = [
        list((jax.random.randint(jax.random.key(i), (args.prompt_len,), 1,
                                 args.vocab)).tolist())
        for i in range(args.batch)
    ]

    # Warmup compiles every program the timed loop uses: prefill, the
    # single decode_step bucket (used right after prefill), and the
    # power-of-two burst programs.
    for p in prompts:
        eng.submit(p, max(2, args.burst + 2))
    eng.step()  # prefill + one plain decode step
    eng.run(burst=args.burst)

    for p in prompts:
        eng.submit(p, args.gen)
    # admit + prefill outside the timed decode loop
    t0 = time.time()
    eng.step()
    prefill_s = time.time() - t0
    t0 = time.time()
    steps = 0
    while eng.sched.has_work:
        if args.spec:
            eng.step_speculative()
            steps += 1
        elif args.burst > 1:
            eng.step_burst(args.burst)
            steps += args.burst
        else:
            eng.step()
            steps += 1
    jax.block_until_ready(eng.cache.lengths)
    decode_s = time.time() - t0

    dec_tokens = args.batch * max(args.gen - 1, 1)
    tps = dec_tokens / decode_s
    per_layer_ms = decode_s / steps / args.layers * 1e3
    print(
        f"serve layers={args.layers} dim={args.dim} b={args.batch} "
        f"prompt={args.prompt_len} gen={args.gen} quant={args.quant} "
        f"tp={args.tp}"
    )
    print(
        f"prefill: {args.batch * args.prompt_len / prefill_s:.0f} tok/s   "
        f"decode: {tps:.0f} tok/s   "
        f"per-layer decode step: {per_layer_ms:.3f} ms "
        f"(32-layer extrapolation: {1e3 / (per_layer_ms * 32):.1f} "
        f"steps/s -> {args.batch * 1e3 / (per_layer_ms * 32):.0f} tok/s)"
    )
    if args.spec:
        print(f"speculative acceptance: {eng.stats.spec_acceptance:.2f} "
              f"({eng.stats.spec_accepted}/{eng.stats.spec_proposed})")


if __name__ == "__main__":
    main()
