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

`run_serve()` is the importable core (bench.py drives it for the
driver-captured headline).
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def run_serve(layers=4, dim=4096, heads=32, kv_heads=8, ffn=14336,
              vocab=32000, batch=16, prompt_len=512, gen=32, page=128,
              quant="none", tp=1, burst=8, spec=0, prefix_cache=False,
              pipeline=True, wquant="none", spec_draft="quarter"):
    """Run the continuous-batching engine benchmark; returns a dict with
    prefill_tps, decode_tps, per_layer_ms, and (if spec) acceptance.

    wquant="int8": per-channel int8 WEIGHTS (models/wquant.py) — the
    BASELINE.md north-star 8B-shaped config only fits a 16 GB chip this
    way, and weight streaming is the decode-step floor."""
    from mfa_tpu.models import llama
    from mfa_tpu.serve.engine import Engine
    from mfa_tpu.shard.mesh import MODEL_AXIS, make_mesh

    cfg = llama.LlamaConfig(
        vocab_size=vocab, dim=dim, n_layers=layers,
        n_heads=heads, n_kv_heads=kv_heads, ffn_dim=ffn,
        dtype=jnp.bfloat16,
    )
    wq = None if wquant == "none" else wquant
    params = llama.init_params(jax.random.key(0), cfg, quantize=wq)
    mesh = (
        make_mesh({MODEL_AXIS: tp}, jax.devices()[:tp])
        if tp > 1
        else None
    )

    pages_per_seq = (prompt_len + gen) // page + 2
    num_pages = batch * pages_per_seq + 1
    quant = None if quant == "none" else quant
    spec_kw = {}
    if spec:
        if spec_draft == "self":
            # SELF-DRAFT CEILING: draft = the target model itself, so
            # greedy draft and verify argmaxes coincide and acceptance is
            # ~1.0. This measures the speculative MACHINERY's best case
            # (burst-draft + one-pass verify + rollback bookkeeping); a
            # production draft is a smaller distilled model, whose
            # agreement a random-weight harness cannot synthesize — an
            # independently-initialized draft accepts ~0 of its proposals
            # (measured: 0/16128 in the r5 capture), which benchmarks
            # nothing but the rejection path.
            spec_kw = dict(draft_params=params, draft_cfg=cfg,
                           spec_tokens=spec)
        else:
            draft_cfg = llama.LlamaConfig(
                vocab_size=vocab, dim=dim // 4, n_layers=1,
                n_heads=heads // 4, n_kv_heads=max(1, kv_heads // 4),
                ffn_dim=ffn // 4, dtype=jnp.bfloat16,
            )
            spec_kw = dict(
                draft_params=llama.init_params(jax.random.key(7), draft_cfg),
                draft_cfg=draft_cfg, spec_tokens=spec,
            )
    eng = Engine(
        params, cfg, num_pages=num_pages, page_size=page,
        max_seqs=batch, pages_per_seq=pages_per_seq,
        quant_dtype=quant, mesh=mesh, prefix_cache=prefix_cache,
        **spec_kw,
    )
    prompts = [
        list((jax.random.randint(jax.random.key(i), (prompt_len,), 1,
                                 vocab)).tolist())
        for i in range(batch)
    ]

    # Warmup is a full dress rehearsal of the timed workload (same
    # prompts, same gen): the first pipelined drain in a process pays
    # ~2s of one-time dispatch/compile overhead that a shape-truncated
    # warmup does not reproduce (measured: first pipelined run 695
    # tok/s, second 2575 — scripts/probe_serve_pipeline.py).
    for p in prompts:
        eng.submit(p, gen)
    eng.step()  # prefill + one plain decode step
    if spec:
        # warm the SPECULATIVE path TWICE: the fused greedy burst is one
        # big compiled program, and a handful of small shapes only
        # appear when draining from a REUSED engine (slot rotation /
        # tail pad buckets) — through this environment's remote compile
        # service even a trivial op costs seconds, so any straggler
        # shape in the timed region swamps the measurement
        while eng.sched.has_work:
            eng.step_speculative()
        for p in prompts:
            eng.submit(p, gen)
        eng.step()
        while eng.sched.has_work:
            eng.step_speculative()
    else:
        eng.run(burst=burst, pipeline=pipeline)

    for p in prompts:
        eng.submit(p, gen)
    # admit + prefill outside the timed decode loop
    t0 = time.time()
    eng.step()
    prefill_s = time.time() - t0
    t0 = time.time()
    steps0 = eng.stats.steps
    if spec:
        while eng.sched.has_work:
            eng.step_speculative()
    elif burst > 1:
        # the engine's own drain loop (pipelined by default: up to two
        # bursts in flight so token readback overlaps device compute)
        eng.run(burst=burst, pipeline=pipeline)
    else:
        while eng.sched.has_work:
            eng.step()
    jax.block_until_ready(eng.cache.lengths)
    decode_s = time.time() - t0
    steps = max(eng.stats.steps - steps0, 1)

    dec_tokens = batch * max(gen - 1, 1)
    res = dict(
        prefill_tps=batch * prompt_len / prefill_s,
        decode_tps=dec_tokens / decode_s,
        per_layer_ms=decode_s / steps / layers * 1e3,
        layers=layers, batch=batch,
    )
    if spec:
        res["spec_acceptance"] = eng.stats.spec_acceptance
        res["spec_accepted"] = eng.stats.spec_accepted
        res["spec_proposed"] = eng.stats.spec_proposed
    return res


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
    ap.add_argument("--wquant", choices=["none", "int8"], default="none",
                    help="int8 per-channel WEIGHT quantization")
    ap.add_argument("--tp", type=int, default=1, help="model-axis mesh size")
    ap.add_argument("--burst", type=int, default=8,
                    help="decode steps fused on-device per host sync")
    ap.add_argument("--spec", type=int, default=0,
                    help="speculative tokens per step (0 = off; draft = "
                         "1-layer slice of the same shape)")
    ap.add_argument("--spec-draft", choices=["quarter", "self"],
                    default="quarter",
                    help="draft model: 'quarter' = independent 1-layer "
                         "dim/4 model (realistic cost, ~0 acceptance with "
                         "random weights), 'self' = the target itself "
                         "(acceptance ~1: the machinery's ceiling)")
    ap.add_argument("--prefix-cache", action="store_true")
    ap.add_argument("--no-pipeline", action="store_true",
                    help="disable in-flight burst pipelining (sync loop)")
    args = ap.parse_args()

    res = run_serve(
        layers=args.layers, dim=args.dim, heads=args.heads,
        kv_heads=args.kv_heads, ffn=args.ffn, vocab=args.vocab,
        batch=args.batch, prompt_len=args.prompt_len, gen=args.gen,
        page=args.page, quant=args.quant, tp=args.tp, burst=args.burst,
        spec=args.spec, prefix_cache=args.prefix_cache,
        pipeline=not args.no_pipeline, wquant=args.wquant,
        spec_draft=args.spec_draft,
    )
    per_layer_ms = res["per_layer_ms"]
    print(
        f"serve layers={args.layers} dim={args.dim} b={args.batch} "
        f"prompt={args.prompt_len} gen={args.gen} quant={args.quant} "
        f"tp={args.tp}"
    )
    print(
        f"prefill: {res['prefill_tps']:.0f} tok/s   "
        f"decode: {res['decode_tps']:.0f} tok/s   "
        f"per-layer decode step: {per_layer_ms:.3f} ms "
        f"(32-layer extrapolation: {1e3 / (per_layer_ms * 32):.1f} "
        f"steps/s -> {args.batch * 1e3 / (per_layer_ms * 32):.0f} tok/s)"
    )
    if args.spec:
        print(f"speculative acceptance: {res['spec_acceptance']:.2f} "
              f"({res['spec_accepted']}/{res['spec_proposed']})")


if __name__ == "__main__":
    main()
