"""Runnable serving example: continuous batching with every engine feature.

    python examples/serve.py                # tiny model, CPU or TPU
    python examples/serve.py --tp 4         # TP over 4 local chips
    python examples/serve.py --quant int8 --prefix-cache --burst 16
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mfa_tpu.models import llama
from mfa_tpu.serve.engine import Engine
from mfa_tpu.serve.multihost import serving_mesh
from mfa_tpu.serve.sampling import SamplingParams


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--kv-heads", type=int, default=4)
    ap.add_argument("--vocab", type=int, default=4096)
    ap.add_argument("--quant", choices=["none", "int8", "fp8"],
                    default="none")
    ap.add_argument("--tp", type=int, default=0, help="0 = no mesh")
    ap.add_argument("--burst", type=int, default=8)
    ap.add_argument("--prefix-cache", action="store_true")
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--top-p", type=float, default=1.0)
    args = ap.parse_args()

    cfg = llama.LlamaConfig(
        vocab_size=args.vocab, dim=args.dim, n_layers=args.layers,
        n_heads=args.heads, n_kv_heads=args.kv_heads, ffn_dim=args.dim * 3,
        dtype=jnp.bfloat16,
    )
    params = llama.init_params(jax.random.key(0), cfg)
    eng = Engine(
        params, cfg,
        num_pages=256, page_size=64, max_seqs=8, pages_per_seq=16,
        quant_dtype=None if args.quant == "none" else args.quant,
        mesh=serving_mesh(args.tp) if args.tp else None,
        prefix_cache=args.prefix_cache,
        sampling=SamplingParams(temperature=args.temperature,
                                top_p=args.top_p),
    )
    reqs = [
        eng.submit(list(jax.random.randint(
            jax.random.key(i), (64,), 1, cfg.vocab_size).tolist()), 32)
        for i in range(6)
    ]
    stats = eng.run(burst=args.burst)
    for r in reqs:
        print(f"req {r.uid}: {len(r.generated)} tokens, "
              f"mean logprob {sum(r.logprobs)/len(r.logprobs):.3f}")
    print(f"decode throughput: {stats.decode_tokens_per_s:.0f} tok/s "
          f"({stats.decode_tokens} tokens, {stats.steps} steps)")


if __name__ == "__main__":
    main()
