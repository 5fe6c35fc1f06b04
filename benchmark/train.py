"""Training-step throughput: tokens/s/chip for a full fwd+bwd+AdamW step.

The reference has no training story at all (SURVEY.md §0: forward-only);
this captures the framework's training headline on real hardware — a
Llama-3.2-1B-shaped stack (or a --layers slice) at seq 2048 with per-layer
remat, driven through llama.train_step (flash fwd + fused single-pass
backward + optax adamw).

Usage:
  python benchmark/train.py [--layers 16] [--batch 4] [--seq 2048]
  [--dim 2048] [--remat]

`run_train_bench()` is the importable core (bench.py drives it).
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def run_train_bench(layers=8, dim=2048, heads=32, kv_heads=8, ffn=8192,
                    vocab=32768, batch=4, seq=2048, remat=True):
    """Default is an 8-layer Llama-3.2-1B-shaped slice (~0.6B params):
    AdamW fp32 moments on the full 16 layers (~1.2B) would not leave
    activation headroom on one 16GB v5e."""
    import optax

    from mfa_tpu.models import llama
    from mfa_tpu.utils.timing import chain, measure_rtt, scan_timeit

    cfg = llama.LlamaConfig(
        vocab_size=vocab, dim=dim, n_layers=layers, n_heads=heads,
        n_kv_heads=kv_heads, ffn_dim=ffn, dtype=jnp.bfloat16,
    )
    params = llama.init_params(jax.random.key(0), cfg)
    tokens = jax.random.randint(jax.random.key(1), (batch, seq + 1), 1,
                                vocab).astype(jnp.int32)
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params)
    rtt = measure_rtt()

    def wrapped(tok, params, opt_state):
        new_params, new_opt, loss = llama.train_step(
            params, tok, cfg, remat=remat, optimizer=tx,
            opt_state=opt_state)
        # depend on ONE element of every updated leaf so the optimizer
        # update chains cannot be dead-code-eliminated (the timing carry
        # is the token array; params/opt_state are loop-invariant args)
        dep = jax.tree.reduce(
            lambda a, x: a + x.ravel()[0].astype(jnp.float32),
            new_params, loss.astype(jnp.float32))
        return chain(tok, dep * jnp.ones((), jnp.float32))

    dt = scan_timeit(wrapped, tokens, args=(params, opt_state), rtt=rtt)
    toks = batch * seq
    # model flops: 6 * params_active * tokens (fwd 2 + bwd 4) + attention
    n_params = sum(x.size for x in jax.tree.leaves(params))
    flops = 6.0 * n_params * toks + 3.5 * 4 * batch * heads * seq * seq * (
        dim // heads) * 0.5
    return dict(step_s=dt, tokens_per_s=toks / dt,
                mfu_flops=flops / dt, n_params=n_params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--dim", type=int, default=2048)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--ffn", type=int, default=8192)
    ap.add_argument("--vocab", type=int, default=32768)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--no-remat", action="store_true")
    args = ap.parse_args()
    res = run_train_bench(
        layers=args.layers, dim=args.dim, heads=args.heads,
        kv_heads=args.kv_heads, ffn=args.ffn, vocab=args.vocab,
        batch=args.batch, seq=args.seq, remat=not args.no_remat)
    from mfa_tpu.utils.timing import device_peak_flops

    print(f"train step ({args.layers}L dim{args.dim} "
          f"{res['n_params']/1e9:.2f}B params, b{args.batch} s{args.seq}, "
          f"remat={not args.no_remat}): {res['step_s']*1e3:.1f} ms, "
          f"{res['tokens_per_s']:.0f} tok/s/chip, "
          f"~{res['mfu_flops']/1e12:.1f} TFLOP/s "
          f"({100*res['mfu_flops']/device_peak_flops():.0f}% MFU)")


if __name__ == "__main__":
    main()
