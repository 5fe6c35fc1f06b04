"""Runnable training example: DP x TP mesh, remat, optax.

    python examples/train.py                       # single device
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python examples/train.py --dp 2 --tp 4
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from mfa_tpu.models import llama
from mfa_tpu.shard.mesh import DATA_AXIS, MODEL_AXIS, make_mesh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--seq", type=int, default=128)
    args = ap.parse_args()

    cfg = llama.LlamaConfig.tiny(
        vocab=512, dim=256, layers=2, heads=4 * max(args.tp, 1),
        kv_heads=max(args.tp, 1), ffn=512, dtype=jnp.bfloat16,
    )
    params = llama.init_params(jax.random.key(0), cfg)
    mesh = None
    if args.dp * args.tp > 1:
        mesh = make_mesh({DATA_AXIS: args.dp, MODEL_AXIS: args.tp})
        params = jax.device_put(params, llama.param_shardings(cfg, mesh))

    opt = optax.adamw(3e-4)
    opt_state = opt.init(params)
    step = jax.jit(lambda p, st, t: llama.train_step(
        p, t, cfg, mesh, remat=True, optimizer=opt, opt_state=st))

    batch = 2 * max(args.dp, 1)
    for i in range(args.steps):
        tokens = jax.random.randint(jax.random.key(i), (batch, args.seq),
                                    0, cfg.vocab_size)
        if mesh is not None:
            tokens = jax.device_put(
                tokens, NamedSharding(mesh, P(DATA_AXIS, None)))
        params, opt_state, loss = step(params, opt_state, tokens)
        print(f"step {i}: loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
