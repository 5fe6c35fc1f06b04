"""Pipeline parallelism (GPipe schedule) over a "pipe" mesh axis.

The reference has no distributed layer at all (SURVEY.md §2.8); this is
the TPU-native pipeline axis completing the parallelism matrix (DP, TP,
CP/SP, EP, PP). Idiomatic JAX shape — no microbatch scheduler thread, no
send/recv runtime: the whole schedule is ONE jitted `lax.scan` inside
`shard_map`, with `ppermute` rotating activations stage→stage+1 each tick
and XLA overlapping the collective with the next tick's compute.

Layout: the stacked layer params [L, ...] reshape to [S, L/S, ...] and
shard on axis 0 over "pipe" (each device holds its own contiguous layer
block; embed/final-norm/lm-head are replicated — they are O(vocab·d),
negligible next to L layers). The classic GPipe bubble applies: M
microbatches over S stages run M+S-1 ticks (efficiency M/(M+S-1)); the
backward just transposes the same scan (ppermute's transpose is the
reverse permutation, so jax.grad derives the reverse-flowing pipeline).

SPMD note: every stage executes the same tick program (embed + layers +
loss math) with `where`-gating on `lax.axis_index` picking which results
are real — the standard single-program pipeline formulation. The waste is
the replicated embed/loss arithmetic, which is O(s·d) vs the stage's
O(L/S·s·d²) layer work.

Uniform-architecture models only (no sliding patterns / MoE interleave:
those scan as periods, which would have to divide the stage boundary).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax>=0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

PIPE_AXIS = "pipe"


def _stage_apply(x, local_layers, cfg, positions):
    """Run this stage's layer block (lax.scan over the local stack)."""
    from mfa_tpu.models import llama

    b, s, _ = x.shape
    rope = (cfg.rope_theta, cfg.rope_scale, cfg.rope_scaling)

    def layer(x, lp):
        h = llama._rms_norm(x, lp["attn_norm"], cfg)
        q, k, v = llama._qkv(h, lp, cfg, b, s)
        q = llama._rope(q, positions, *rope)
        k = llama._rope(k, positions, *rope)
        # cfg.window_left carries uniform sliding windows (Mistral-style);
        # softcap/sinks/scale ride on cfg inside the helper.
        attn = llama._attention_sharded(q, k, v, None, cfg, cfg.window_left)
        x = llama._attn_residual(
            x, attn.reshape(b, s, cfg.n_heads * cfg.head_dim), lp, cfg)
        x = llama._mlp(x, lp, cfg)
        return x, ()

    x, _ = jax.lax.scan(layer, x, local_layers)
    return x


def pipeline_loss_fn(params, tokens, cfg, mesh: Mesh,
                     n_micro: Optional[int] = None):
    """Next-token cross entropy, pipelined over mesh axis "pipe".

    Numerically equal to llama.loss_fn (tested on the 8-device CPU mesh);
    jax.grad through it yields the reverse-flowing backward pipeline.
    """
    from mfa_tpu.models import llama

    n_stages = mesh.shape[PIPE_AXIS]
    if cfg.n_layers % n_stages != 0:
        raise ValueError(
            f"n_layers {cfg.n_layers} must divide into {n_stages} stages")
    if cfg.layer_pattern is not None or cfg.moe_hetero:
        raise ValueError("pipeline stages need a uniform layer stack")
    batch, seq = tokens.shape
    n_micro = n_micro or n_stages
    if batch % n_micro != 0:
        raise ValueError(f"batch {batch} must divide into {n_micro} "
                         "microbatches")
    per_stage = cfg.n_layers // n_stages
    stages = jax.tree.map(
        lambda a: a.reshape(n_stages, per_stage, *a.shape[1:]),
        params["layers"])
    shared = {k: v for k, v in params.items() if k != "layers"}
    micro = tokens.reshape(n_micro, batch // n_micro, seq)
    positions = jnp.arange(seq - 1, dtype=jnp.int32)[None]

    def run(stage_layers, shared, micro):
        p = jax.lax.axis_index(PIPE_AXIS)
        local = jax.tree.map(lambda a: a[0], stage_layers)
        mb, s = micro.shape[1], micro.shape[2]

        def tick(carry, t):
            x_in, loss_sum, tok_cnt = carry
            # stage 0 ingests microbatch t (inputs = all but last token);
            # later stages take the rotated activations
            emb = llama._embed(
                shared, micro[jnp.clip(t, 0, n_micro - 1)][:, :-1], cfg)
            x = jnp.where(p == 0, emb, x_in)
            y = _stage_apply(x, local, cfg, positions)
            # last stage finishes microbatch t-(S-1): norm+unembed+loss
            mb_out = t - (n_stages - 1)
            valid = jnp.logical_and(
                p == n_stages - 1,
                jnp.logical_and(mb_out >= 0, mb_out < n_micro))
            tgt = micro[jnp.clip(mb_out, 0, n_micro - 1)][:, 1:]
            h = llama._rms_norm(y, shared["final_norm"], cfg)
            logits = llama._unembed(shared, h, cfg)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)
            loss_sum = loss_sum + jnp.where(valid, nll.sum(), 0.0)
            tok_cnt = tok_cnt + jnp.where(valid, nll.size, 0)
            # rotate activations one stage forward on the ring
            x_next = jax.lax.ppermute(
                y, PIPE_AXIS,
                [(i, (i + 1) % n_stages) for i in range(n_stages)])
            return (x_next, loss_sum, tok_cnt), None

        x0 = jnp.zeros((mb, s - 1, cfg.dim), shared["embed"].dtype)
        (_, loss_sum, tok_cnt), _ = jax.lax.scan(
            tick, (x0, jnp.float32(0.0), 0),
            jnp.arange(n_micro + n_stages - 1))
        loss_sum = jax.lax.psum(loss_sum, PIPE_AXIS)
        tok_cnt = jax.lax.psum(tok_cnt, PIPE_AXIS)
        return loss_sum / tok_cnt

    fn = shard_map(
        run, mesh=mesh,
        in_specs=(P(PIPE_AXIS), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(stages, shared, micro)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "n_micro",
                                             "lr"))
def pipeline_train_step(params, tokens, cfg, mesh: Mesh,
                        n_micro: Optional[int] = None, lr: float = 1e-3):
    """One SGD step through the pipelined loss (forward AND backward run
    the GPipe schedule; grads for a stage's layers land on its own
    devices, grads for the replicated embed/head psum across stages via
    shard_map's transpose)."""
    loss, grads = jax.value_and_grad(pipeline_loss_fn)(
        params, tokens, cfg, mesh, n_micro)
    params = jax.tree.map(lambda p, g: p - lr * g.astype(p.dtype),
                          params, grads)
    return params, loss
