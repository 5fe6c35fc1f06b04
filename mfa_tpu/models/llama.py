"""Llama-style transformer built on mfa_tpu attention.

The reference is a kernel library with no model layer; the serving target
(BASELINE.json config 5: "Llama-3-8B-shaped decode serving") needs one.
Pure-JAX params pytree (no flax), three execution paths sharing weights:

- `forward`: full-sequence causal forward (training / prompt scoring) using
  the differentiable flash attention (mfa_tpu.kernels.autodiff).
- `train_step`: cross-entropy loss + grads + SGD update — the "full
  training step" jitted over a mesh by __graft_entry__.dryrun_multichip.
- `prefill_step` / `decode_step`: serving path against the paged KV cache
  (mfa_tpu.cache) using the paged decode kernel.

Sharding: GSPMD. `param_shardings(cfg, mesh)` gives NamedShardings (TP on
the "model" axis: attention heads and MLP hidden sharded; embeddings
replicated); activations are constrained with with_sharding_constraint and
XLA inserts the all-reduces after o-proj/MLP-down. The attention op runs
per-shard inside a shard_map so the Pallas kernel never sees a partitioned
axis it can't handle.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mfa_tpu.kernels.autodiff import flash_attention_grad
from mfa_tpu.shard.mesh import DATA_AXIS, MODEL_AXIS

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 8
    ffn_dim: int = 14336
    rope_theta: float = 500000.0
    norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @staticmethod
    def llama3_8b() -> "LlamaConfig":
        return LlamaConfig()

    @staticmethod
    def tiny(vocab=256, dim=128, layers=2, heads=4, kv_heads=2,
             ffn=256, dtype=jnp.float32) -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=vocab, dim=dim, n_layers=layers, n_heads=heads,
            n_kv_heads=kv_heads, ffn_dim=ffn, dtype=dtype,
        )


Params = Dict[str, Any]


def init_params(key: jax.Array, cfg: LlamaConfig) -> Params:
    d, hd = cfg.dim, cfg.head_dim

    def dense(key, shape, scale=None):
        scale = scale if scale is not None else (shape[0] ** -0.5)
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(cfg.dtype)

    keys = jax.random.split(key, cfg.n_layers + 2)
    layers = []
    for i in range(cfg.n_layers):
        ks = jax.random.split(keys[i], 7)
        layers.append(
            dict(
                wq=dense(ks[0], (d, cfg.n_heads * hd)),
                wk=dense(ks[1], (d, cfg.n_kv_heads * hd)),
                wv=dense(ks[2], (d, cfg.n_kv_heads * hd)),
                wo=dense(ks[3], (cfg.n_heads * hd, d)),
                w_gate=dense(ks[4], (d, cfg.ffn_dim)),
                w_up=dense(ks[5], (d, cfg.ffn_dim)),
                w_down=dense(ks[6], (cfg.ffn_dim, d)),
                attn_norm=jnp.ones((d,), jnp.float32),
                mlp_norm=jnp.ones((d,), jnp.float32),
            )
        )
    return dict(
        embed=dense(keys[-2], (cfg.vocab_size, d), scale=0.02),
        final_norm=jnp.ones((cfg.dim,), jnp.float32),
        lm_head=dense(keys[-1], (d, cfg.vocab_size)),
        layers=_stack_layers(layers),
    )


def _stack_layers(layers):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def param_shardings(cfg: LlamaConfig, mesh: Mesh) -> Params:
    """TP partition specs: head/ffn dims on MODEL_AXIS, rest replicated."""
    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    layer = dict(
        wq=ns(None, None, MODEL_AXIS),
        wk=ns(None, None, MODEL_AXIS),
        wv=ns(None, None, MODEL_AXIS),
        wo=ns(None, MODEL_AXIS, None),
        w_gate=ns(None, None, MODEL_AXIS),
        w_up=ns(None, None, MODEL_AXIS),
        w_down=ns(None, MODEL_AXIS, None),
        attn_norm=ns(None),
        mlp_norm=ns(None),
    )
    return dict(
        embed=ns(None, None),
        final_norm=ns(None),
        lm_head=ns(None, MODEL_AXIS),
        layers=layer,
    )


def _rms_norm(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * w).astype(x.dtype)


def _rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """Rotary embedding. x: [..., seq, heads, head_dim]; positions: [..., seq]."""
    hd = x.shape[-1]
    freqs = 1.0 / (theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    angles = positions[..., None].astype(jnp.float32) * freqs  # [..., seq, hd/2]
    cos = jnp.cos(angles)[..., None, :]  # broadcast over heads
    sin = jnp.sin(angles)[..., None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.astype(x.dtype)


def _attention_sharded(q, k, v, mesh: Optional[Mesh]):
    """Causal flash attention on [b, s, h, d]; heads sharded when a mesh with
    a 'model' axis is active (Pallas runs per shard; GQA stays co-located)."""
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    if mesh is not None and MODEL_AXIS in mesh.axis_names:
        spec = P(DATA_AXIS if DATA_AXIS in mesh.axis_names else None,
                 MODEL_AXIS, None, None)
        fn = shard_map(
            functools.partial(flash_attention_grad, causal=True),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False,
        )
        out = fn(qt, kt, vt)
    else:
        out = flash_attention_grad(qt, kt, vt, True)
    return jnp.swapaxes(out, 1, 2)


def forward(
    params: Params,
    tokens: jax.Array,  # [batch, seq] int32
    cfg: LlamaConfig,
    mesh: Optional[Mesh] = None,
) -> jax.Array:
    """Full-sequence causal forward -> logits [batch, seq, vocab]."""
    b, s = tokens.shape
    hd = cfg.head_dim
    x = params["embed"][tokens]  # [b, s, d]
    positions = jnp.arange(s, dtype=jnp.int32)[None].repeat(b, 0)

    def layer_fn(x, lp):
        h = _rms_norm(x, lp["attn_norm"], cfg.norm_eps)
        q = (h @ lp["wq"]).reshape(b, s, cfg.n_heads, hd)
        k = (h @ lp["wk"]).reshape(b, s, cfg.n_kv_heads, hd)
        v = (h @ lp["wv"]).reshape(b, s, cfg.n_kv_heads, hd)
        q = _rope(q, positions, cfg.rope_theta)
        k = _rope(k, positions, cfg.rope_theta)
        attn = _attention_sharded(q, k, v, mesh)
        x = x + attn.reshape(b, s, cfg.n_heads * hd) @ lp["wo"]
        h = _rms_norm(x, lp["mlp_norm"], cfg.norm_eps)
        x = x + (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"]
        return x, None

    x, _ = jax.lax.scan(layer_fn, x, params["layers"])
    x = _rms_norm(x, params["final_norm"], cfg.norm_eps)
    return (x @ params["lm_head"]).astype(jnp.float32)


def loss_fn(params, tokens, cfg, mesh=None):
    """Next-token cross entropy over tokens [b, s]."""
    logits = forward(params, tokens[:, :-1], cfg, mesh)
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return nll.mean()


def train_step(params, tokens, cfg, mesh=None, lr=1e-3):
    """One SGD step. This is the function dryrun_multichip jits over the
    full mesh (DP on batch, TP on heads/ffn via param shardings)."""
    loss, grads = jax.value_and_grad(loss_fn)(params, tokens, cfg, mesh)
    params = jax.tree.map(lambda p, g: p - lr * g.astype(p.dtype), params, grads)
    return params, loss


# ---------------- serving path (paged cache) ----------------


def build_kv_caches(cfg: LlamaConfig, num_pages: int, page_size: int,
                    max_seqs: int, pages_per_seq: int,
                    quant_dtype: Optional[str] = None):
    """One PagedKVCache per layer (stacked pytree list)."""
    from mfa_tpu.cache.paged_cache import create_cache

    return [
        create_cache(
            num_pages=num_pages, page_size=page_size,
            num_kv_heads=cfg.n_kv_heads, head_dim=cfg.head_dim,
            max_seqs=max_seqs, pages_per_seq=pages_per_seq,
            dtype=cfg.dtype, quant_dtype=quant_dtype,
        )
        for _ in range(cfg.n_layers)
    ]


def _layer_params(params: Params, i: int):
    return jax.tree.map(lambda x: x[i], params["layers"])


def prefill_step(params, cfg, caches, seq_slot: int, pages, tokens_1d):
    """Run a prompt through the model, writing K/V into the paged caches.

    Returns (caches, last_logits [vocab]). Host-side loop over layers
    (n_layers jitted ops); fine for prompt ingestion.
    """
    from mfa_tpu.cache.paged_cache import write_prompt

    s = tokens_1d.shape[0]
    x = params["embed"][tokens_1d][None]  # [1, s, d]
    positions = jnp.arange(s, dtype=jnp.int32)[None]
    hd = cfg.head_dim
    new_caches = []
    for i in range(cfg.n_layers):
        lp = _layer_params(params, i)
        h = _rms_norm(x, lp["attn_norm"], cfg.norm_eps)
        q = (h @ lp["wq"]).reshape(1, s, cfg.n_heads, hd)
        k = (h @ lp["wk"]).reshape(1, s, cfg.n_kv_heads, hd)
        v = (h @ lp["wv"]).reshape(1, s, cfg.n_kv_heads, hd)
        q = _rope(q, positions, cfg.rope_theta)
        k = _rope(k, positions, cfg.rope_theta)
        cache = write_prompt(caches[i], seq_slot, pages, k[0], v[0])
        new_caches.append(cache)
        attn = _attention_sharded(q, k, v, None)
        x = x + attn.reshape(1, s, cfg.n_heads * hd) @ lp["wo"]
        hm = _rms_norm(x, lp["mlp_norm"], cfg.norm_eps)
        x = x + (jax.nn.silu(hm @ lp["w_gate"]) * (hm @ lp["w_up"])) @ lp["w_down"]
    x = _rms_norm(x, params["final_norm"], cfg.norm_eps)
    logits = (x[0, -1] @ params["lm_head"]).astype(jnp.float32)
    return new_caches, logits


@functools.partial(jax.jit, static_argnames=("cfg",))
def decode_step(params, cfg: LlamaConfig, caches, seq_slots, tokens):
    """One decode step for the active batch.

    seq_slots: [n] int32 cache rows; tokens: [n] int32 current tokens.
    Returns (caches, logits [n, vocab]). Appends this step's K/V into the
    caches and attends with the paged kernel.
    """
    from mfa_tpu.cache.paged_cache import append_token
    from mfa_tpu.kernels.paged import paged_attention

    n = tokens.shape[0]
    hd = cfg.head_dim
    x = params["embed"][tokens][:, None]  # [n, 1, d]
    positions = caches[0].lengths[seq_slots][:, None]  # [n, 1]

    new_caches = []
    for i in range(cfg.n_layers):
        lp = _layer_params(params, i)
        h = _rms_norm(x, lp["attn_norm"], cfg.norm_eps)
        q = (h @ lp["wq"]).reshape(n, 1, cfg.n_heads, hd)
        k = (h @ lp["wk"]).reshape(n, 1, cfg.n_kv_heads, hd)
        v = (h @ lp["wv"]).reshape(n, 1, cfg.n_kv_heads, hd)
        q = _rope(q, positions, cfg.rope_theta)
        k = _rope(k, positions, cfg.rope_theta)
        cache = append_token(caches[i], seq_slots, k[:, 0], v[:, 0])
        new_caches.append(cache)
        attn = paged_attention(
            q[:, 0].astype(cfg.dtype),
            cache.k_pages, cache.v_pages,
            cache.lengths[seq_slots], cache.block_tables[seq_slots],
            k_scales=cache.k_scales, v_scales=cache.v_scales,
        )  # [n, heads, hd]
        x = x + (attn.reshape(n, 1, cfg.n_heads * hd)).astype(x.dtype) @ lp["wo"]
        hm = _rms_norm(x, lp["mlp_norm"], cfg.norm_eps)
        x = x + (jax.nn.silu(hm @ lp["w_gate"]) * (hm @ lp["w_up"])) @ lp["w_down"]
    x = _rms_norm(x, params["final_norm"], cfg.norm_eps)
    logits = (x[:, 0] @ params["lm_head"]).astype(jnp.float32)
    return new_caches, logits
