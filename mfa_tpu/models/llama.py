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
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mfa_tpu.kernels.autodiff import flash_attention_grad
from mfa_tpu.models.wquant import (QWeight, dequantize_weight, qmm, qtake,
                                   ragged_qmm)
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
    # Mistral-style sliding-window attention: each token attends to at most
    # the previous `sliding_window` tokens (None = full causal).
    sliding_window: Optional[int] = None
    # Family knobs (the reference has no model layer at all; these widen
    # the families the serving engine covers without forking the code):
    head_dim_override: Optional[int] = None  # Gemma: head_dim != dim/heads
    qkv_bias: bool = False                   # Qwen2: bias on q/k/v proj
    hidden_act: str = "silu"                 # "silu" | "gelu_tanh" (Gemma)
    norm_offset: bool = False                # Gemma RMSNorm: x * (1 + w)
    embed_scale: bool = False                # Gemma: embeddings * sqrt(dim)
    logit_softcap: Optional[float] = None    # Gemma2: tanh cap on logits
    # Gemma2 family knobs:
    attn_softcap: Optional[float] = None     # tanh cap on attention logits
    query_scale: Optional[float] = None      # softmax scale override
    post_norms: bool = False                 # extra norms on attn/mlp OUTPUT
    alt_window: bool = False                 # even layers sliding, odd global
    # StreamingLLM attention sinks: with a sliding window, the first
    # attn_sinks tokens stay visible to every query (serving feature)
    attn_sinks: int = 0
    qk_norm: bool = False                    # Qwen3/Gemma3: RMSNorm per q/k head
    # Generalized layer alternation (Gemma3: 5 sliding + 1 global per 6):
    # a repeating period of booleans, True = sliding-window sub-layer.
    # alt_window=True is the legacy (True, False) pair.
    layer_pattern: Optional[tuple] = None
    # RoPE theta for SLIDING sub-layers when it differs from rope_theta
    # (Gemma3: 10k local vs 1M global)
    rope_theta_local: Optional[float] = None
    # linear RoPE position scaling (positions divided by this factor).
    # With a DUAL rope config (rope_theta_local set) it applies to the
    # GLOBAL sub-layers only (Gemma3 scales the 1M-theta layers by 8);
    # single-rope-config models scale every layer (see _sub_rope).
    rope_scale: float = 1.0
    # Non-linear RoPE frequency rescaling, as a hashable tuple (static at
    # trace time; the inv_freq rescale is pure numpy in _rope):
    #   ("llama3", factor, low_freq_factor, high_freq_factor, orig_ctx)
    #     — Llama-3.1+ low/high-frequency band interpolation
    #   ("yarn", factor, attention_factor, beta_fast, beta_slow, orig_ctx)
    #     — YaRN NTK-by-parts (Qwen long-context); attention_factor
    #       multiplies cos/sin (the mscale)
    # With a dual rope config, applies to GLOBAL sub-layers only (like
    # rope_scale).
    rope_scaling: Optional[tuple] = None
    # Mixture-of-experts MLP (Mixtral): n_experts > 0 replaces the dense
    # MLP with a top-k routed expert bank (token-dropless grouped matmuls
    # via lax.ragged_dot)
    n_experts: int = 0
    n_active_experts: int = 2
    # expert MLP width when it differs from ffn_dim (Qwen3-MoE); and
    # whether top-k routing weights renormalize over the selected experts
    # (Mixtral: yes; Qwen3-MoE default: no — full-softmax weights)
    moe_ffn_dim: Optional[int] = None
    norm_topk: bool = True
    # Qwen2-MoE/DeepSeek shared expert: a dense SwiGLU MLP of this width
    # runs on EVERY token alongside the routed experts; with
    # shared_expert_gate its output is scaled by sigmoid(h @ w_sg)
    # (Qwen2-MoE convention).
    shared_expert_dim: Optional[int] = None
    shared_expert_gate: bool = False
    # Heterogeneous MoE/dense layer interleave (Qwen-MoE
    # decoder_sparse_step / mlp_only_layers): per-layer booleans, True =
    # routed-expert layer, False = dense MLP layer. None = uniform
    # (n_experts decides). When both kinds appear, params["layers"] is
    # {"moe": <stacked sparse layers>, "dense": <stacked dense layers>}
    # and the layer loop unrolls (see _scan_layers).
    moe_layer_pattern: Optional[tuple] = None

    @property
    def head_dim(self) -> int:
        return self.head_dim_override or self.dim // self.n_heads

    @property
    def attn_scale(self) -> float:
        """Softmax scale (Gemma2 overrides via query_pre_attn_scalar)."""
        return (self.query_scale if self.query_scale is not None
                else self.head_dim ** -0.5)

    @property
    def window_left(self) -> int:
        return -1 if self.sliding_window is None else self.sliding_window - 1

    @property
    def moe_hetero(self) -> bool:
        """True when MoE and dense MLP layers interleave."""
        p = self.moe_layer_pattern
        return p is not None and (True in p) and (False in p)

    @property
    def sliding_pattern(self) -> Optional[tuple]:
        """Repeating per-layer sliding flags, or None (uniform layers)."""
        if self.layer_pattern is not None:
            return tuple(self.layer_pattern)
        if self.alt_window:
            return (True, False)
        return None

    @staticmethod
    def llama3_8b() -> "LlamaConfig":
        return LlamaConfig()

    @staticmethod
    def mistral_7b() -> "LlamaConfig":
        """Mistral-7B shape: 32 q / 8 kv heads, 4096-token sliding window
        (the reference carries window params unexposed, _C.pyi:4-41; here
        they drive a whole model family)."""
        return LlamaConfig(
            vocab_size=32000, dim=4096, n_layers=32, n_heads=32,
            n_kv_heads=8, ffn_dim=14336, rope_theta=10000.0,
            sliding_window=4096,
        )

    @staticmethod
    def qwen2_7b() -> "LlamaConfig":
        """Qwen2-7B shape: the family's distinguishing feature is bias on
        the q/k/v projections."""
        return LlamaConfig(
            vocab_size=152064, dim=3584, n_layers=28, n_heads=28,
            n_kv_heads=4, ffn_dim=18944, rope_theta=1000000.0,
            norm_eps=1e-6, qkv_bias=True,
        )

    @staticmethod
    def gemma_7b() -> "LlamaConfig":
        """Gemma-7B shape: head_dim 256 (not dim/heads), gelu-tanh MLP,
        (1+w) RMSNorm, sqrt(dim)-scaled embeddings, tied lm_head."""
        return LlamaConfig(
            vocab_size=256000, dim=3072, n_layers=28, n_heads=16,
            n_kv_heads=16, ffn_dim=24576, rope_theta=10000.0,
            norm_eps=1e-6, head_dim_override=256, hidden_act="gelu_tanh",
            norm_offset=True, embed_scale=True,
        )

    @staticmethod
    def mixtral_8x7b() -> "LlamaConfig":
        """Mixtral-8x7B shape: 8 experts, top-2 routing, Mistral-style
        attention (the sliding window is disabled in practice)."""
        return LlamaConfig(
            vocab_size=32000, dim=4096, n_layers=32, n_heads=32,
            n_kv_heads=8, ffn_dim=14336, rope_theta=1000000.0,
            n_experts=8, n_active_experts=2,
        )

    @staticmethod
    def qwen3_8b() -> "LlamaConfig":
        """Qwen3-8B shape: per-head q/k RMSNorm (no qkv bias), head_dim
        128 with dim 4096 / 32 heads."""
        return LlamaConfig(
            vocab_size=151936, dim=4096, n_layers=36, n_heads=32,
            n_kv_heads=8, ffn_dim=12288, rope_theta=1000000.0,
            norm_eps=1e-6, head_dim_override=128, qk_norm=True,
        )

    @staticmethod
    def gemma2_9b() -> "LlamaConfig":
        """Gemma2-9B shape: alternating sliding/global layers, post-norms
        on attention and MLP outputs, attention + final logit softcaps,
        query_pre_attn_scalar softmax scale."""
        return LlamaConfig(
            vocab_size=256000, dim=3584, n_layers=42, n_heads=16,
            n_kv_heads=8, ffn_dim=14336, rope_theta=10000.0,
            norm_eps=1e-6, head_dim_override=256, hidden_act="gelu_tanh",
            norm_offset=True, embed_scale=True, sliding_window=4096,
            attn_softcap=50.0, logit_softcap=30.0,
            query_scale=256.0 ** -0.5, post_norms=True, alt_window=True,
        )

    @staticmethod
    def tiny(vocab=256, dim=128, layers=2, heads=4, kv_heads=2,
             ffn=256, dtype=jnp.float32, **kw) -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=vocab, dim=dim, n_layers=layers, n_heads=heads,
            n_kv_heads=kv_heads, ffn_dim=ffn, dtype=dtype, **kw,
        )


Params = Dict[str, Any]


def init_params(key: jax.Array, cfg: LlamaConfig,
                quantize: Optional[str] = None) -> Params:
    """quantize="int8": emit wquant.QWeight projections, quantizing each
    LAYER as it is built — peak device memory stays int8-tree + one bf16
    layer, which is what lets an 8B-shaped model initialize on a 16 GB
    chip (quantizing after a full bf16 init would need ~16 GB first)."""
    from mfa_tpu.models.wquant import quantize_params as _qp

    if quantize not in (None, "int8"):
        raise ValueError(f"unsupported weight quantization {quantize!r}")
    d, hd = cfg.dim, cfg.head_dim

    def dense(key, shape, scale=None):
        scale = scale if scale is not None else (shape[-2] ** -0.5)
        # generate DIRECTLY in the model dtype: an f32 intermediate for a
        # 128k-vocab embed is a 2.1 GB transient, and the 8B-shaped int8
        # init runs within ~1-2 GB of the (shared) chip's free memory
        return jax.random.normal(key, shape, cfg.dtype) * jnp.asarray(
            scale, cfg.dtype)

    keys = jax.random.split(key, cfg.n_layers + 2)
    layers = []
    mpat = cfg.moe_layer_pattern
    for i in range(cfg.n_layers):
        ks = jax.random.split(keys[i], 7)
        # offset-norm models (Gemma) store w with (1+w) applied at runtime,
        # so the identity init is zeros there, ones otherwise
        norm_init = jnp.zeros if cfg.norm_offset else jnp.ones
        lp = dict(
            wq=dense(ks[0], (d, cfg.n_heads * hd)),
            wk=dense(ks[1], (d, cfg.n_kv_heads * hd)),
            wv=dense(ks[2], (d, cfg.n_kv_heads * hd)),
            wo=dense(ks[3], (cfg.n_heads * hd, d)),
            attn_norm=norm_init((d,), jnp.float32),
            mlp_norm=norm_init((d,), jnp.float32),
        )
        is_moe = bool(cfg.n_experts) if mpat is None else bool(mpat[i])
        if is_moe:
            ke = jax.random.split(ks[4], 8)
            E = cfg.n_experts
            fe = cfg.moe_ffn_dim or cfg.ffn_dim
            lp.update(
                w_router=(jax.random.normal(ke[0], (d, E), jnp.float32)
                          * d ** -0.5),
                we_gate=dense(ke[1], (E, d, fe)),
                we_up=dense(ke[2], (E, d, fe)),
                we_down=dense(ke[3], (E, fe, d)),
            )
            if cfg.shared_expert_dim:
                fs = cfg.shared_expert_dim
                lp.update(
                    ws_gate=dense(ke[4], (d, fs)),
                    ws_up=dense(ke[5], (d, fs)),
                    ws_down=dense(ke[6], (fs, d)),
                )
                if cfg.shared_expert_gate:
                    lp.update(w_shared_gate=dense(ke[7], (d, 1)))
        else:
            lp.update(
                w_gate=dense(ks[4], (d, cfg.ffn_dim)),
                w_up=dense(ks[5], (d, cfg.ffn_dim)),
                w_down=dense(ks[6], (cfg.ffn_dim, d)),
            )
        if cfg.post_norms:
            lp.update(post_attn_norm=norm_init((d,), jnp.float32),
                      post_mlp_norm=norm_init((d,), jnp.float32))
        if cfg.qkv_bias:
            lp.update(
                bq=jnp.zeros((cfg.n_heads * hd,), cfg.dtype),
                bk=jnp.zeros((cfg.n_kv_heads * hd,), cfg.dtype),
                bv=jnp.zeros((cfg.n_kv_heads * hd,), cfg.dtype),
            )
        if cfg.qk_norm:
            lp.update(q_norm=norm_init((hd,), jnp.float32),
                      k_norm=norm_init((hd,), jnp.float32))
        if quantize:
            lp = _qp(lp, include_experts=True)
            # THROTTLE: drain the device queue before building the next
            # layer. Dispatch is async — without this the host races
            # ahead and every in-flight layer keeps its full bf16
            # intermediates alive next to the growing int8 tree, which
            # tips the 8B-shaped init over 16 GB NON-deterministically
            # (the same init passes or dies by scheduling luck). A
            # scalar READBACK, not block_until_ready: through the axon
            # tunnel block_until_ready returns before the device work
            # completes (CLAUDE.md), so only a device->host value read
            # actually serializes. ~30 ms/layer of init latency.
            int(lp["wq"].qw[0, 0])
        layers.append(lp)
    norm_init = jnp.zeros if cfg.norm_offset else jnp.ones
    if cfg.moe_hetero:
        stacked = dict(
            moe=_stack_layers([l for l, f in zip(layers, mpat) if f]),
            dense=_stack_layers([l for l, f in zip(layers, mpat) if not f]),
        )
    else:
        stacked = _stack_layers(layers)
    if quantize:
        # The two vocab-sized tables generate AND quantize in row/column
        # slices: one eager bf16 normal for a 128k-vocab table holds
        # ~5 GB of RNG transients, and with async dispatch embed and
        # lm_head are in flight together — the 8B init then passes or
        # dies by scheduling luck next to the ~7 GB layer tree. Slices
        # cap the in-flight footprint; the scalar readback per slice
        # actually serializes (block_until_ready is a no-op through the
        # tunnel).
        from mfa_tpu.models.wquant import QWeight, quantize_weight

        def dense_q(key, shape, scale, axis):
            split = 0 if axis == -1 else 1
            n = shape[split]
            step = max(1, (16 * 1024 * 1024) // max(1, shape[1 - split]))
            qs, ss = [], []
            for idx, lo in enumerate(range(0, n, step)):
                m = min(step, n - lo)
                pshape = (m, shape[1]) if split == 0 else (shape[0], m)
                piece = jax.random.normal(
                    jax.random.fold_in(key, idx), pshape, cfg.dtype
                ) * jnp.asarray(scale, cfg.dtype)
                qw = quantize_weight(piece, axis=axis)
                int(qw.qw[0, 0])  # drain the queue (free the slice)
                qs.append(qw.qw)
                ss.append(qw.scale)
            return QWeight(qw=jnp.concatenate(qs, axis=split),
                           scale=jnp.concatenate(ss, axis=0), axis=axis)

        head = dict(
            embed=dense_q(keys[-2], (cfg.vocab_size, d), 0.02, axis=-1),
            final_norm=norm_init((cfg.dim,), jnp.float32),
            lm_head=dense_q(keys[-1], (d, cfg.vocab_size),
                            d ** -0.5, axis=-2),
        )
    else:
        head = dict(
            embed=dense(keys[-2], (cfg.vocab_size, d), scale=0.02),
            final_norm=norm_init((cfg.dim,), jnp.float32),
            lm_head=dense(keys[-1], (d, cfg.vocab_size)),
        )
    return dict(layers=stacked, **head)


def _stack_layers(layers):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def param_shardings(cfg: LlamaConfig, mesh: Mesh) -> Params:
    """TP partition specs: head/ffn dims on MODEL_AXIS, rest replicated.
    With an 'expert' mesh axis, the MoE expert banks shard on it
    (composable with MODEL_AXIS on the expert ffn dim — EP x TP; see
    mfa_tpu/shard/expert.py)."""
    from mfa_tpu.shard.mesh import EXPERT_AXIS

    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    ep = EXPERT_AXIS if EXPERT_AXIS in mesh.axis_names else None
    tp = MODEL_AXIS if MODEL_AXIS in mesh.axis_names else None

    layer = dict(
        wq=ns(None, None, tp),
        wk=ns(None, None, tp),
        wv=ns(None, None, tp),
        wo=ns(None, tp, None),
        w_gate=ns(None, None, tp),
        w_up=ns(None, None, tp),
        w_down=ns(None, tp, None),
        attn_norm=ns(None),
        mlp_norm=ns(None),
    )
    if cfg.qkv_bias:
        layer.update(bq=ns(None, tp), bk=ns(None, tp), bv=ns(None, tp))
    if cfg.post_norms:
        layer.update(post_attn_norm=ns(None), post_mlp_norm=ns(None))
    if cfg.qk_norm:
        layer.update(q_norm=ns(None), k_norm=ns(None))
    moe_layer = None
    if cfg.n_experts:
        moe_layer = dict(layer)
        for k_ in ("w_gate", "w_up", "w_down"):
            moe_layer.pop(k_, None)
        moe_layer.update(
            w_router=ns(None, None, None),
            we_gate=ns(None, ep, None, tp),
            we_up=ns(None, ep, None, tp),
            we_down=ns(None, ep, tp, None),
        )
        if cfg.shared_expert_dim:
            moe_layer.update(
                ws_gate=ns(None, None, tp),
                ws_up=ns(None, None, tp),
                ws_down=ns(None, tp, None),
            )
            if cfg.shared_expert_gate:
                moe_layer.update(w_shared_gate=ns(None, None, None))
    if cfg.moe_hetero:
        layer = dict(moe=moe_layer, dense=layer)
    elif cfg.n_experts:
        layer = moe_layer
    return dict(
        embed=ns(None, None),
        final_norm=ns(None),
        lm_head=ns(None, tp),
        layers=layer,
    )


def _rms_norm(x, w, cfg: "LlamaConfig"):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    if cfg.norm_offset:  # Gemma convention: weight stored as w, applied 1+w
        w = 1.0 + w
    return (xf * jax.lax.rsqrt(var + cfg.norm_eps) * w).astype(x.dtype)


def _qkv(h, lp, cfg: "LlamaConfig", *lead):
    """Shared q/k/v projection (+ optional Qwen2-style bias, optional
    Qwen3-style per-head q/k RMSNorm) for every execution path. lead:
    leading output dims (e.g. batch, seq)."""
    q = qmm(h, lp["wq"])
    k = qmm(h, lp["wk"])
    v = qmm(h, lp["wv"])
    if cfg.qkv_bias:
        q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
    hd = cfg.head_dim
    q = q.reshape(*lead, cfg.n_heads, hd)
    k = k.reshape(*lead, cfg.n_kv_heads, hd)
    v = v.reshape(*lead, cfg.n_kv_heads, hd)
    if cfg.qk_norm:  # Qwen3: normalize each head before RoPE
        q = _rms_norm(q, lp["q_norm"], cfg)
        k = _rms_norm(k, lp["k_norm"], cfg)
    return q, k, v


def _moe_route(t, w_router, k: int, norm_topk: bool):
    """fp32 router + top-k expert weights — the SINGLE definition of this
    framework's routing convention, shared by the dense path below and the
    expert-parallel path (shard/expert.py). Returns (w_top [T, k],
    idx [T, k] global expert ids).

    norm_topk=True: softmax over the selected experts (Mixtral);
    False: full-softmax weights, not renormalized (Qwen3-MoE default)."""
    logits = t.astype(jnp.float32) @ w_router  # [T, E]
    w_top, idx = jax.lax.top_k(logits, k)
    if norm_topk:
        w_top = jax.nn.softmax(w_top, axis=-1)
    else:
        full = jax.nn.softmax(logits, axis=-1)
        w_top = jnp.take_along_axis(full, idx, axis=-1)
    return w_top, idx


# Dense-per-expert int8 MoE cutover: below this many rows the E*T extra
# row-flops cost less than one bank stream (T < peak_flops/(2*HBM_BW)
# ~ 120 on v5e; 64 keeps margin and buckets cleanly).
_MOE_DENSE_MAX_T = 64


def _moe_dense_int8(t, lp, w_top, idx, cfg: "LlamaConfig"):
    """Decode-path MoE: DENSE per-expert int8 matmuls + router-weighted
    combine. lax.ragged_dot needs matching operand dtypes, so the
    quantized ragged path materializes a bf16 bank EVERY step (measured
    10.9 ms at the Mixtral 8x4096x14336 decode shape — worse than plain
    bf16 banks at 4.3 ms). Running every expert densely over all T rows
    keeps XLA's int8->bf16 convert fused into the dot's operand stream
    (HBM reads stay int8, the bank is read once) and costs E*T extra
    row-flops — noise for T <= _MOE_DENSE_MAX_T on a 197 TFLOP/s MXU.
    Measured 1.87 ms = 92% of the 1.72 ms int8 stream floor, 5.8x the
    dequantize-at-entry path (scripts/probe_moe_int8.py). The per-output-
    channel scale applies to the small [E, T, out] result, which is exact
    (it commutes with the contraction) and slightly MORE accurate than
    pre-dequantizing the bank to bf16."""
    T, E = t.shape[0], cfg.n_experts
    qg, qu, qd = lp["we_gate"], lp["we_up"], lp["we_down"]
    g = jnp.einsum("td,edf->etf", t, qg.qw.astype(t.dtype))
    g = _act(g * qg.scale[:, None, :].astype(t.dtype), cfg.hidden_act)
    u = jnp.einsum("td,edf->etf", t, qu.qw.astype(t.dtype))
    u = u * qu.scale[:, None, :].astype(t.dtype)
    o = jnp.einsum("etf,efd->etd", g * u, qd.qw.astype(t.dtype))
    o = o * qd.scale[:, None, :].astype(t.dtype)
    # router weights as a [T, E] scatter (top-k ids are distinct per row)
    mw = jnp.zeros((T, E), jnp.float32).at[
        jnp.arange(T, dtype=jnp.int32)[:, None], idx].set(w_top)
    return jnp.einsum("etd,te->td", o, mw.astype(o.dtype))


def _act(x, hidden_act: str):
    """The family activation on the gate projection (gelu_tanh: Gemma)."""
    if hidden_act == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.silu(x)


def _moe(x, lp, cfg: "LlamaConfig", mesh: Optional[Mesh] = None):
    """Mixtral-style top-k routed expert MLP, token-dropless.

    TPU-idiomatic: token-expert pairs are sorted by expert and pushed
    through ONE grouped matmul per projection (lax.ragged_dot -> MXU),
    instead of a per-expert python loop or dense all-expert compute.
    Router runs in fp32; top-k weights renormalize over the selected
    experts (Mixtral convention). With a mesh carrying an 'expert' axis,
    the routed part runs expert-parallel (mfa_tpu/shard/expert.py)."""
    from mfa_tpu.shard.expert import expert_parallel_moe, use_expert_parallel

    h = _rms_norm(x, lp["mlp_norm"], cfg)
    lead = h.shape[:-1]
    t = h.reshape(-1, h.shape[-1])  # [T, d]
    T = t.shape[0]
    if use_expert_parallel(mesh):
        # the EP shard_map path contracts per-shard with plain ragged_dot;
        # a quantized expert bank dequantizes at entry (capacity-only win,
        # same as ragged_qmm below)
        banks = [dequantize_weight(lp[n], t.dtype)
                 if isinstance(lp[n], QWeight) else lp[n]
                 for n in ("we_gate", "we_up", "we_down")]
        out = expert_parallel_moe(mesh, cfg)(t, lp["w_router"], *banks)
    elif isinstance(lp["we_gate"], QWeight) and T <= _MOE_DENSE_MAX_T:
        k = cfg.n_active_experts
        w_top, idx = _moe_route(t, lp["w_router"], k, cfg.norm_topk)
        out = _moe_dense_int8(t, lp, w_top, idx, cfg)
    else:
        k = cfg.n_active_experts
        w_top, idx = _moe_route(t, lp["w_router"], k, cfg.norm_topk)
        flat_e = idx.reshape(-1)  # [T*k]
        order = jnp.argsort(flat_e)  # stable: ties keep token order
        tok_of = (jnp.arange(T * k, dtype=jnp.int32) // k)[order]
        gathered = t[tok_of]  # [T*k, d] expert-sorted
        gs = jnp.zeros((cfg.n_experts,), jnp.int32).at[flat_e].add(1)
        gate = _act(ragged_qmm(gathered, lp["we_gate"], gs),
                    cfg.hidden_act)
        up = ragged_qmm(gathered, lp["we_up"], gs)
        down = ragged_qmm(gate * up, lp["we_down"], gs)  # [T*k, d]
        wflat = w_top.reshape(-1)[order].astype(down.dtype)
        out = jnp.zeros((T, t.shape[-1]), down.dtype).at[tok_of].add(
            down * wflat[:, None])
    if "ws_gate" in lp:
        # Qwen2-MoE/DeepSeek shared expert: dense SwiGLU on every token,
        # optionally scaled by a sigmoid gate on the (normed) hidden state
        sg = _act(qmm(t, lp["ws_gate"]), cfg.hidden_act)
        sh = qmm(sg * qmm(t, lp["ws_up"]), lp["ws_down"])
        if "w_shared_gate" in lp:
            sh = sh * jax.nn.sigmoid(
                t.astype(jnp.float32) @ lp["w_shared_gate"].astype(
                    jnp.float32)).astype(sh.dtype)
        out = out + sh.astype(out.dtype)
    out = out.reshape(*lead, -1)
    if cfg.post_norms:
        out = _rms_norm(out, lp["post_mlp_norm"], cfg)
    return x + out.astype(x.dtype)


def _mlp(x, lp, cfg: "LlamaConfig", mesh: Optional[Mesh] = None):
    if cfg.n_experts and "we_gate" in lp:
        return _moe(x, lp, cfg, mesh)
    h = _rms_norm(x, lp["mlp_norm"], cfg)
    gate = _act(qmm(h, lp["w_gate"]), cfg.hidden_act)
    out = qmm(gate * qmm(h, lp["w_up"]), lp["w_down"])
    if cfg.post_norms:  # Gemma2 post_feedforward_layernorm
        out = _rms_norm(out, lp["post_mlp_norm"], cfg)
    return x + out


def _attn_residual(x, attn_flat, lp, cfg: "LlamaConfig"):
    """o-projection + optional Gemma2 post_attention_layernorm + residual.
    attn_flat: [..., n_heads*head_dim]."""
    out = qmm(attn_flat.astype(x.dtype), lp["wo"])
    if cfg.post_norms:
        out = _rms_norm(out, lp["post_attn_norm"], cfg)
    return x + out


def _sub_rope(cfg: "LlamaConfig", sliding: bool):
    """(theta, linear position scale, freq rescaling) for a sub-layer of
    the pattern. With a DUAL rope config (rope_theta_local set — Gemma3:
    local 10k / global 1M), sliding sub-layers are local attention on the
    local theta with UNSCALED positions; long-context rescaling
    (linear/llama3/yarn) applies to the global sub-layers only — matching
    transformers' Gemma3, which builds the local rotary without
    rope_scaling. A patterned model with a SINGLE rope config (no local
    theta, e.g. Gemma2) has one rotary shared by every layer, so scaling
    applies to sliding sub-layers too."""
    if sliding and cfg.rope_theta_local is not None:
        return (cfg.rope_theta_local, 1.0, None)
    return (cfg.rope_theta, cfg.rope_scale, cfg.rope_scaling)


def _scan_layers(cfg: "LlamaConfig", body, x, layers, cache_xs,
                 remat: bool = False):
    """Scan `body(x, lp, cache_leaves, window_left, rope_theta) ->
    (x, new_leaves)` over the stacked layer axis. With a sliding pattern
    (Gemma2 pairs, Gemma3 5-local+1-global periods), layers scan as
    PERIODS — every static window/theta variant lives in one compiled
    scan body (a per-layer dynamic window is impossible: the window
    shapes the kernel grid)."""
    pattern = cfg.sliding_pattern
    if cfg.moe_hetero:
        # Heterogeneous MoE/dense interleave (Qwen-MoE decoder_sparse_step
        # / mlp_only_layers): the two layer kinds have different param
        # trees, so they live in separate stacks ({"moe", "dense"}) and
        # the layer loop unrolls at trace time (these configs are rare and
        # shallow; uniform models keep the compiled scan below).
        mpat = cfg.moe_layer_pattern
        news = []
        moe_i = dense_i = 0
        for li in range(cfg.n_layers):
            if mpat[li]:
                grp, pos = layers["moe"], moe_i
                moe_i += 1
            else:
                grp, pos = layers["dense"], dense_i
                dense_i += 1
            lp = jax.tree.map(lambda a, p=pos: a[p], grp)
            leaves = tuple(jax.tree.map(lambda a, i=li: a[i], l)
                           for l in cache_xs)
            if pattern is None:
                wl = cfg.window_left
                rope = (cfg.rope_theta, cfg.rope_scale, cfg.rope_scaling)
            else:
                sliding = bool(pattern[li % len(pattern)])
                wl = cfg.window_left if sliding else -1
                rope = _sub_rope(cfg, sliding)
            step = jax.checkpoint(body) if remat else body
            x, new = step(x, lp, leaves, wl, rope)
            news.append(new)
        return x, jax.tree.map(lambda *a: jnp.stack(a), *news)
    if pattern is None:
        def fn(x, xs):
            lp, *leaves = xs
            x, new = body(x, lp, tuple(leaves), cfg.window_left,
                          (cfg.rope_theta, cfg.rope_scale,
                           cfg.rope_scaling))
            return x, new
        fn = jax.checkpoint(fn) if remat else fn
        return jax.lax.scan(fn, x, (layers,) + cache_xs)
    period = len(pattern)
    assert cfg.n_layers % period == 0, (
        f"layer pattern period {period} must divide n_layers")

    def group(t):
        return jax.tree.map(
            lambda a: a.reshape(a.shape[0] // period, period,
                                *a.shape[1:]), t)

    def ungroup(t):
        return jax.tree.map(
            lambda a: a.reshape(a.shape[0] * period, *a.shape[2:]), t)

    def fn(x, xs):
        lpg, *leavesg = xs
        news = []
        for sub in range(period):
            lp = jax.tree.map(lambda a: a[sub], lpg)
            leaves = tuple(jax.tree.map(lambda a: a[sub], l)
                           for l in leavesg)
            wl = cfg.window_left if pattern[sub] else -1
            x, new = body(x, lp, leaves, wl,
                          _sub_rope(cfg, pattern[sub]))
            news.append(new)
        stacked = jax.tree.map(lambda *a: jnp.stack(a), *news)
        return x, stacked

    fn = jax.checkpoint(fn) if remat else fn
    x, ys = jax.lax.scan(fn, x, (group(layers),) + tuple(
        jax.tree.map(group, l) for l in cache_xs))
    return x, ungroup(ys)


def _embed(params, tokens, cfg: "LlamaConfig"):
    x = qtake(params["embed"], tokens)
    if cfg.embed_scale:  # Gemma: scale in the activation dtype (HF rounds
        x = x * jnp.asarray(cfg.dim ** 0.5, x.dtype)  # sqrt(dim) to dtype)
    return x


def _unembed(params, x, cfg: "LlamaConfig"):
    logits = qmm(x, params["lm_head"]).astype(jnp.float32)
    if cfg.logit_softcap:
        cap = float(cfg.logit_softcap)
        logits = jnp.tanh(logits / cap) * cap
    return logits


def _scaled_inv_freq(scaling: tuple, inv_freq: "np.ndarray", hd: int,
                     theta: float):
    """Rescale base inv_freq per the LlamaConfig.rope_scaling tuple.
    Pure numpy at trace time (shapes/values are static). Returns
    (inv_freq, mscale) where mscale multiplies cos/sin.

    Mirrors transformers' ROPE_INIT_FUNCTIONS "llama3" and "yarn"
    (modeling_rope_utils.py) — validated against transformers in
    tests/test_hf_convert.py."""
    import numpy as np

    kind = scaling[0]
    if kind == "llama3":
        _, factor, low_ff, high_ff, orig_ctx = scaling
        low_wavelen = orig_ctx / low_ff
        high_wavelen = orig_ctx / high_ff
        wavelen = 2 * math.pi / inv_freq
        # long wavelengths (low freq): fully interpolated (freq / factor);
        # short wavelengths (high freq): kept; middle band: smooth blend.
        smooth = (orig_ctx / wavelen - low_ff) / (high_ff - low_ff)
        blended = (1 - smooth) * inv_freq / factor + smooth * inv_freq
        out = np.where(wavelen < high_wavelen, inv_freq,
                       np.where(wavelen > low_wavelen, inv_freq / factor,
                                blended))
        return out.astype(np.float32), 1.0
    if kind == "yarn":
        _, factor, attention_factor, beta_fast, beta_slow, orig_ctx = scaling
        half = hd // 2

        def correction_dim(num_rot):
            return (hd * math.log(orig_ctx / (num_rot * 2 * math.pi))
                    ) / (2 * math.log(theta))

        low = max(math.floor(correction_dim(beta_fast)), 0)
        high = min(math.ceil(correction_dim(beta_slow)), hd - 1)
        ramp = (np.arange(half, dtype=np.float32) - low) / max(high - low,
                                                               0.001)
        extrapolation_factor = 1 - np.clip(ramp, 0, 1)
        out = (inv_freq / factor * (1 - extrapolation_factor)
               + inv_freq * extrapolation_factor)
        return out.astype(np.float32), float(attention_factor)
    raise NotImplementedError(f"rope_scaling kind {kind!r}")


def _rope(x: jax.Array, positions: jax.Array, theta: float,
          scale: float = 1.0, scaling: Optional[tuple] = None) -> jax.Array:
    """Rotary embedding. x: [..., seq, heads, head_dim]; positions:
    [..., seq]; scale > 1 = linear position interpolation (pos / scale);
    scaling = non-linear frequency rescale (LlamaConfig.rope_scaling)."""
    import numpy as np

    hd = x.shape[-1]
    freqs = 1.0 / (theta ** (np.arange(0, hd, 2, dtype=np.float32) / hd))
    mscale = 1.0
    if scaling is not None:
        freqs, mscale = _scaled_inv_freq(scaling, freqs, hd, theta)
    if scale != 1.0:
        freqs = freqs / scale
    freqs = jnp.asarray(freqs)
    angles = positions[..., None].astype(jnp.float32) * freqs  # [..., seq, hd/2]
    cos = jnp.cos(angles)[..., None, :] * mscale  # broadcast over heads
    sin = jnp.sin(angles)[..., None, :] * mscale
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.astype(x.dtype)


def _attention_sharded(q, k, v, mesh: Optional[Mesh],
                       cfg: "LlamaConfig", window_left: int = -1):
    """Causal flash attention on [b, s, h, d]; heads sharded when a mesh with
    a 'model' axis is active (Pallas runs per shard; GQA stays co-located).
    window_left > -1 additionally bounds visibility to the previous
    window_left tokens (sliding-window models); cfg carries the softmax
    scale override and Gemma2 attention softcap."""
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    attn = functools.partial(flash_attention_grad, causal=True,
                             softmax_scale=cfg.attn_scale,
                             window_size=(window_left, -1),
                             logit_softcap=cfg.attn_softcap or 0.0,
                             sink_tokens=cfg.attn_sinks)
    if mesh is not None and MODEL_AXIS in mesh.axis_names:
        spec = P(DATA_AXIS if DATA_AXIS in mesh.axis_names else None,
                 MODEL_AXIS, None, None)
        fn = shard_map(
            attn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False,
        )
        out = fn(qt, kt, vt)
    else:
        out = attn(qt, kt, vt)
    return jnp.swapaxes(out, 1, 2)


def _attention_blockmask(q, k, v, cfg: "LlamaConfig", window_left: int,
                         block_ids: jax.Array, mesh: Optional[Mesh] = None):
    """Flash attention on [b, s, h, d] with the Gemma3 multimodal mask:
    (causal AND window) OR same-image-run (kernels/blockmask.py).
    block_ids [b, s] int32: contiguous image-run id per token, -1 = text.
    Heads shard on a 'model' mesh axis like _attention_sharded (the ids
    are replicated). Prompt-length sequences only; decode stays causal on
    the paged kernels."""
    from mfa_tpu.kernels.blockmask import image_block_prefill

    assert not cfg.attn_softcap, "softcap + image-block mask not supported"
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    attn = functools.partial(image_block_prefill,
                             softmax_scale=cfg.attn_scale,
                             window_left=window_left)
    if mesh is not None and MODEL_AXIS in mesh.axis_names:
        spec = P(DATA_AXIS if DATA_AXIS in mesh.axis_names else None,
                 MODEL_AXIS, None, None)
        fn = shard_map(
            attn, mesh=mesh, in_specs=(spec, spec, spec, P(None, None)),
            out_specs=spec, check_vma=False,
        )
        out = fn(qt, kt, vt, block_ids)
    else:
        out = attn(qt, kt, vt, block_ids)
    return jnp.swapaxes(out, 1, 2)


def _attention_dense_masked(q, k, v, cfg: "LlamaConfig", window_left: int,
                            extra_mask: jax.Array):
    """Dense jnp attention on [b, s, h, d] with mask =
    (causal AND window) OR extra_mask [b, s, s]. The REFERENCE
    implementation of the multimodal mask algebra (Gemma3: image tokens
    attend bidirectionally within their image block — transformers
    token_type_ids or-mask); the serving/production path is the flash
    tiling of the same mask, _attention_blockmask, which is pinned to
    this oracle in tests/test_blockmask.py."""
    b, s, nh, hd = q.shape
    group = nh // k.shape[2]
    kf = jnp.repeat(k, group, axis=2)
    vf = jnp.repeat(v, group, axis=2)
    scale = cfg.attn_scale or (hd ** -0.5)
    sc = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                    kf.astype(jnp.float32)) * scale
    if cfg.attn_softcap:
        cap = float(cfg.attn_softcap)
        sc = jnp.tanh(sc / cap) * cap
    row = jnp.arange(s)[:, None]
    col = jnp.arange(s)[None, :]
    mask = col <= row
    if window_left >= 0:
        mask = jnp.logical_and(mask, col >= row - window_left)
    mask = jnp.logical_or(mask[None], extra_mask)
    sc = jnp.where(mask[:, None], sc, -1e30)
    p = jax.nn.softmax(sc, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, vf.astype(jnp.float32)
                      ).astype(q.dtype)


def forward(
    params: Params,
    tokens: jax.Array,  # [batch, seq] int32
    cfg: LlamaConfig,
    mesh: Optional[Mesh] = None,
    remat: bool = False,
    input_embeds: Optional[jax.Array] = None,
    image_block_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """Full-sequence causal forward -> logits [batch, seq, vocab].

    remat=True checkpoints each layer of the scan (activations are
    recomputed in the backward pass), trading ~30% more FLOPs for O(1)
    layer activations — the standard TPU memory lever for long sequences
    (HBM, not FLOPs, binds training step size).

    input_embeds: optional pre-built [b, s, d] embeddings (multimodal:
    image features already merged — models/vision.py). image_block_ids:
    optional [b, s] int32 per-token image-run id (-1 = text); its
    presence OR's bidirectional same-run visibility into the causal/
    window mask and routes attention through the image-block flash
    kernel (kernels/blockmask.py)."""
    b, s = tokens.shape
    hd = cfg.head_dim
    x = input_embeds if input_embeds is not None else _embed(
        params, tokens, cfg)  # [b, s, d]
    positions = jnp.arange(s, dtype=jnp.int32)[None].repeat(b, 0)

    def body(x, lp, _leaves, wl, rope):
        h = _rms_norm(x, lp["attn_norm"], cfg)
        q, k, v = _qkv(h, lp, cfg, b, s)
        q = _rope(q, positions, *rope)
        k = _rope(k, positions, *rope)
        if image_block_ids is not None:
            attn = _attention_blockmask(q, k, v, cfg, wl,
                                        image_block_ids, mesh)
        else:
            attn = _attention_sharded(q, k, v, mesh, cfg, wl)
        x = _attn_residual(x, attn.reshape(b, s, cfg.n_heads * hd), lp,
                           cfg)
        x = _mlp(x, lp, cfg, mesh)
        return x, ()

    x, _ = _scan_layers(cfg, body, x, params["layers"], (), remat=remat)
    x = _rms_norm(x, params["final_norm"], cfg)
    return _unembed(params, x, cfg)


def loss_fn(params, tokens, cfg, mesh=None, remat=False):
    """Next-token cross entropy over tokens [b, s]."""
    logits = forward(params, tokens[:, :-1], cfg, mesh, remat=remat)
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return nll.mean()


def train_step(params, tokens, cfg, mesh=None, lr=1e-3, remat=False,
               optimizer=None, opt_state=None):
    """One training step. This is the function dryrun_multichip jits over
    the full mesh (DP on batch, TP on heads/ffn via param shardings).

    optimizer: optional optax GradientTransformation (with its opt_state);
    default is plain SGD at `lr`. Returns (params, loss) or, with an
    optimizer, (params, opt_state, loss)."""
    loss, grads = jax.value_and_grad(loss_fn)(params, tokens, cfg, mesh,
                                              remat)
    if optimizer is None:
        params = jax.tree.map(lambda p, g: p - lr * g.astype(p.dtype),
                              params, grads)
        return params, loss
    updates, opt_state = optimizer.update(grads, opt_state, params)
    import optax

    params = optax.apply_updates(params, updates)
    return params, opt_state, loss



# ---------------- serving path (paged cache) ----------------


def build_kv_caches(cfg: LlamaConfig, num_pages: int, page_size: int,
                    max_seqs: int, pages_per_seq: int,
                    quant_dtype: Optional[str] = None):
    """One StackedKVCache covering every layer.

    All layers share one block table + lengths vector (a request occupies
    the same page slots at every layer), so host-side metadata mutations
    (map/release) are single device ops instead of n_layers of them, and
    prefill/decode lax.scan over the stacked layer axis — compile time and
    dispatch overhead O(1) in depth."""
    from mfa_tpu.cache.paged_cache import create_stacked_cache

    return create_stacked_cache(
        n_layers=cfg.n_layers, num_pages=num_pages, page_size=page_size,
        num_kv_heads=cfg.n_kv_heads, head_dim=cfg.head_dim,
        max_seqs=max_seqs, pages_per_seq=pages_per_seq,
        dtype=cfg.dtype, quant_dtype=quant_dtype,
    )


def _prefill_mesh(mesh: Optional[Mesh]) -> Optional[Mesh]:
    """Prefill runs one sequence (batch 1): head-sharding on MODEL_AXIS is
    usable, but a data axis of size > 1 can't shard batch 1 — in that case
    fall back to the unsharded attention path (GSPMD still keeps the
    matmuls sharded; serving meshes should be model-only)."""
    if mesh is None or MODEL_AXIS not in mesh.axis_names:
        return None
    if DATA_AXIS in mesh.axis_names and mesh.shape[DATA_AXIS] > 1:
        return None
    return mesh


def cache_shardings(cfg: LlamaConfig, cache, mesh: Mesh):
    """Cache shardings (TP by kv head on MODEL_AXIS, layer axis replicated)."""
    from mfa_tpu.cache.paged_cache import cache_shardings as _cs

    return _cs(cache, mesh, MODEL_AXIS)


def _store_rows(quant_dtype: Optional[str], store_dtype, x):
    """-> (payload in cache storage dtype, per-row scales or None)."""
    from mfa_tpu.kernels.quant import quantize_rows

    if quant_dtype is None:
        return x.astype(store_dtype), None
    return quantize_rows(x, quant_dtype)


def _paged_attention_sharded(q3, k_pages, v_pages, k_scales, v_scales,
                             lengths, tables, mesh: Optional[Mesh],
                             out_dtype, cfg: "LlamaConfig",
                             window_left: int = -1, quant_dtype=None,
                             pos_offset: int = 0,
                             return_lse: bool = False):
    """Paged decode attention on one layer's pages, TP-sharded by kv head
    when a mesh with a 'model' axis is active. q3: [n, heads, d].

    Zero-communication shard_map: each chip holds whole kv heads of the
    page pool plus the co-located GQA q-head group (q head h maps to kv
    head h // group within the same shard).

    pos_offset/return_lse: the deferred-append serving path (see
    decode_step) — queries sit pos_offset past the stored lengths and the
    caller LSE-merges the span's own K/V rows via _merge_deferred."""
    from mfa_tpu.kernels.paged import paged_attention

    pkw = dict(window_left=window_left, softmax_scale=cfg.attn_scale,
               logit_softcap=cfg.attn_softcap or 0.0,
               quant_dtype=quant_dtype, sink_tokens=cfg.attn_sinks,
               pos_offset=pos_offset, return_lse=return_lse)
    if mesh is None or MODEL_AXIS not in mesh.axis_names:
        return paged_attention(
            q3.astype(out_dtype), k_pages, v_pages, lengths, tables,
            k_scales=k_scales, v_scales=v_scales, **pkw,
        )

    page_spec = P(MODEL_AXIS, None, None, None)
    q_spec = (P(None, MODEL_AXIS, None) if q3.ndim == 3
              else P(None, None, MODEL_AXIS, None))
    lse_spec = (P(None, MODEL_AXIS) if q3.ndim == 3
                else P(None, None, MODEL_AXIS))
    in_specs = [q_spec, page_spec, page_spec, P(), P(None, None)]
    args = [q3.astype(out_dtype), k_pages, v_pages, lengths, tables]
    if k_scales is not None:
        in_specs += [P(MODEL_AXIS, None, None)] * 2
        args += [k_scales, v_scales]

        def _fn(q, kp, vp, lens, tab, ks, vs):
            return paged_attention(q, kp, vp, lens, tab,
                                   k_scales=ks, v_scales=vs, **pkw)
    else:

        def _fn(q, kp, vp, lens, tab):
            return paged_attention(q, kp, vp, lens, tab, **pkw)

    fn = shard_map(
        _fn, mesh=mesh, in_specs=tuple(in_specs),
        out_specs=(q_spec, lse_spec) if return_lse else q_spec,
        check_vma=False,
    )
    return fn(*args)


def _merge_deferred(o_c, lse_c, q, kq, ks_new, vq, vs_new,
                    cfg: "LlamaConfig"):
    """Exact LSE merge of the deferred-append span's OWN K/V rows into the
    paged-cache attention result (kernels/paged.py pos_offset: the span's
    rows are not yet in the cache; the post-scan scatter appends them).

    Numerics mirror the kernel's treatment had the rows been stored:
    raw-payload dot in bf16 with the per-row quant scale applied AFTER the
    contraction, softcap on the scaled logit, fp32 softmax algebra.

    o_c:   [n, span, heads, d] cache attention output (normalized)
    lse_c: [n, span, heads] natural-log LSE of the scaled cache logits
    q:     [n, span, heads, d]
    kq/vq: [hkv, n*span, d] payload rows (span-major per sequence:
           row n_i*span + si); ks/vs: [hkv, n*span] fp32 or None

    Returns [n, span, heads, d] in o_c's dtype.
    """
    n, span, heads, d = q.shape
    hkv = cfg.n_kv_heads
    group = heads // hkv
    scale = float(cfg.attn_scale if cfg.attn_scale is not None
                  else cfg.head_dim ** -0.5)
    cap = float(cfg.attn_softcap or 0.0)

    # payload rows -> [n, span(kv), hkv, d]
    kr = jnp.transpose(kq.reshape(hkv, n, span, d), (1, 2, 0, 3))
    vr = jnp.transpose(vq.reshape(hkv, n, span, d), (1, 2, 0, 3))
    quantized = ks_new is not None
    qg = q.reshape(n, span, hkv, group, d)
    # mirror the kernel's compute dtypes: quantized payload contracts in
    # bf16 (int8/fp8 -> bf16 is exact); unquantized caches keep the
    # stored dtype (fp32 tests are exact in interpret mode)
    qc = qg.astype(jnp.bfloat16) if quantized else qg
    kc = kr.astype(jnp.bfloat16) if quantized else kr
    s = jnp.einsum("nihgd,njhd->nhgij", qc, kc,
                   preferred_element_type=jnp.float32)
    if quantized:
        ksr = jnp.transpose(ks_new.reshape(hkv, n, span), (1, 0, 2))
        s = s * ksr[:, :, None, None, :]  # per kv COLUMN j scale
        vd = (vr.astype(jnp.float32)
              * jnp.transpose(vs_new.reshape(hkv, n, span),
                              (1, 2, 0))[..., None])
    else:
        vd = vr.astype(jnp.float32)
    if cap:
        s = jnp.tanh(s * (scale / cap)) * cap
    else:
        s = s * scale
    if span > 1:
        tri = (jnp.arange(span)[:, None] >= jnp.arange(span)[None, :])
        s = jnp.where(tri[None, None, None], s, -jnp.inf)
    # local logsumexp + weighted V over the span columns
    m_loc = jnp.max(s, axis=-1)  # [n, hkv, group, span(i)]
    p = jnp.exp(s - m_loc[..., None])
    l_loc = jnp.sum(p, axis=-1)
    o_loc = jnp.einsum("nhgij,njhd->nhgid", p, vd)
    # merge with the cache part (lse_c may be -inf: empty cache row)
    lse = jnp.transpose(lse_c.reshape(n, span, hkv, group),
                        (0, 2, 3, 1))  # [n, hkv, group, span]
    m = jnp.maximum(lse, m_loc)
    a = jnp.where(jnp.isneginf(lse), 0.0, jnp.exp(lse - m))
    b = jnp.exp(m_loc - m) * l_loc
    oc = jnp.transpose(o_c.reshape(n, span, hkv, group, d),
                       (0, 2, 3, 1, 4)).astype(jnp.float32)
    o = (oc * a[..., None] + o_loc * jnp.exp(m_loc - m)[..., None]) / (
        a + b)[..., None]
    return jnp.transpose(o, (0, 3, 1, 2, 4)).reshape(
        n, span, heads, d).astype(o_c.dtype)


def _cache_pools(cache):
    """The MERGED KV pools of a StackedKVCache (scan CARRY, not xs)."""
    return (cache.k_pages, cache.v_pages, cache.k_scales, cache.v_scales)


def _scan_layers_kv(cfg: "LlamaConfig", body, x, layers, pools):
    """Scan `body(x, pools, lp, l, window_left, rope) -> (x, pools)` over
    the stacked layer axis with the MERGED KV pools in the scan CARRY.

    Layer l addresses its pages as physical `logical_id + l * num_pages`
    inside the shared pool (cache/paged_cache.StackedKVCache layout), so
    every cache write is a token/page-level scatter that XLA aliases in
    place on the carry. The previous design scanned per-layer pool
    slices as xs and restacked them as ys — a full pool read + write
    per step that DOMINATED decode (step time scaled with pool size at
    fixed kv length: 5.7 -> 19.5 ms/step for 4x pools, r4 probe).

    Sliding patterns (Gemma2 pairs, Gemma3 periods) scan as PERIODS with
    the static sub-index selecting window/theta, like _scan_layers;
    heterogeneous MoE/dense interleaves unroll at trace time."""
    pattern = cfg.sliding_pattern
    L = cfg.n_layers

    def _static(li):
        if pattern is None:
            return cfg.window_left, (cfg.rope_theta, cfg.rope_scale,
                                     cfg.rope_scaling)
        sliding = bool(pattern[li % len(pattern)])
        return (cfg.window_left if sliding else -1,
                _sub_rope(cfg, sliding))

    if cfg.moe_hetero:
        mpat = cfg.moe_layer_pattern
        moe_i = dense_i = 0
        for li in range(L):
            if mpat[li]:
                grp, pos = layers["moe"], moe_i
                moe_i += 1
            else:
                grp, pos = layers["dense"], dense_i
                dense_i += 1
            lp = jax.tree.map(lambda a, p=pos: a[p], grp)
            wl, rope = _static(li)
            x, pools = body(x, pools, lp, jnp.int32(li), wl, rope)
        return x, pools
    if pattern is None:
        wl, rope = _static(0)

        def fn(carry, xs):
            x, pools = carry
            lp, l = xs
            x, pools = body(x, pools, lp, l, wl, rope)
            return (x, pools), None

        (x, pools), _ = jax.lax.scan(
            fn, (x, pools), (layers, jnp.arange(L, dtype=jnp.int32)))
        return x, pools
    period = len(pattern)
    assert L % period == 0, (
        f"layer pattern period {period} must divide n_layers")

    def group(t):
        return jax.tree.map(
            lambda a: a.reshape(a.shape[0] // period, period,
                                *a.shape[1:]), t)

    def fn(carry, xs):
        x, pools = carry
        lpg, git = xs
        for sub in range(period):
            lp = jax.tree.map(lambda a: a[sub], lpg)
            wl, rope = _static(sub)
            x, pools = body(x, pools, lp, git * period + sub, wl, rope)
        return (x, pools), None

    (x, pools), _ = jax.lax.scan(
        fn, (x, pools),
        (group(layers), jnp.arange(L // period, dtype=jnp.int32)))
    return x, pools


def _scan_layers_deferred(cfg: "LlamaConfig", body, x, layers):
    """Layer scan for the DEFERRED-APPEND serving path: `body(x, lp, l,
    window_left, rope) -> (x, ys)` only READS the KV pools (closed over)
    and emits each layer's new K/V rows as stacked ys; the caller appends
    all layers with ONE post-scan scatter.

    Why not thread the pools through the carry and scatter per layer
    (_scan_layers_kv): XLA's copy insertion cannot keep a carried pool
    buffer in place once the same loop body both scatters it and feeds it
    to a custom call (the Pallas paged kernel) — every layer then copies
    the full pools. Measured at the 1B serve shape (16L, 273 MB pools,
    r5 probe): scatters alone 0.46 ms, attention alone 0.78 ms, combined
    in one body 15.4 ms; this read-only structure runs the same work in
    1.8 ms. Returns (x, ys) with each ys leaf stacked [n_layers, ...]."""
    pattern = cfg.sliding_pattern
    L = cfg.n_layers

    def _static(li):
        if pattern is None:
            return cfg.window_left, (cfg.rope_theta, cfg.rope_scale,
                                     cfg.rope_scaling)
        sliding = bool(pattern[li % len(pattern)])
        return (cfg.window_left if sliding else -1,
                _sub_rope(cfg, sliding))

    if cfg.moe_hetero:
        mpat = cfg.moe_layer_pattern
        moe_i = dense_i = 0
        ys_list = []
        for li in range(L):
            if mpat[li]:
                grp, pos = layers["moe"], moe_i
                moe_i += 1
            else:
                grp, pos = layers["dense"], dense_i
                dense_i += 1
            lp = jax.tree.map(lambda a, p=pos: a[p], grp)
            wl, rope = _static(li)
            x, ys = body(x, lp, jnp.int32(li), wl, rope)
            ys_list.append(ys)
        return x, jax.tree.map(lambda *a: jnp.stack(a), *ys_list)
    if pattern is None:
        wl, rope = _static(0)

        def fn(x, xs):
            lp, l = xs
            return body(x, lp, l, wl, rope)

        return jax.lax.scan(fn, x, (layers, jnp.arange(L, dtype=jnp.int32)))
    period = len(pattern)
    assert L % period == 0, (
        f"layer pattern period {period} must divide n_layers")

    def group(t):
        return jax.tree.map(
            lambda a: a.reshape(a.shape[0] // period, period,
                                *a.shape[1:]), t)

    def fn(x, xs):
        lpg, git = xs
        subs = []
        for sub in range(period):
            lp = jax.tree.map(lambda a: a[sub], lpg)
            wl, rope = _static(sub)
            x, ys = body(x, lp, git * period + sub, wl, rope)
            subs.append(ys)
        return x, jax.tree.map(lambda *a: jnp.stack(a), *subs)

    x, ys = jax.lax.scan(
        fn, x, (group(layers), jnp.arange(L // period, dtype=jnp.int32)))
    # ys leaves are [L//period, period, ...] -> flatten to [L, ...]
    return x, jax.tree.map(
        lambda a: a.reshape(L, *a.shape[2:]), ys)


def prefill_batch(params, cfg, cache, seq_slots, pages_list, token_lists,
                  mesh: Optional[Mesh] = None, vision=None,
                  pixel_lists=None):
    """Prefill n prompts in ONE jitted program (batched prompt ingestion).

    Per-request prefill calls cost a full dispatch each; batching all
    admitted prompts into one padded [n, s_pad] program keeps the MXU fed
    and makes prompt ingestion O(1) dispatches per admission wave. Prompts
    are padded to a shared power-of-two page count (compile count
    O(log max_len)); padded positions write into the reserved null page 0
    and are never attended (causal mask + true-length logits gather).

    seq_slots: [n] slot ids; pages_list: per-request page id lists;
    token_lists: per-request python token lists (or 1-D arrays).
    Returns (cache, logits [n, vocab]) at each prompt's last position.

    vision: optional (vparams, vcfg, image_token_id) for multimodal
    (Gemma3) prompts; pixel_lists: per-request [k_i, 3, H, W] arrays (or
    None) in request order — their projected features replace the
    <image> placeholder rows and the prefill runs the dense image-block
    mask path (models/vision.py). Decode afterwards is plain causal.
    """
    import numpy as np

    page = cache.page_size
    pps = cache.pages_per_seq
    token_lists = [np.asarray(t, np.int32) for t in token_lists]
    lens = [int(t.shape[0]) for t in token_lists]
    n_need = max(-(-l // page) for l in lens)
    assert n_need <= pps, "prompt longer than table width"
    n_bucket = min(max(1 << max(n_need - 1, 0).bit_length(), 1), pps)
    s_pad = n_bucket * page
    n = len(token_lists)
    toks = np.zeros((n, s_pad), np.int32)
    page_ids = np.zeros((n, n_bucket), np.int32)
    table_rows = np.zeros((n, pps), np.int32)
    true_lens = np.zeros((n,), np.int32)
    for i, (t, pgs) in enumerate(zip(token_lists, pages_list)):
        toks[i, : lens[i]] = t
        need_i = -(-lens[i] // page)
        page_ids[i, :need_i] = np.asarray(list(pgs[:need_i]), np.int32)
        table_rows[i, : len(pgs)] = np.asarray(list(pgs), np.int32)
        true_lens[i] = lens[i]
    toks_j = jnp.asarray(toks)
    embeds = mask = None
    if vision is not None and pixel_lists is not None and any(
            p is not None for p in pixel_lists):
        from mfa_tpu.models.vision import (
            gemma3_image_features,
            image_block_ids_from_tokens,
            merge_image_embeds,
        )

        vparams, vcfg, image_tok = vision
        pixels = jnp.concatenate(
            [jnp.asarray(p) for p in pixel_lists if p is not None], axis=0)
        feats = gemma3_image_features(vparams, pixels, vcfg)
        embeds = merge_image_embeds(
            _embed(params, toks_j, cfg), toks_j, feats, image_tok)
        mask = image_block_ids_from_tokens(toks_j, image_tok)
    return _prefill_jit(
        params, cfg, cache, jnp.asarray(seq_slots, jnp.int32),
        jnp.asarray(table_rows), jnp.asarray(page_ids), toks_j,
        jnp.asarray(true_lens), mesh=mesh, input_embeds=embeds,
        image_block_ids=mask,
    )


def prefill_step(params, cfg, cache, seq_slot: int, pages, tokens_1d,
                 mesh: Optional[Mesh] = None):
    """Run one prompt through the model, writing K/V into the paged cache.
    Returns (cache, last_logits [vocab]). Single-request convenience over
    prefill_batch."""
    cache, logits = prefill_batch(
        params, cfg, cache, [seq_slot], [list(pages)], [tokens_1d], mesh=mesh
    )
    return cache, logits[0]


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"))
def _prefill_jit(params, cfg: LlamaConfig, cache, seq_slots, table_rows,
                 page_ids, tokens, true_lens, mesh: Optional[Mesh] = None,
                 input_embeds=None, image_block_ids=None):
    import dataclasses as _dc

    n, s = tokens.shape
    hd = cfg.head_dim
    page = cache.page_size
    npg = page_ids.shape[1]
    pmesh = _prefill_mesh(mesh)
    x = (input_embeds if input_embeds is not None
         else _embed(params, tokens, cfg))  # [n, s, d]
    positions = jnp.arange(s, dtype=jnp.int32)[None]  # broadcast over n
    flat_ids = page_ids.reshape(-1)  # [n*npg]; duplicates only on null page
    P = cache.num_pages  # logical pages per layer (merged-pool stride)

    kp, vp, ksc, vsc = _cache_pools(cache)

    def body(x, lp, l, wl, rope):
        h = _rms_norm(x, lp["attn_norm"], cfg)
        q, k, v = _qkv(h, lp, cfg, n, s)
        q = _rope(q, positions, *rope)
        k = _rope(k, positions, *rope)
        # page payload: [n, s, hkv, d] -> [hkv, n*npg, page(, d)] packed —
        # emitted as ys; prefill attention reads only the IN-FLIGHT k/v,
        # so the pools never enter the scan (a body that both scatters a
        # carried pool and contains a custom call pays pool-size-scaled
        # copies even when the call doesn't touch the pool — measured
        # ~1 ms/pass at the 1B shape, r5 probe)
        kq, ks_new = _store_rows(cache.quant_dtype, kp.dtype,
                                 jnp.transpose(k, (2, 0, 1, 3)))
        vq, vs_new = _store_rows(cache.quant_dtype, vp.dtype,
                                 jnp.transpose(v, (2, 0, 1, 3)))
        from mfa_tpu.cache.paged_cache import pack_pages_payload

        kq = pack_pages_payload(cache.quant_dtype, kq, n * npg, page)
        vq = pack_pages_payload(cache.quant_dtype, vq, n * npg, page)
        if image_block_ids is not None:
            attn = _attention_blockmask(q, k, v, cfg, wl,
                                        image_block_ids, pmesh)
        else:
            attn = _attention_sharded(q, k, v, pmesh, cfg, wl)
        x = _attn_residual(x, attn.reshape(n, s, cfg.n_heads * hd), lp,
                           cfg)
        x = _mlp(x, lp, cfg, mesh)
        if ksc is not None:
            hkv = cfg.n_kv_heads
            return x, (kq, ks_new.reshape(hkv, n * npg, page), vq,
                       vs_new.reshape(hkv, n * npg, page))
        return x, (kq, vq)

    x, ys = _scan_layers_deferred(cfg, body, x, params["layers"])
    # ONE page-level scatter for every layer's pages
    lids = (flat_ids[None, :]
            + jnp.arange(cfg.n_layers, dtype=jnp.int32)[:, None] * P
            ).reshape(-1)

    def _flat(a):  # [L, hkv, n*npg, ...] -> [hkv, L*n*npg, ...]
        return jnp.swapaxes(a, 0, 1).reshape(
            a.shape[1], a.shape[0] * a.shape[2], *a.shape[3:])

    if ksc is not None:
        kq_all, ks_all, vq_all, vs_all = ys
        ksc = ksc.at[:, lids].set(_flat(ks_all))
        vsc = vsc.at[:, lids].set(_flat(vs_all))
    else:
        kq_all, vq_all = ys
    kp = kp.at[:, lids].set(_flat(kq_all))
    vp = vp.at[:, lids].set(_flat(vq_all))
    x = _rms_norm(x, params["final_norm"], cfg)
    last = jnp.take_along_axis(
        x, jnp.maximum(true_lens - 1, 0)[:, None, None], axis=1
    )[:, 0]  # [n, d]
    logits = _unembed(params, last, cfg)
    cache = _dc.replace(
        cache, k_pages=kp, v_pages=vp, k_scales=ksc, v_scales=vsc,
        block_tables=cache.block_tables.at[seq_slots].set(table_rows),
        lengths=cache.lengths.at[seq_slots].set(true_lens),
    )
    return cache, logits


def _paged_prefill_sharded(q, k_pages, v_pages, k_scales, v_scales,
                           kv_len, q_start, table, mesh: Optional[Mesh],
                           cfg: "LlamaConfig", window_left: int,
                           quant_dtype=None):
    """Chunk attention against the paged cache, TP-sharded by kv head when
    a 'model' mesh is active. q: [b, chunk, h, d]."""
    from mfa_tpu.kernels.paged_prefill import paged_prefill_attention

    kwargs = dict(window_left=window_left, softmax_scale=cfg.attn_scale,
                  logit_softcap=cfg.attn_softcap or 0.0,
                  quant_dtype=quant_dtype, sink_tokens=cfg.attn_sinks)
    if mesh is None or MODEL_AXIS not in mesh.axis_names:
        return paged_prefill_attention(
            q, k_pages, v_pages, kv_len, q_start, table,
            k_scales=k_scales, v_scales=v_scales, **kwargs)

    page_spec = P(MODEL_AXIS, None, None, None)
    in_specs = [P(None, None, MODEL_AXIS, None), page_spec, page_spec,
                P(), P(), P(None, None)]
    args = [q, k_pages, v_pages, kv_len, q_start, table]
    if k_scales is not None:
        in_specs += [P(MODEL_AXIS, None, None)] * 2

        def _fn(qq, kp, vp, lens, qs, tab, ks, vs):
            return paged_prefill_attention(
                qq, kp, vp, lens, qs, tab, k_scales=ks, v_scales=vs,
                **kwargs)

        args += [k_scales, v_scales]
    else:

        def _fn(qq, kp, vp, lens, qs, tab):
            return paged_prefill_attention(qq, kp, vp, lens, qs, tab,
                                           **kwargs)

    fn = shard_map(_fn, mesh=mesh, in_specs=tuple(in_specs),
                   out_specs=P(None, None, MODEL_AXIS, None),
                   check_vma=False)
    return fn(*args)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"))
def _prefill_chunk_jit(params, cfg: LlamaConfig, cache, seq_slots,
                       table_rows, tokens, offsets, final_mask, final_lens,
                       mesh: Optional[Mesh] = None):
    """One chunk for EACH of n in-progress prompts, in one program.

    tokens: [n, chunk] (chunk = whole pages; per-row dead tails allowed);
    offsets: [n] absolute position of tokens[:, 0] (DYNAMIC — one compiled
    program serves every chunk position); final_mask/final_lens: [n] — rows
    finishing their prompt get lengths set and meaningful logits.

    Attention runs on the in-kernel-DMA paged prefill kernel
    (kernels/paged_prefill.py) — no materialized prefix gather. Chunked
    prefill bounds per-step prefill work so long prompts don't stall decode
    latency for the rest of the batch (the reference has no scheduler at
    all, SURVEY.md §2.8).

    This path deliberately KEEPS write-then-attend (per-layer pool
    scatters in the scan body) even though that structure costs
    pool-size-scaled XLA copies in decode_step (see
    _scan_layers_deferred): the deferred alternative — prefix-only
    kernel pass + dense chunk-self attention + exact LSE merge, with a
    paged_prefill return_lse output — was built and A/B-measured in r5
    at 16L/b8/chunk256/prefix256/int8 and LOST: 40.6 vs 30.6 ms at
    head_dim 64 (the dense kernel's narrow-head prepass re-pays a
    serial q+k HBM pass per layer) and 31.4 vs 29.5 ms at head_dim 128
    (two kernel launches + merge overhead exceed the copy savings at
    prefill-sized chunks, where the fused stream amortizes its fixed
    costs over chunk*kv work). Parity of the reverted branch was
    verified on-chip (layer-0 pages bit-identical; deeper layers within
    activation-propagation quant noise).
    """
    import dataclasses as _dc

    n, chunk = tokens.shape
    hd = cfg.head_dim
    page = cache.page_size
    pps = cache.pages_per_seq
    chunk_pages = chunk // page
    offsets = jnp.asarray(offsets, jnp.int32)
    x = _embed(params, tokens, cfg)  # [n, chunk, d]
    positions = offsets[:, None] + jnp.arange(chunk, dtype=jnp.int32)[None]
    # per-row page ids for the chunk's writes; rows whose padded chunk runs
    # past the table width write into the reserved null page 0
    pidx = offsets[:, None] // page + jnp.arange(chunk_pages,
                                                 dtype=jnp.int32)[None]
    in_table = pidx < pps
    page_ids = jnp.where(
        in_table,
        jnp.take_along_axis(table_rows, jnp.clip(pidx, 0, pps - 1), axis=1),
        0,
    ).reshape(-1)  # [n*chunk_pages]
    kv_len = jnp.minimum(final_lens, offsets + chunk)  # [n]
    P = cache.num_pages  # merged-pool per-layer stride

    def body(x, pools, lp, l, wl, rope):
        kp, vp, ksc, vsc = pools
        h = _rms_norm(x, lp["attn_norm"], cfg)
        q, k, v = _qkv(h, lp, cfg, n, chunk)
        q = _rope(q, positions, *rope)
        k = _rope(k, positions, *rope)
        ids_l = page_ids + l * P
        tab_l = table_rows + l * P
        kq, ks_new = _store_rows(
            cache.quant_dtype, kp.dtype,
            jnp.transpose(k, (2, 0, 1, 3)).reshape(cfg.n_kv_heads, -1, hd))
        vq, vs_new = _store_rows(
            cache.quant_dtype, vp.dtype,
            jnp.transpose(v, (2, 0, 1, 3)).reshape(cfg.n_kv_heads, -1, hd))
        from mfa_tpu.cache.paged_cache import pack_pages_payload

        kp = kp.at[:, ids_l].set(
            pack_pages_payload(cache.quant_dtype, kq, n * chunk_pages, page))
        vp = vp.at[:, ids_l].set(
            pack_pages_payload(cache.quant_dtype, vq, n * chunk_pages, page))
        if ksc is not None:
            ksc = ksc.at[:, ids_l].set(
                ks_new.reshape(cfg.n_kv_heads, n * chunk_pages, page))
            vsc = vsc.at[:, ids_l].set(
                vs_new.reshape(cfg.n_kv_heads, n * chunk_pages, page))
        attn = _paged_prefill_sharded(
            q.astype(cfg.dtype), kp, vp, ksc, vsc, kv_len, offsets,
            tab_l, _prefill_mesh(mesh), cfg, wl, cache.quant_dtype,
        )
        x = _attn_residual(x, attn.reshape(n, chunk, cfg.n_heads * hd),
                           lp, cfg)
        x = _mlp(x, lp, cfg, mesh)
        return x, (kp, vp, ksc, vsc)

    x, (kp, vp, ksc, vsc) = _scan_layers_kv(
        cfg, body, x, params["layers"], _cache_pools(cache)
    )
    x = _rms_norm(x, params["final_norm"], cfg)
    last_idx = jnp.clip(final_lens - 1 - offsets, 0, chunk - 1)
    last = jnp.take_along_axis(x, last_idx[:, None, None], axis=1)[:, 0]
    logits = _unembed(params, last, cfg)  # [n, vocab]
    lengths = cache.lengths.at[seq_slots].set(
        jnp.where(final_mask, final_lens, cache.lengths[seq_slots])
    )
    cache = _dc.replace(
        cache, k_pages=kp, v_pages=vp, k_scales=ksc, v_scales=vsc,
        block_tables=cache.block_tables.at[seq_slots].set(table_rows),
        lengths=lengths,
    )
    return cache, logits


def prefill_chunk_batch(params, cfg, cache, reqs_slots, reqs_pages,
                        chunk_tokens, offsets, totals,
                        chunk: int, mesh: Optional[Mesh] = None):
    """Host wrapper: advance n prompts by one chunk each (see
    _prefill_chunk_jit). chunk_tokens[i]: THIS chunk's tokens (len <=
    chunk); offsets[i]: absolute, page-aligned position of its first
    token; totals[i]: the full prompt length. Returns (cache,
    logits [n, vocab]) — row i meaningful iff the row finished
    (offsets[i] + len(chunk_tokens[i]) >= totals[i])."""
    import numpy as np

    page = cache.page_size
    assert chunk % page == 0
    n = len(reqs_slots)
    toks = np.zeros((n, chunk), np.int32)
    offs = np.zeros((n,), np.int32)
    table_rows = np.zeros((n, cache.pages_per_seq), np.int32)
    finals = np.zeros((n,), bool)
    final_lens = np.zeros((n,), np.int32)
    for i in range(n):
        ct = np.asarray(chunk_tokens[i], np.int32)
        assert int(offsets[i]) % page == 0 and ct.shape[0] <= chunk
        toks[i, : ct.shape[0]] = ct
        offs[i] = int(offsets[i])
        finals[i] = int(offsets[i]) + ct.shape[0] >= int(totals[i])
        final_lens[i] = int(totals[i])
        table_rows[i, : len(reqs_pages[i])] = np.asarray(
            list(reqs_pages[i]), np.int32)
    cache, logits = _prefill_chunk_jit(
        params, cfg, cache, jnp.asarray(reqs_slots, jnp.int32),
        jnp.asarray(table_rows), jnp.asarray(toks), jnp.asarray(offs),
        jnp.asarray(finals), jnp.asarray(final_lens), mesh=mesh,
    )
    return cache, logits


def prefill_chunk(params, cfg, cache, seq_slot: int, pages, tokens_1d,
                  offset: int, total_len: int,
                  mesh: Optional[Mesh] = None):
    """Single-request convenience over prefill_chunk_batch: prefill this
    chunk (tokens_1d, starting at absolute page-aligned `offset`) into slot
    seq_slot. Returns (cache, logits-or-None) — logits on the final chunk.
    """
    import numpy as np

    tokens_1d = np.asarray(tokens_1d, np.int32)
    n_tok = int(tokens_1d.shape[0])
    page = cache.page_size
    chunk = -(-n_tok // page) * page
    cache, logits = prefill_chunk_batch(
        params, cfg, cache, [seq_slot], [list(pages)], [tokens_1d],
        [offset], [total_len], chunk, mesh=mesh,
    )
    is_final = offset + n_tok >= total_len
    return cache, (logits[0] if is_final else None)


def _append_all_layers(cache, kq_all, ks_all, vq_all, vs_all,
                       page_ids, offs):
    """ONE scatter appending every layer's deferred K/V rows to the merged
    pools (the deferred-append epilogue of decode_step/verify_step).

    kq_all/vq_all: [L, hkv, R, d] payload rows; ks/vs: [L, hkv, R] or
    None; page_ids/offs: [R] LOGICAL page + row offset per row (the
    per-layer physical offset l * num_pages is added here)."""
    import dataclasses as _dc

    from mfa_tpu.cache.paged_cache import scatter_span_rows

    kp, vp, ksc, vsc = _cache_pools(cache)
    L, hkv, R, d = kq_all.shape
    P = cache.num_pages
    lids = (page_ids[None, :]
            + jnp.arange(L, dtype=jnp.int32)[:, None] * P).reshape(-1)
    loffs = jnp.tile(offs, (L,))
    kq_flat = jnp.swapaxes(kq_all, 0, 1).reshape(hkv, L * R, d)
    vq_flat = jnp.swapaxes(vq_all, 0, 1).reshape(hkv, L * R, d)
    # scatter_span_rows: span rows may share an int4 token pair (parity
    # passes); identical to a plain scatter for every other format
    kp = scatter_span_rows(kp, lids, loffs, kq_flat, cache.quant_dtype)
    vp = scatter_span_rows(vp, lids, loffs, vq_flat, cache.quant_dtype)
    if ksc is not None:
        ksc = ksc.at[:, lids, loffs].set(
            jnp.swapaxes(ks_all, 0, 1).reshape(hkv, L * R))
        vsc = vsc.at[:, lids, loffs].set(
            jnp.swapaxes(vs_all, 0, 1).reshape(hkv, L * R))
    return _dc.replace(cache, k_pages=kp, v_pages=vp,
                       k_scales=ksc, v_scales=vsc)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"))
def decode_step(params, cfg: LlamaConfig, cache, seq_slots, tokens,
                mesh: Optional[Mesh] = None):
    """One decode step for the active batch (DEFERRED-APPEND design).

    seq_slots: [n] int32 cache rows; tokens: [n] int32 current tokens.
    Returns (cache, logits [n, vocab]). The layer scan only READS the
    page pools: each layer attends over the stored cache with the paged
    kernel's pos_offset=1 (the query sits one past the stored length) and
    the token's own K/V row is folded in with an exact LSE merge
    (_merge_deferred); all layers' rows are then appended with ONE
    post-scan scatter (_append_all_layers). Scattering per layer inside
    the scan forces XLA to copy the full pools every layer (see
    _scan_layers_deferred) — measured 8x slower at the 1B serve shape.
    The engine invariant is unchanged: on return, the consumed token's
    KV is in the cache and lengths include it. With a mesh carrying a
    'model' axis, pages and attention are TP-sharded by kv head.
    """
    import dataclasses as _dc

    n = tokens.shape[0]
    hd = cfg.head_dim
    page = cache.page_size
    lens = cache.lengths[seq_slots]  # [n]
    write_pages = cache.block_tables[seq_slots, lens // page]  # [n]
    offs = lens % page
    tables = cache.block_tables[seq_slots]
    x = _embed(params, tokens, cfg)[:, None]  # [n, 1, d]
    positions = lens[:, None]
    P = cache.num_pages  # merged-pool per-layer stride
    kp, vp, ksc, vsc = _cache_pools(cache)

    def body(x, lp, l, wl, rope):
        h = _rms_norm(x, lp["attn_norm"], cfg)
        q, k, v = _qkv(h, lp, cfg, n, 1)
        q = _rope(q, positions, *rope)
        k = _rope(k, positions, *rope)
        kq, ks_new = _store_rows(cache.quant_dtype, kp.dtype,
                                 jnp.swapaxes(k[:, 0], 0, 1))  # [hkv, n, d]
        vq, vs_new = _store_rows(cache.quant_dtype, vp.dtype,
                                 jnp.swapaxes(v[:, 0], 0, 1))
        o_c, lse_c = _paged_attention_sharded(
            q[:, 0], kp, vp, ksc, vsc, lens, tables + l * P, mesh,
            cfg.dtype, cfg, wl, cache.quant_dtype,
            pos_offset=1, return_lse=True,
        )  # [n, heads, hd], [n, heads]
        attn = _merge_deferred(o_c[:, None], lse_c[:, None], q, kq, ks_new,
                               vq, vs_new, cfg)[:, 0]
        x = _attn_residual(x, attn.reshape(n, 1, cfg.n_heads * hd), lp,
                           cfg)
        x = _mlp(x, lp, cfg, mesh)
        return x, ((kq, ks_new, vq, vs_new) if ksc is not None
                   else (kq, vq))

    x, ys = _scan_layers_deferred(cfg, body, x, params["layers"])
    if ksc is not None:
        kq_all, ks_all, vq_all, vs_all = ys
    else:
        (kq_all, vq_all), ks_all, vs_all = ys, None, None
    cache = _append_all_layers(cache, kq_all, ks_all, vq_all, vs_all,
                               write_pages, offs)
    x = _rms_norm(x, params["final_norm"], cfg)
    logits = _unembed(params, x[:, 0], cfg)
    cache = _dc.replace(
        cache, lengths=cache.lengths.at[seq_slots].set(lens + 1),
    )
    return cache, logits


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"))
def verify_step(params, cfg: LlamaConfig, cache, seq_slots, tokens,
                mesh: Optional[Mesh] = None):
    """Score `span` tokens per sequence in ONE forward (speculative
    verification / multi-token processing). DEFERRED-APPEND design.

    tokens: [n, span] — appended to each sequence in order; returns
    (cache, logits [n, span, vocab]) where logits[:, i] is the model's
    next-token distribution after consuming tokens[:, :i+1]. The paged
    kernel streams the STORED cache once with pos_offset=span (per-row
    causal alignment against the old length); the span's intra-span
    causal attention is computed densely on the tiny [span, span] tile
    and folded in with an exact LSE merge (_merge_deferred), then all
    layers' rows are appended with ONE post-scan scatter — the layer
    scan never writes the pools (see _scan_layers_deferred for why).
    Rollback of rejected tokens is just a lengths reset (page contents
    past `lengths` are dead and get overwritten by later appends).
    """
    import dataclasses as _dc

    n, span = tokens.shape
    hd = cfg.head_dim
    page = cache.page_size
    lens = cache.lengths[seq_slots]  # [n]
    pos = lens[:, None] + jnp.arange(span, dtype=jnp.int32)[None]  # [n, span]
    write_pages = cache.block_tables[
        seq_slots[:, None], pos // page
    ].reshape(-1)  # [n*span]
    offs = (pos % page).reshape(-1)
    tables = cache.block_tables[seq_slots]
    x = _embed(params, tokens, cfg)  # [n, span, d]
    P = cache.num_pages  # merged-pool per-layer stride
    kp, vp, ksc, vsc = _cache_pools(cache)

    def body(x, lp, l, wl, rope):
        h = _rms_norm(x, lp["attn_norm"], cfg)
        q, k, v = _qkv(h, lp, cfg, n, span)
        q = _rope(q, pos, *rope)
        k = _rope(k, pos, *rope)
        kq, ks_new = _store_rows(
            cache.quant_dtype, kp.dtype,
            jnp.transpose(k, (2, 0, 1, 3)).reshape(cfg.n_kv_heads, -1, hd))
        vq, vs_new = _store_rows(
            cache.quant_dtype, vp.dtype,
            jnp.transpose(v, (2, 0, 1, 3)).reshape(cfg.n_kv_heads, -1, hd))
        o_c, lse_c = _paged_attention_sharded(
            q, kp, vp, ksc, vsc, lens, tables + l * P, mesh, cfg.dtype,
            cfg, wl, cache.quant_dtype,
            pos_offset=span, return_lse=True,
        )  # [n, span, heads, hd], [n, span, heads]
        attn = _merge_deferred(o_c, lse_c, q, kq, ks_new, vq, vs_new, cfg)
        x = _attn_residual(x, attn.reshape(n, span, cfg.n_heads * hd),
                           lp, cfg)
        x = _mlp(x, lp, cfg, mesh)
        return x, ((kq, ks_new, vq, vs_new) if ksc is not None
                   else (kq, vq))

    x, ys = _scan_layers_deferred(cfg, body, x, params["layers"])
    if ksc is not None:
        kq_all, ks_all, vq_all, vs_all = ys
    else:
        (kq_all, vq_all), ks_all, vs_all = ys, None, None
    cache = _append_all_layers(cache, kq_all, ks_all, vq_all, vs_all,
                               write_pages, offs)
    x = _rms_norm(x, params["final_norm"], cfg)
    logits = _unembed(params, x, cfg)  # [n, span, vocab]
    cache = _dc.replace(
        cache, lengths=cache.lengths.at[seq_slots].set(lens + span),
    )
    return cache, logits


def rollback(cache, seq_slots, new_lengths):
    """Reset sequence lengths after speculative rejection (page contents
    past the length are dead; later appends overwrite them)."""
    import dataclasses as _dc

    return _dc.replace(
        cache,
        lengths=cache.lengths.at[jnp.asarray(seq_slots, jnp.int32)].set(
            jnp.asarray(new_lengths, jnp.int32)
        ),
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_steps", "mesh", "sampling",
                              "return_logits", "return_presence")
)
def decode_burst(params, cfg: LlamaConfig, cache, seq_slots, tokens,
                 n_steps: int, mesh: Optional[Mesh] = None,
                 sampling=None, key: Optional[jax.Array] = None,
                 presence: Optional[jax.Array] = None,
                 sampling_vecs=None, return_logits: bool = False,
                 return_presence: bool = False):
    """n_steps decode steps fused on-device (one host round trip).

    The per-step host sync (sample -> feed back) costs a device->host round
    trip per token; on TPU the idiomatic serving loop amortizes it by
    scanning N steps on device and reading N tokens back at once — sampling
    included. Pages for all n_steps positions must already be mapped in the
    block tables (Scheduler.ensure_decode_pages). Returns (cache, tokens
    [n_steps, batch]). sampling: a serve.sampling.SamplingParams (static;
    None/greedy -> argmax); key: PRNG key (required for stochastic
    sampling), folded per step; presence: optional [batch, vocab] bool
    context mask for the repetition penalty, updated on-device as tokens
    are sampled; sampling_vecs: optional (temperature, top_p, min_p,
    repetition_penalty) [batch] fp32 arrays for PER-REQUEST sampling in
    one compiled program (temperature 0 rows decode greedily).
    return_presence: also return the burst-final presence rows so a
    pipelined caller can chain the next burst's repetition-penalty state
    on-device without a host round trip (Engine._run_pipelined).
    """
    from mfa_tpu.serve.sampling import (SamplingParams, sample,
                                        sample_dynamic, token_logprobs)

    # The lm_head stays int8 INSIDE the step scan: the r4 "+2.4 ms int8
    # logits matmul" pathology that forced a per-burst bf16
    # materialization here was an artifact of the old per-layer pool
    # scatters (XLA full-pool copies, see _scan_layers_deferred); with
    # the deferred-append decode the fused int8 dot streams half the
    # lm_head bytes and saves 0.49 ms/step at the 1B shape (r5 A/B:
    # 4.53 dequant-per-burst vs 4.04 int8-in-scan).
    sampling = sampling or SamplingParams()
    if key is None:
        # Greedy (and per-request vecs with all-greedy rows) never consumes
        # randomness; for stochastic sampling a missing key would silently
        # reuse one fixed stream every burst (correlated generations).
        if not sampling.greedy or sampling_vecs is not None:
            raise ValueError(
                "decode_burst: stochastic sampling (or per-request "
                "sampling_vecs) requires an explicit PRNG key")
        key = jax.random.key(0)  # dead: greedy takes argmax

    def body(carry, i):
        cache, toks, pres = carry
        cache, logits = decode_step(params, cfg, cache, seq_slots, toks,
                                    mesh=mesh)
        if sampling_vecs is not None:  # per-request knobs (one program)
            temp, tp, mp, pen = sampling_vecs
            nxt = sample_dynamic(logits, jax.random.fold_in(key, i),
                                 temp, tp, mp, pen,
                                 top_k=sampling.top_k, presence=pres)
        else:
            nxt = sample(logits, jax.random.fold_in(key, i), sampling, pres)
        if pres is not None:  # track the new token for repetition penalty
            pres = pres.at[jnp.arange(pres.shape[0]), nxt].set(True)
        ys = (nxt, token_logprobs(logits, nxt))
        if return_logits:  # speculative draft: full per-step distributions
            ys = ys + (logits,)
        return (cache, nxt, pres), ys

    (cache, _, pres_final), ys = jax.lax.scan(
        body, (cache, tokens, presence), jnp.arange(n_steps)
    )
    extra = (pres_final,) if return_presence else ()
    if return_logits:
        out, lps, logits_all = ys
        return (cache, out, lps, logits_all) + extra
    out, lps = ys
    return (cache, out, lps) + extra


@functools.partial(jax.jit, static_argnames=("cfg", "draft_cfg", "k",
                                             "n_iters", "mesh"))
def speculative_burst(params, draft_params, cfg: LlamaConfig,
                      draft_cfg: LlamaConfig, cache, draft_cache,
                      seq_slots, tokens, k: int, n_iters: int,
                      mesh: Optional[Mesh] = None):
    """n_iters GREEDY speculative iterations fused on device (one host
    sync for the whole burst; the host-stepped loop pays 2+ tunnel RTTs
    per ~k tokens — measured 65 ms/iteration vs ~6 ms of compute at the
    4-layer slice shape).

    Each iteration: the draft proposes k tokens (decode_burst on the
    draft cache), the target verifies the span in ONE forward
    (verify_step), greedy acceptance (longest draft==target-argmax
    prefix, the Leviathan rule's deterministic case) and the rollback
    lengths reset both run ON DEVICE. Output is bit-identical to plain
    greedy decoding of the target model.

    Page budget: both caches grow by AT MOST k per iteration (rollback
    reclaims rejected rows), so the caller must have n_iters * k
    positions mapped past each row's current length.

    Returns (cache, draft_cache, t_out [n_iters, n, k] emitted tokens,
    lps [n_iters, n, k] their target logprobs, n_emit [n_iters, n]
    valid counts per iteration — entries past n_emit are junk — and
    m [n_iters, n] accepted-draft counts for the acceptance stats).
    """
    from mfa_tpu.serve.sampling import token_logprobs

    n = tokens.shape[0]

    def body(carry, _):
        cache, dcache, toks = carry  # toks: last emitted, KV not stored
        dcache, d_toks, _ = decode_burst(draft_params, draft_cfg, dcache,
                                         seq_slots, toks, k, mesh=mesh)
        d = d_toks.T  # [n, k] proposals d_1..d_k
        feed = jnp.concatenate([toks[:, None], d[:, :-1]], axis=1)
        base = cache.lengths[seq_slots]  # L0 (== total_len - 1)
        cache, logits = verify_step(params, cfg, cache, seq_slots, feed,
                                    mesh=mesh)  # [n, k, vocab]
        a = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [n, k]
        eq = (d == a)
        m = jnp.sum(jnp.cumprod(eq.astype(jnp.int32), axis=1), axis=1)
        n_emit = jnp.where(m < k, m + 1, k)  # [n]
        pos = jnp.arange(k, dtype=jnp.int32)[None]
        # emitted stream: accepted draft prefix, then the target's
        # correction token at index m (entries past n_emit are junk)
        t_out = jnp.where(pos < m[:, None], d, a)
        lps = token_logprobs(
            logits.reshape(n * k, -1), t_out.reshape(-1)
        ).reshape(n, k)
        # device rollback: junk rows past the new length are dead and
        # get overwritten by the next iteration's appends
        new_lens = base + n_emit
        cache = dataclasses.replace(
            cache, lengths=cache.lengths.at[seq_slots].set(new_lens))
        dcache = dataclasses.replace(
            dcache, lengths=dcache.lengths.at[seq_slots].set(new_lens))
        toks_next = jnp.take_along_axis(
            t_out, (n_emit - 1)[:, None], axis=1)[:, 0]
        return (cache, dcache, toks_next), (t_out, lps, n_emit, m)

    (cache, draft_cache, _), (t_out, lps, n_emit, m) = jax.lax.scan(
        body, (cache, draft_cache, tokens), None, length=n_iters)
    return cache, draft_cache, t_out, lps, n_emit, m
