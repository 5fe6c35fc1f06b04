"""HuggingFace Llama/Mistral checkpoint -> mfa_tpu params conversion.

The reference is a kernel library with no model weights story; a serving
framework needs one. `from_hf` maps a transformers `LlamaForCausalLM` /
`MistralForCausalLM` (or its state dict) onto the mfa_tpu params pytree +
LlamaConfig, so real checkpoints serve through the engine. The mapping is
pure numpy (torch CPU tensors in, jnp arrays out) and is validated
end-to-end against transformers' own forward in tests/test_hf_convert.py —
which also pins our RoPE/RMSNorm/GQA conventions to the reference
implementation's numerics.

Weight layout notes:
- HF Linear weights are [out, in]; mfa_tpu uses [in, out] -> transpose.
- HF attention projections are per-model-dim; head ordering matches our
  kvh-major [h // group] GQA fold, so no permutation is needed.
- RoPE: both use the rotate-half (NeoX) convention with theta from config.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from mfa_tpu.models.llama import LlamaConfig, Params


def _np(t) -> np.ndarray:
    """torch tensor / array-like -> float32 numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, np.float32)


def _min_period(flags: tuple) -> tuple:
    """Smallest repeating period of a boolean per-layer pattern."""
    n = len(flags)
    for p in range(1, n + 1):
        if n % p == 0 and flags == flags[:p] * (n // p):
            return flags[:p]
    return flags


def config_from_hf(hf_config) -> LlamaConfig:
    model_type = getattr(hf_config, "model_type", "llama")
    heads = hf_config.num_attention_heads
    hd = getattr(hf_config, "head_dim", None)
    act = (getattr(hf_config, "hidden_activation", None)
           or getattr(hf_config, "hidden_act", "silu"))
    is_gemma = str(model_type).startswith("gemma")
    # Qwen2 configs carry sliding_window but gate it behind
    # use_sliding_window (default off).
    sliding_window = getattr(hf_config, "sliding_window", None)
    if not getattr(hf_config, "use_sliding_window", True):
        sliding_window = None
    # Per-layer attention types (Gemma2 pairs, Gemma3 5-local+1-global):
    # derive the smallest repeating sliding/global period.
    layer_types = getattr(hf_config, "layer_types", None)
    layer_pattern = None
    if layer_types and sliding_window:
        flags = tuple(t == "sliding_attention" for t in layer_types)
        if any(flags) and not all(flags):
            layer_pattern = _min_period(flags)
        elif not any(flags):
            sliding_window = None  # no sliding layers at all
    elif sliding_window and getattr(hf_config, "sliding_window_pattern",
                                    None):
        # older Gemma3 configs: every p-th layer is global
        per = int(hf_config.sliding_window_pattern)
        if per > 1:
            layer_pattern = (True,) * (per - 1) + (False,)
    is_gemma3 = model_type in ("gemma3", "gemma3_text")
    # rope_scaling: linear position interpolation is supported (Gemma3's
    # global layers ship factor 8); anything else must not be silently
    # dropped — refuse loudly.
    rope_scale = 1.0
    rs = getattr(hf_config, "rope_scaling", None)
    if rs:
        rs = dict(rs)
        rtype = rs.get("rope_type", rs.get("type", "default"))
        if rtype == "linear":
            rope_scale = float(rs.get("factor", 1.0))
        elif rtype not in ("default", None):
            raise NotImplementedError(
                f"rope_scaling type {rtype!r} is not supported")
    return LlamaConfig(
        vocab_size=hf_config.vocab_size,
        dim=hf_config.hidden_size,
        n_layers=hf_config.num_hidden_layers,
        n_heads=heads,
        n_kv_heads=getattr(hf_config, "num_key_value_heads", heads) or heads,
        ffn_dim=hf_config.intermediate_size,
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        norm_eps=hf_config.rms_norm_eps,
        dtype=jnp.bfloat16,
        sliding_window=sliding_window,
        head_dim_override=(hd if hd and hd != hf_config.hidden_size // heads
                           else None),
        # Qwen2 hardcodes q/k/v bias in its attention module; other families
        # expose it as `attention_bias`.
        qkv_bias=(model_type == "qwen2"
                  or bool(getattr(hf_config, "attention_bias", False))),
        hidden_act="gelu_tanh" if "gelu" in str(act) else "silu",
        norm_offset=is_gemma,
        embed_scale=is_gemma,
        logit_softcap=getattr(hf_config, "final_logit_softcapping", None),
        # Gemma2: attention softcap, query_pre_attn_scalar softmax scale,
        # post-norms on attn/mlp outputs, alternating sliding/global layers
        attn_softcap=getattr(hf_config, "attn_logit_softcapping", None),
        query_scale=(float(qpas) ** -0.5 if (qpas := getattr(
            hf_config, "query_pre_attn_scalar", None)) else None),
        post_norms=(model_type == "gemma2" or is_gemma3),
        qk_norm=(model_type in ("qwen3", "qwen3_moe") or is_gemma3),
        alt_window=(model_type == "gemma2"
                    and getattr(hf_config, "sliding_window", None)
                    is not None),
        layer_pattern=layer_pattern,
        rope_theta_local=getattr(hf_config, "rope_local_base_freq", None),
        rope_scale=rope_scale,
        # MoE: Mixtral uses num_local_experts, Qwen3-MoE uses num_experts
        n_experts=(getattr(hf_config, "num_local_experts", 0)
                   or getattr(hf_config, "num_experts", 0) or 0),
        n_active_experts=getattr(hf_config, "num_experts_per_tok", 2) or 2,
        moe_ffn_dim=getattr(hf_config, "moe_intermediate_size", None),
        norm_topk=bool(getattr(hf_config, "norm_topk_prob", True)),
    )


def from_hf(model_or_state_dict, hf_config=None,
            dtype=jnp.bfloat16) -> Tuple[Params, LlamaConfig]:
    """Convert a transformers causal-LM (or its state_dict + config).

    Returns (params, cfg) ready for llama.forward / the serving Engine.
    """
    if hasattr(model_or_state_dict, "state_dict"):
        sd = model_or_state_dict.state_dict()
        hf_config = hf_config or model_or_state_dict.config
    else:
        sd = model_or_state_dict
        if hf_config is None:
            raise ValueError("state_dict input requires hf_config")
    cfg = dataclasses.replace(config_from_hf(hf_config), dtype=dtype)

    def w(name):  # [out, in] -> [in, out]
        return jnp.asarray(_np(sd[name]).T, dtype)

    layers = dict(
        wq=[], wk=[], wv=[], wo=[], attn_norm=[], mlp_norm=[],
    )
    if cfg.n_experts:
        layers.update(w_router=[], we_gate=[], we_up=[], we_down=[])
    else:
        layers.update(w_gate=[], w_up=[], w_down=[])
    if cfg.qkv_bias:
        layers.update(bq=[], bk=[], bv=[])
    if cfg.post_norms:
        layers.update(post_attn_norm=[], post_mlp_norm=[])
    if cfg.qk_norm:
        layers.update(q_norm=[], k_norm=[])
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        layers["wq"].append(w(p + "self_attn.q_proj.weight"))
        layers["wk"].append(w(p + "self_attn.k_proj.weight"))
        layers["wv"].append(w(p + "self_attn.v_proj.weight"))
        if cfg.qk_norm:
            layers["q_norm"].append(jnp.asarray(
                _np(sd[p + "self_attn.q_norm.weight"]), jnp.float32))
            layers["k_norm"].append(jnp.asarray(
                _np(sd[p + "self_attn.k_norm.weight"]), jnp.float32))
        if cfg.qkv_bias:
            layers["bq"].append(
                jnp.asarray(_np(sd[p + "self_attn.q_proj.bias"]), dtype))
            layers["bk"].append(
                jnp.asarray(_np(sd[p + "self_attn.k_proj.bias"]), dtype))
            layers["bv"].append(
                jnp.asarray(_np(sd[p + "self_attn.v_proj.bias"]), dtype))
        layers["wo"].append(w(p + "self_attn.o_proj.weight"))
        if cfg.n_experts:
            if p + "block_sparse_moe.gate.weight" in sd:
                # Mixtral: block_sparse_moe.gate + experts.N.{w1,w3,w2}
                layers["w_router"].append(jnp.asarray(
                    _np(sd[p + "block_sparse_moe.gate.weight"]).T,
                    jnp.float32))
                ep = p + "block_sparse_moe.experts."
                layers["we_gate"].append(jnp.stack(
                    [w(f"{ep}{e}.w1.weight") for e in range(cfg.n_experts)]))
                layers["we_up"].append(jnp.stack(
                    [w(f"{ep}{e}.w3.weight") for e in range(cfg.n_experts)]))
                layers["we_down"].append(jnp.stack(
                    [w(f"{ep}{e}.w2.weight") for e in range(cfg.n_experts)]))
            else:
                # Qwen3-MoE: mlp.gate + mlp.experts.N.{gate,up,down}_proj
                layers["w_router"].append(jnp.asarray(
                    _np(sd[p + "mlp.gate.weight"]).T, jnp.float32))
                ep = p + "mlp.experts."
                layers["we_gate"].append(jnp.stack(
                    [w(f"{ep}{e}.gate_proj.weight")
                     for e in range(cfg.n_experts)]))
                layers["we_up"].append(jnp.stack(
                    [w(f"{ep}{e}.up_proj.weight")
                     for e in range(cfg.n_experts)]))
                layers["we_down"].append(jnp.stack(
                    [w(f"{ep}{e}.down_proj.weight")
                     for e in range(cfg.n_experts)]))
        else:
            layers["w_gate"].append(w(p + "mlp.gate_proj.weight"))
            layers["w_up"].append(w(p + "mlp.up_proj.weight"))
            layers["w_down"].append(w(p + "mlp.down_proj.weight"))
        def norm(name):
            return jnp.asarray(_np(sd[p + name + ".weight"]), jnp.float32)

        layers["attn_norm"].append(norm("input_layernorm"))
        if cfg.post_norms:
            # Gemma2: post_attention_layernorm normalizes the attention
            # OUTPUT; the MLP input norm is pre_feedforward_layernorm
            layers["post_attn_norm"].append(norm("post_attention_layernorm"))
            layers["mlp_norm"].append(norm("pre_feedforward_layernorm"))
            layers["post_mlp_norm"].append(norm("post_feedforward_layernorm"))
        else:
            layers["mlp_norm"].append(norm("post_attention_layernorm"))
    stacked = {k: jnp.stack(v) for k, v in layers.items()}

    embed = jnp.asarray(_np(sd["model.embed_tokens.weight"]), dtype)
    if "lm_head.weight" in sd:
        lm_head = jnp.asarray(_np(sd["lm_head.weight"]).T, dtype)
    else:  # tied embeddings
        lm_head = embed.T
    params: Params = dict(
        embed=embed,
        final_norm=jnp.asarray(_np(sd["model.norm.weight"]), jnp.float32),
        lm_head=lm_head,
        layers=stacked,
    )
    return params, cfg
