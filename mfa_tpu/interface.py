"""Public API — reference-compatible entry points.

Re-creates the three public functions of the reference
(mini_flash_attention/interface.py:6-124) with jnp arrays and the same
shape/semantic contract (GQA rules, causal alignment, cu_seqlens varlen,
paged KV via block_table, split-KV decoding), plus TPU-first extensions:
softmax_scale / sliding-window overrides, quantized KV caches, and sharded
execution (see mfa_tpu.shard).

Layout note: the public functions accept the reference's layouts
([batch, seq, heads, head_dim]; packed [total, heads, head_dim]). Kernels
run on [batch, heads, seq, head_dim], which DMA-streams contiguously on
TPU; the transposes at this boundary are fused by XLA. Serving-path callers
who own their layouts should use mfa_tpu.kernels directly.
"""

from __future__ import annotations

import functools
from typing import Optional, Union

import jax
import jax.numpy as jnp

from mfa_tpu.dispatch.config import validate_attention_inputs
from mfa_tpu.kernels.prefill import prefill_attention

__all__ = [
    "flash_attn_func",
    "flash_attn_varlen_func",
    "flash_attn_with_kvcache",
]


@functools.partial(
    jax.jit, static_argnames=("causal", "softmax_scale", "window_size",
                              "softcap")
)
def flash_attn_func(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    window_size: tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes: Optional[jax.Array] = None,
) -> jax.Array:
    """Flash attention forward pass (reference: interface.py:6-37).

    Supports MQA/GQA by passing K/V with fewer heads than Q; q head h attends
    to kv head h // (nheads // nheads_k).

    Arguments:
        q: (batch_size, seqlen_q, nheads, headdim)
        k: (batch_size, seqlen_k, nheads_k, headdim)
        v: (batch_size, seqlen_k, nheads_k, headdim)
        causal: apply top-left-aligned causal mask.
        softmax_scale: defaults to 1/sqrt(headdim) (extension; the reference
            hardcodes the default, api.cpp:99).
        window_size: (left, right) sliding window, -1 = unbounded (extension;
            present-but-unexposed in the reference, _C.pyi:4-41).
        softcap: > 0 applies a Gemma2-style tanh cap to the attention
            logits (extension; matches flash-attn v2.6's softcap arg).
        alibi_slopes: [nheads] fp32 per-head ALiBi slopes; adds
            -slope * |i - j| to the logits. DELIBERATE DIVERGENCE from
            the official flash-attn argument: positions here are
            TOP-LEFT aligned (matching this API's causal convention),
            while flash-attn bottom-right-aligns when seqlen_q !=
            seqlen_k; per-batch (batch, nheads) slopes are not accepted.

    Return:
        out: (batch_size, seqlen_q, nheads, headdim)
    """
    validate_attention_inputs(q, k, v, api_name="flash_attn_func")
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    out = prefill_attention(
        qt,
        kt,
        vt,
        causal=causal,
        softmax_scale=softmax_scale,
        window_size=tuple(window_size),
        logit_softcap=float(softcap),
        alibi_slopes=alibi_slopes,
    )
    return jnp.swapaxes(out, 1, 2)


@functools.partial(
    jax.jit,
    static_argnames=("max_seqlen_q", "max_seqlen_k", "causal",
                     "softmax_scale", "softcap", "window_size",
                     "sink_tokens"),
)
def flash_attn_varlen_func(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    cu_seqlens_q,
    cu_seqlens_k,
    max_seqlen_q: int,
    max_seqlen_k: int,
    causal: bool = False,
    block_table: Optional[jax.Array] = None,
    softmax_scale: Optional[float] = None,
    softcap: float = 0.0,
    alibi_slopes: Optional[jax.Array] = None,
    window_size: tuple[int, int] = (-1, -1),
    sink_tokens: int = 0,
) -> jax.Array:
    """Varlen (continuous batching) attention (reference: interface.py:40-92).

    q: (total_q, nheads, headdim); k/v: (total_k, nheads_k, headdim), or with
    block_table a paged pool (num_pages, page_size, nheads_k, headdim).
    cu_seqlens_*: (batch+1,) int32 cumulative lengths.
    window_size: (left, right) sliding window on sequence-local positions;
    sink_tokens keeps each sequence's first tokens visible through a left
    window (StreamingLLM).
    """
    from mfa_tpu.kernels.varlen import varlen_attention

    return varlen_attention(
        q,
        k,
        v,
        cu_seqlens_q=jnp.asarray(cu_seqlens_q, jnp.int32),
        cu_seqlens_k=jnp.asarray(cu_seqlens_k, jnp.int32),
        max_seqlen_q=int(max_seqlen_q),
        max_seqlen_k=int(max_seqlen_k),
        causal=causal,
        block_table=block_table,
        softmax_scale=softmax_scale,
        logit_softcap=float(softcap),
        alibi_slopes=alibi_slopes,
        window_size=(int(window_size[0]), int(window_size[1])),
        sink_tokens=int(sink_tokens),
    )


def flash_attn_with_kvcache(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    cache_seqlens: Optional[Union[int, jax.Array]] = None,
    block_table: Optional[jax.Array] = None,
    num_splits: int = 0,
    softmax_scale: Optional[float] = None,
    window_size: tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    sink_tokens: int = 0,
    alibi_slopes: Optional[jax.Array] = None,
) -> jax.Array:
    """Decode attention against a KV cache (reference: interface.py:95-124).

    q: (batch_size, 1, nheads, headdim) — seqlen_q must be 1, as in the
    reference (interface.py:116).
    Contiguous cache: k_cache/v_cache (batch_size, max_seqlen_k, nheads_k, d).
    Paged cache: k_cache/v_cache (num_pages, page_size, nheads_k, d) with
    block_table (batch_size, max_pages_per_seq) int32.
    cache_seqlens: int or (batch,) int32 valid KV lengths. The reference
    requires the tensor form in practice (api.cpp:427-433, decode.cuh:26);
    here a python int is broadcast for convenience.
    num_splits: 0 = heuristic (api.cpp:320-322).
    window_size: (left, right) sliding window; only `left` is meaningful
    for decode (the query is the last token) — attend to the final left+1
    tokens. The reference carries these params but never exposes them
    (_C.pyi:4-41); here they are first-class.
    sink_tokens: StreamingLLM attention sinks - with a left window, the
    first k cache tokens stay visible (extension; no reference analog).
    """
    if q.shape[1] != 1:
        raise ValueError(
            "flash_attn_with_kvcache currently only supports seqlen_q=1 for decoding"
        )
    batch = q.shape[0]
    if cache_seqlens is None:
        max_len = (
            block_table.shape[1] * k_cache.shape[1]
            if block_table is not None
            else k_cache.shape[1]
        )
        cache_seqlens = jnp.full((batch,), max_len, jnp.int32)
    elif isinstance(cache_seqlens, int):
        cache_seqlens = jnp.full((batch,), cache_seqlens, jnp.int32)
    else:
        cache_seqlens = jnp.asarray(cache_seqlens, jnp.int32)
    return _kvcache_jit(
        q, k_cache, v_cache, cache_seqlens, block_table, num_splits,
        softmax_scale, int(window_size[0]), float(softcap),
        int(sink_tokens), alibi_slopes
    )


@functools.partial(
    jax.jit, static_argnames=("num_splits", "softmax_scale", "window_left",
                              "softcap", "sink_tokens")
)
def _kvcache_jit(
    q, k_cache, v_cache, cache_seqlens, block_table, num_splits,
    softmax_scale, window_left=-1, softcap=0.0, sink_tokens=0,
    alibi_slopes=None,
):
    from mfa_tpu.kernels.decode import decode_attention, paged_decode_attention

    q3 = q[:, 0]  # [batch, nheads, d]
    if block_table is not None:
        # Paged pool [num_pages, page, hkv, d] -> kernel layout [hkv, pages, page, d]
        k_pages = jnp.transpose(k_cache, (2, 0, 1, 3))
        v_pages = jnp.transpose(v_cache, (2, 0, 1, 3))
        out = paged_decode_attention(
            q3,
            k_pages,
            v_pages,
            cache_seqlens,
            block_table,
            softmax_scale=softmax_scale,
            num_splits=num_splits,
            window_left=window_left,
            logit_softcap=softcap,
            sink_tokens=sink_tokens,
            alibi_slopes=alibi_slopes,
        )
    else:
        kt = jnp.swapaxes(k_cache, 1, 2)  # [batch, hkv, s, d]
        vt = jnp.swapaxes(v_cache, 1, 2)
        out = decode_attention(
            q3,
            kt,
            vt,
            cache_seqlens,
            softmax_scale=softmax_scale,
            num_splits=num_splits,
            window_left=window_left,
            logit_softcap=softcap,
            sink_tokens=sink_tokens,
            alibi_slopes=alibi_slopes,
        )
    return out[:, None]  # [batch, 1, nheads, d]
