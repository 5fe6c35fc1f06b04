"""Sharded attention: TP over heads, DP over batch, CP over KV length.

The reference has zero distributed code (SURVEY.md §2.8); these wrappers are
the TPU-native scaling layer. All of them are `shard_map`s over a named
mesh; XLA inserts the collectives and overlaps them with compute via its
latency-hiding scheduler.

Three strategies:
- `sharded_flash_attn`: prefill with Q/KV heads sharded on "model" and batch
  on "data". GQA keeps each q-head group co-located with its kv head, so
  attention itself needs **zero** communication.
- `sharded_paged_decode`: decode with the paged KV-cache tensor-sharded by
  kv head on "model" and requests on "data" — also zero-communication; this
  is the serving-path default.
- `context_parallel_decode`: KV *length* sharded on "ctx". Each chip runs
  the split-KV decode kernel on its local shard (returning normalized
  partial O + LSE) and partials merge with a max-normalized LSE combine via
  pmax/psum — the reference's split-KV combine algebra (decode.cuh:718-747)
  lifted from "splits within one chip" to "shards across chips"
  (SURVEY.md §2.8). Communication is O(heads*head_dim) per sequence — tiny
  vs all-gathering KV.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mfa_tpu.shard.mesh import CTX_AXIS, DATA_AXIS, MODEL_AXIS

try:  # jax>=0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def cross_chip_lse_combine(o, lse, axis: str):
    """Max-normalized cross-chip merge of per-shard partial attention
    (o fp32 [..., d], lse fp32 [...]) over mesh axis `axis` — the split-KV
    combine algebra (reference decode.cuh:718-747) lifted across ICI.
    Guards: all-(-inf) rows (no shard saw a visible column) produce zeros;
    a shard's empty partials get weight 0, not NaN. The single definition
    shared by the CP decode paths (ring.py's _merge is the two-operand
    pairwise form of the same algebra for rotating schedules)."""
    m = jax.lax.pmax(lse, axis)
    m = jnp.where(jnp.isinf(m) & (m < 0), 0.0, m)
    w = jnp.exp(lse - m)
    w = jnp.where(jnp.isnan(w), 0.0, w)
    denom = jax.lax.psum(w, axis)
    denom = jnp.where(denom == 0.0, 1.0, denom)
    return jax.lax.psum(o * w[..., None], axis) / denom[..., None]


def sharded_flash_attn(
    mesh: Mesh,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    window_size: tuple[int, int] = (-1, -1),
    data_axis: str = DATA_AXIS,
    model_axis: str = MODEL_AXIS,
):
    """Head+batch-sharded prefill. Returns f(q, k, v) on the reference
    [batch, seq, heads, head_dim] layout with heads sharded on model_axis
    and batch on data_axis. The MODEL AXIS SIZE MUST DIVIDE n_kv_heads
    (each shard keeps whole GQA groups co-located; shard_map rejects a
    non-divisible KV head axis)."""
    from mfa_tpu.interface import flash_attn_func

    qkv_spec = P(data_axis, None, model_axis, None)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec),
        out_specs=qkv_spec,
        check_vma=False,
    )
    def _fn(q, k, v):
        return flash_attn_func(
            q, k, v, causal=causal, softmax_scale=softmax_scale,
            window_size=window_size,
        )

    return jax.jit(_fn)


def sharded_paged_decode(
    mesh: Mesh,
    softmax_scale: Optional[float] = None,
    quantized=False,  # False | True (int8/fp8) | "int4"
    data_axis: str = DATA_AXIS,
    model_axis: str = MODEL_AXIS,
):
    """KV-head (TP) + request (DP) sharded paged decode.

    f(q, k_pages, v_pages, lengths, block_table[, k_scales, v_scales]):
      q:            [batch, num_heads, d]   P(data, model, None)
      k/v_pages:    [hkv, pages, page, d]   P(model, None, None, None)
      k/v_scales:   [hkv, pages, page]      P(model, None, None)
                    (pass quantized=True and provide both)
      lengths:      [batch]                 P(data)
      block_table:  [batch, pages_per_seq]  P(data, None)
    Zero communication: each chip owns whole kv heads and whole requests.
    """
    from mfa_tpu.kernels.paged import paged_attention

    page_spec = P(model_axis, None, None, None)
    scale_spec = P(model_axis, None, None)
    in_specs = [
        P(data_axis, model_axis, None),
        page_spec,
        page_spec,
        P(data_axis),
        P(data_axis, None),
    ]
    qd = quantized if isinstance(quantized, str) else None
    if quantized:
        in_specs += [scale_spec, scale_spec]

        def _fn(q, k_pages, v_pages, lengths, block_table, k_scales, v_scales):
            return paged_attention(
                q, k_pages, v_pages, lengths, block_table,
                k_scales=k_scales, v_scales=v_scales,
                softmax_scale=softmax_scale, quant_dtype=qd,
            )
    else:

        def _fn(q, k_pages, v_pages, lengths, block_table):
            return paged_attention(
                q, k_pages, v_pages, lengths, block_table,
                softmax_scale=softmax_scale,
            )

    wrapped = shard_map(
        _fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P(data_axis, model_axis, None),
        check_vma=False,
    )
    return jax.jit(wrapped)


def context_parallel_decode(
    mesh: Mesh,
    softmax_scale: Optional[float] = None,
    num_splits: int = 0,
    ctx_axis: str = CTX_AXIS,
):
    """KV-length-sharded (context-parallel) decode with cross-chip LSE combine.

    f(q, k_cache, v_cache, lengths):
      q:       [batch, num_heads, d]        replicated on ctx
      k/v:     [batch, hkv, max_seq, d]     P(None, None, ctx, None)
      lengths: [batch] int32 global lengths (replicated)
    Every chip computes decode over its KV shard; partial (O, LSE) merge via
    pmax/psum — same algebra as the in-chip split-KV combine.
    """
    from mfa_tpu.kernels.decode import decode_attention

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(),
            P(None, None, ctx_axis, None),
            P(None, None, ctx_axis, None),
            P(),
        ),
        out_specs=P(),
        check_vma=False,
    )
    def _fn(q, k_shard, v_shard, lengths):
        idx = jax.lax.axis_index(ctx_axis)
        shard_len = k_shard.shape[2]
        local_start = idx * shard_len
        local_len = jnp.clip(lengths - local_start, 0, shard_len).astype(jnp.int32)
        o, lse = decode_attention(
            q, k_shard, v_shard, local_len,
            softmax_scale=softmax_scale, num_splits=num_splits, return_lse=True,
        )
        out = cross_chip_lse_combine(o.astype(jnp.float32), lse, ctx_axis)
        return out.astype(q.dtype)

    return jax.jit(_fn)


def context_parallel_paged_decode(
    mesh: Mesh,
    softmax_scale: Optional[float] = None,
    quantized=False,  # False | True (int8/fp8) | "int4"
    ctx_axis: str = CTX_AXIS,
):
    """KV-PAGE-POOL-sharded (context-parallel) paged decode.

    Each chip owns a private page pool holding a slice of every sequence's
    KV (the cache manager assigns pages to shards; a sequence's block table
    is per-shard), runs the paged decode kernel on its local shard, and
    partial (O, LSE) merge with the max-normalized combine — the split-KV
    algebra across ICI. This is how a KV cache LARGER THAN ONE CHIP'S HBM
    serves decode: communication is O(heads*head_dim) per sequence vs
    all-gathering pages.

    f(q, k_pages, v_pages, local_lens, local_tables[, k_scales, v_scales]):
      q:            [batch, heads, d]            replicated on ctx
      k/v_pages:    [ctx*hkv? no — [hkv, pages_per_shard, page, d] sharded
                    on the POOL axis] P(None, ctx, None, None)
      local_lens:   [ctx, batch] int32 — this shard's valid KV tokens per
                    sequence, P(ctx, None)
      local_tables: [ctx, batch, pages_per_seq_shard] int32, P(ctx, ...)
    Returns [batch, heads, d] (combined over shards).
    """
    from mfa_tpu.kernels.paged import paged_attention

    in_specs = [
        P(),
        P(None, ctx_axis, None, None),
        P(None, ctx_axis, None, None),
        P(ctx_axis, None),
        P(ctx_axis, None, None),
    ]
    if quantized:
        in_specs += [P(None, ctx_axis, None), P(None, ctx_axis, None)]
    qd = quantized if isinstance(quantized, str) else None

    def _fn(q, kp, vp, lens, tables, *scales):
        kw = (dict(k_scales=scales[0], v_scales=scales[1])
              if scales else {})
        o, lse = paged_attention(
            q, kp, vp, lens[0], tables[0], softmax_scale=softmax_scale,
            return_lse=True, quant_dtype=qd, **kw,
        )
        out = cross_chip_lse_combine(o.astype(jnp.float32), lse, ctx_axis)
        return out.astype(q.dtype)

    wrapped = shard_map(
        _fn, mesh=mesh, in_specs=tuple(in_specs), out_specs=P(),
        check_vma=False,
    )
    return jax.jit(wrapped)
