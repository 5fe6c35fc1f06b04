"""Pallas TPU flash-decoding kernels (seqlen_q == 1).

TPU-native re-design of the reference decode kernels
(csrc/mfa/decode.cuh:523-662 split-KV kernel, decode.cuh:665-755 combine).

Capabilities reproduced:
- seqlen_q == 1 specialization: instead of the reference's per-warp
  vector x matrix dot products (decode.cuh:290-313), all q heads sharing one
  kv head are batched into a [group, head_dim] tile so the contraction still
  feeds the MXU (GQA "commute" trick); decode remains HBM-bandwidth-bound.
- Split-KV ("flash decoding"): the KV length is partitioned over a parallel
  grid axis (reference grid (splits, heads, batch), flash.cu:43-45); each
  split emits a normalized fp32 partial O plus a log-sum-exp, combined by a
  max-normalized LSE reduction (fixing the reference's non-max-normalized
  combine hazard at decode.cuh:723-726, per SURVEY.md §2.5).
- Per-batch KV lengths from an int32 tensor (reference seqlens_k,
  decode.cuh:26,34) — scalar-prefetched so block skipping and DMA clamping
  happen before the kernel body.
- -inf-split skipping in the combine (decode.cuh:610-614, 721-724).

The combine step is pure jnp: it touches O(batch*heads*splits*head_dim)
fp32 values — noise next to streaming the KV cache — and XLA fuses it.
The same combine is reused across chips for context-parallel decode
(mfa_tpu/shard): split-KV within a chip and KV-shards across chips are the
same algebra (SURVEY.md §2.8).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mfa_tpu.dispatch.config import (
    LANES,
    cdiv,
    default_interpret,
    num_splits_heuristic,
    round_up,
    softmax_scale_default,
)

_LOG2E = math.log2(math.e)
_LN2 = math.log(2.0)
_MASK = -1e30


def _decode_kernel(
    lens_ref,  # scalar prefetch: [batch] int32
    *refs,  # q, k, v, [alibi slopes], o, lse, m/l/acc scratch
    scale_log2e: float,
    block_k: int,
    blocks_per_split: int,
    window_left: int,
    softcap: float = 0.0,
    softcap_mul: float = 0.0,
    sinks: int = 0,
    alibi: bool = False,
):
    if alibi:
        (q_ref, k_ref, v_ref, slopes_ref, o_ref, lse_ref,
         m_scr, l_scr, acc_scr) = refs
    else:
        q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr = refs
        slopes_ref = None
    b = pl.program_id(0)
    n = pl.program_id(3)
    s = pl.program_id(2)

    @pl.when(n == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _MASK)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    length = lens_ref[b]
    # Sliding window (reference carries the params but never exposes them,
    # _C.pyi:4-41): the decode row is position length-1, so only columns
    # >= start = length-1-window_left are visible.
    start = (
        jnp.maximum(0, length - 1 - window_left) if window_left >= 0
        else jnp.int32(0)
    )
    global_blk = s * blocks_per_split + n
    in_view = (global_blk + 1) * block_k > start
    if sinks > 0:  # StreamingLLM sink prefix stays visible
        in_view = jnp.logical_or(in_view, global_blk * block_k < sinks)
    run = jnp.logical_and(global_blk * block_k < length, in_view)

    @pl.when(run)
    def _step():
        q = q_ref[0, 0]  # [group_p, d]
        k = k_ref[0, 0]  # [block_k, d]
        sc = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if softcap:
            sc = jnp.tanh(sc * softcap_mul) * softcap  # Gemma2-style softcap
        sc = sc * scale_log2e
        col = (
            jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1) + global_blk * block_k
        )
        if alibi:
            # per-GROUP-ROW slopes, pre-multiplied by log2(e) (sc is in
            # the log2 domain here); the decode row sits at length-1
            sc = sc - slopes_ref[0][:, :1] * jnp.abs(
                (length - 1) - col).astype(jnp.float32)
        visible = col < length
        if window_left >= 0:
            in_win = col >= start
            if sinks > 0:
                in_win = jnp.logical_or(in_win, col < sinks)
            visible = jnp.logical_and(visible, in_win)
        sc = jnp.where(visible, sc, _MASK)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_cur = jnp.max(sc, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(sc - m_next[:, :1])
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next

        v = v_ref[0, 0]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    @pl.when(n == blocks_per_split - 1)
    def _store():
        l = l_scr[:, :1]
        empty = l == 0.0
        l_safe = jnp.where(empty, 1.0, l)
        o_ref[0, 0, 0] = acc_scr[...] / l_safe
        lse = m_scr[:, :1] * _LN2 + jnp.log(l_safe)
        lse = jnp.where(empty, -jnp.inf, lse)
        lse_ref[0, 0, 0] = jnp.broadcast_to(lse, lse_ref.shape[3:])


def combine_splits(o_parts: jax.Array, lse: jax.Array, axis: int = 2,
                   return_lse: bool = False):
    """Max-normalized LSE combine over a splits (or shard) axis.

    o_parts: [..., splits, ..., d] normalized partial outputs (fp32)
    lse:     matching log-sum-exp per partial (-inf = empty split)

    Re-derivation of the reference combine kernel (decode.cuh:729-747) with
    the max subtracted first (SURVEY.md §2.5 hazard note).
    """
    m = jnp.max(lse, axis=axis, keepdims=True)
    m = jnp.where(jnp.isinf(m) & (m < 0), 0.0, m)  # all-empty guard
    w = jnp.exp(lse - m)
    w = jnp.where(jnp.isnan(w), 0.0, w)
    denom = jnp.sum(w, axis=axis, keepdims=True)
    denom = jnp.where(denom == 0.0, 1.0, denom)
    out = jnp.sum(o_parts * jnp.expand_dims(w, -1), axis=axis)
    out = out / jnp.squeeze(denom, axis)[..., None]
    if return_lse:
        lse_g = jnp.squeeze(m, axis) + jnp.log(jnp.squeeze(denom, axis))
        lse_g = jnp.where(
            jnp.all(jnp.isinf(lse) & (lse < 0), axis=axis), -jnp.inf, lse_g
        )
        return out, lse_g
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "softmax_scale", "num_splits", "block_k", "window_left",
        "return_lse", "interpret", "logit_softcap", "sink_tokens"
    ),
)
def decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    cache_seqlens: jax.Array,
    *,
    softmax_scale: Optional[float] = None,
    num_splits: int = 0,
    block_k: int = 2048,
    window_left: int = -1,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
    logit_softcap: float = 0.0,
    sink_tokens: int = 0,
    alibi_slopes: Optional[jax.Array] = None,
):
    """Decode attention against a contiguous per-batch KV cache.

    q: [batch, num_heads, head_dim]
    k_cache/v_cache: [batch, num_kv_heads, max_seqlen, head_dim]
    cache_seqlens: [batch] int32 valid lengths.
    window_left: sliding window — attend only to the last window_left+1
    tokens (-1 = unbounded; Mistral-style serving sets W-1).
    Returns [batch, num_heads, head_dim] in q dtype (plus, if return_lse,
    a fp32 [batch, num_heads] log-sum-exp for cross-chip combines).
    """
    batch, num_heads, head_dim = q.shape
    _, num_kv_heads, max_s, _ = k_cache.shape
    group = num_heads // num_kv_heads
    if softmax_scale is None:
        softmax_scale = softmax_scale_default(head_dim)
    if interpret is None:
        interpret = default_interpret()

    # Pick block_k as a DIVISOR of the 128-aligned length: jnp.pad below
    # copies the ENTIRE cache (decode is HBM-bound — a per-step full-cache
    # copy can cost more than the attention read), so only the ragged
    # sub-128 tail may ever force it; 128-aligned caches never pad.
    s_128 = round_up(max_s, 128)
    block_k = max(128, min(block_k, s_128) // 128 * 128)
    while s_128 % block_k:  # terminates: 128 always divides s_128
        block_k -= 128
    s_p = s_128
    if s_p != max_s:
        k_cache = jnp.pad(k_cache, ((0, 0), (0, 0), (0, s_p - max_s), (0, 0)))
        v_cache = jnp.pad(v_cache, ((0, 0), (0, 0), (0, s_p - max_s), (0, 0)))
    num_blocks = s_p // block_k

    if num_splits <= 0:
        num_splits = num_splits_heuristic(batch, num_kv_heads, max_s, block_k)
    num_splits = min(num_splits, num_blocks)
    blocks_per_split = cdiv(num_blocks, num_splits)
    # Re-balance: the last split may be empty if splits don't divide evenly.
    num_splits = cdiv(num_blocks, blocks_per_split)

    group_p = max(8, round_up(group, 8))
    qg = q.reshape(batch, num_kv_heads, group, head_dim)
    if group_p != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, group_p - group), (0, 0)))
    if alibi_slopes is not None:
        if logit_softcap:
            raise ValueError("alibi_slopes and logit_softcap are exclusive")
        # [hkv, group_p, LANES] per-group-row slopes in the log2 domain
        sl = jnp.asarray(alibi_slopes, jnp.float32).reshape(
            num_kv_heads, group) * _LOG2E
        if group_p != group:
            sl = jnp.pad(sl, ((0, 0), (0, group_p - group)))
        slopes_in = jnp.broadcast_to(sl[..., None],
                                     (num_kv_heads, group_p, LANES))

    def kv_index_map(b, h, s, n, lens_ref):
        blk = s * blocks_per_split + n
        last_valid = jnp.maximum(0, (lens_ref[b] + block_k - 1) // block_k - 1)
        if window_left >= 0:
            first_valid = jnp.maximum(0, lens_ref[b] - 1 - window_left) // block_k
        else:
            first_valid = 0
        clipped = jnp.clip(blk, first_valid, last_valid)
        if window_left >= 0 and sink_tokens > 0:
            # sink blocks must fetch their own data, not the clamp target
            clipped = jnp.where(blk * block_k < sink_tokens,
                                jnp.minimum(blk, last_valid), clipped)
        return (b, h, clipped, 0)

    dec_in_specs = [
        pl.BlockSpec((1, 1, group_p, head_dim),
                     lambda b, h, s, n, lens: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, block_k, head_dim), kv_index_map),
        pl.BlockSpec((1, 1, block_k, head_dim), kv_index_map),
    ]
    dec_inputs = [qg, k_cache, v_cache]
    if alibi_slopes is not None:
        dec_in_specs.append(pl.BlockSpec(
            (1, group_p, LANES), lambda b, h, s, n, lens: (h, 0, 0)))
        dec_inputs.append(slopes_in)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch, num_kv_heads, num_splits, blocks_per_split),
        in_specs=dec_in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, 1, 1, group_p, head_dim), lambda b, h, s, n, lens: (b, h, s, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, 1, group_p, LANES), lambda b, h, s, n, lens: (b, h, s, 0, 0)
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((group_p, LANES), jnp.float32),
            pltpu.VMEM((group_p, LANES), jnp.float32),
            pltpu.VMEM((group_p, head_dim), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _decode_kernel,
        scale_log2e=(_LOG2E if logit_softcap
                     else float(softmax_scale) * _LOG2E),
        softcap=float(logit_softcap),
        softcap_mul=(float(softmax_scale) / float(logit_softcap)
                     if logit_softcap else 0.0),
        block_k=block_k,
        blocks_per_split=blocks_per_split,
        window_left=window_left,
        sinks=int(sink_tokens) if window_left >= 0 else 0,
        alibi=alibi_slopes is not None,
    )

    o_parts, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(
                (batch, num_kv_heads, num_splits, group_p, head_dim), jnp.float32
            ),
            jax.ShapeDtypeStruct(
                (batch, num_kv_heads, num_splits, group_p, LANES), jnp.float32
            ),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * batch * num_heads * max_s * head_dim),
            bytes_accessed=int((k_cache.size + v_cache.size) * k_cache.dtype.itemsize),
            transcendentals=int(batch * num_heads * max_s),
        ),
        interpret=interpret,
    )(jnp.asarray(cache_seqlens, jnp.int32), *dec_inputs)

    combined = combine_splits(
        o_parts, lse[..., 0], axis=2, return_lse=return_lse
    )  # [b, hkv, group_p, d]
    if return_lse:
        out, lse_g = combined
        out = out[:, :, :group].reshape(batch, num_heads, head_dim)
        lse_g = lse_g[:, :, :group].reshape(batch, num_heads)
        return out.astype(q.dtype), lse_g
    out = combined[:, :, :group].reshape(batch, num_heads, head_dim)
    return out.astype(q.dtype)


def paged_decode_attention(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    cache_seqlens: jax.Array,
    block_table: jax.Array,
    *,
    softmax_scale: Optional[float] = None,
    num_splits: int = 0,
    window_left: int = -1,
    interpret: Optional[bool] = None,
    logit_softcap: float = 0.0,
    sink_tokens: int = 0,
    alibi_slopes: Optional[jax.Array] = None,
) -> jax.Array:
    """Paged decode attention — see mfa_tpu.kernels.paged for the kernel.

    q: [batch, num_heads, head_dim]
    k_pages/v_pages: [num_kv_heads, num_pages, page_size, head_dim]
    block_table: [batch, pages_per_seq] int32; cache_seqlens: [batch] int32.

    num_splits is accepted for signature parity with the contiguous route
    but is a HINT with no effect here: the paged kernel has no split-KV
    grid dimension — its KV walk is a software-pipelined per-page DMA
    stream and the grid already parallelizes over batch x kv-heads
    (reference api.cpp:269-302 splits only the contiguous layout too).
    """
    from mfa_tpu.kernels.paged import paged_attention

    return paged_attention(
        q,
        k_pages,
        v_pages,
        cache_seqlens,
        block_table,
        softmax_scale=softmax_scale,
        window_left=window_left,
        interpret=interpret,
        logit_softcap=logit_softcap,
        sink_tokens=sink_tokens,
        alibi_slopes=alibi_slopes,
    )
