"""Flash prefill for image-block ("bidirectional run") attention masks.

Gemma3 multimodal prompts attend with
    visible(row, col) = (causal AND window)(row, col)
                        OR same_image_run(row, col)
(transformers' token_type_ids or-mask). The reference framework has no
multimodal path at all; mfa_tpu previously served these prompts through a
dense jnp attention (llama._attention_dense_masked) — an O(s^2) fp32
score tensor per layer, which at batch 16 x s 2048 materializes ~8.6 GB
and dwarfs the flash path's VMEM-resident tiles.

This kernel brings the image-block mask into the flash tiling. The mask
is dynamic (depends on where <image> runs sit in each prompt), so the
causal triangular-grid pruning of kernels/prefill.py cannot be static;
instead per-(batch, q-block) KV block bounds are SCALAR-PREFETCHED
(the design vocabulary of kernels/varlen.py): the wrapper computes, with
cheap [b, s] jnp ops,

    kv_last[b, i]  = max over rows r of block i of run_end(r)   (>= r)
    kv_first[b, i] = min over rows of min(row - window_left, run_start(r))

and the grid runs only blocks in [kv_first, kv_last] — everything above
a row's image run stays pruned exactly like static causal pruning, and
bidirectional cells above the diagonal are enumerated only where an
image run actually crosses a tile boundary.

Every running cell applies the full mask (the or-mask can cut through
any tile); image prompts are latency-bound on the vision tower, not this
kernel, so no mask-free fast path is carved out.
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
    choose_prefill_config,
    default_interpret,
    round_up,
    softmax_scale_default,
)

_LOG2E = math.log2(math.e)
_MASK = -1e30


def _kernel(
    first_ref,  # scalar prefetch [b, nq] int32: first kv block of (b, i)
    last_ref,  # scalar prefetch [b, nq] int32: last kv block of (b, i)
    q_ref,  # [1, 1, bq, d]
    k_ref,  # [1, 1, bk, d]
    v_ref,  # [1, 1, bk, d]
    bid_q_ref,  # [1, bq, 1] int32 image-run id of each q row (-1 = text)
    bid_k_ref,  # [1, 1, bk] int32 image-run id of each kv col
    o_ref,  # [1, 1, bq, d]
    m_scr,
    l_scr,
    acc_scr,
    *,
    scale_log2e: float,
    block_q: int,
    block_k: int,
    window_left: int,
):
    b = pl.program_id(0)
    i = pl.program_id(2)
    j = pl.program_id(3)
    first_j = first_ref[b, i]
    last_j = last_ref[b, i]

    @pl.when(j == first_j)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _MASK)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(jnp.logical_and(j >= first_j, j <= last_j))
    def _step():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        row = jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), 0) + i * block_q
        col = jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1) + j * block_k
        vis = col <= row
        if window_left >= 0:
            vis = jnp.logical_and(vis, col >= row - window_left)
        bq_id = bid_q_ref[0, :, :1]  # [bq, 1]
        bk_id = bid_k_ref[0, :1, :]  # [1, bk]
        # bidirectional within an image run OVERRIDES causal+window
        # (transformers or-mask); text rows carry id -1 and never match
        # because image ids are >= 0.
        vis = jnp.logical_or(
            vis, jnp.logical_and(bq_id == bk_id, bq_id >= 0))
        s = jnp.where(vis, s, _MASK)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_next = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp2((m_prev - m_next) * scale_log2e)
        # subtract-first: `s*c - m*c` FMA-contracts and its rounding
        # residual explodes exp2 to inf on fully-masked rows
        # (see kernels/prefill.py:_online_update)
        p = jnp.exp2((s - m_next[:, :1]) * scale_log2e)
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        v = v_ref[0, 0]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    @pl.when(j == last_j)
    def _store():
        l = l_scr[:, :1]
        # every row sees at least itself (causal diagonal), so the only
        # guard needed is the NaN-input one
        l_safe = jnp.where(jnp.logical_or(l == 0.0, jnp.isnan(l)), 1.0, l)
        o_ref[0, 0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)


def image_run_bounds(block_ids: jax.Array):
    """Per-token run extents from [b, s] image-run ids (-1 = text).

    Returns (run_start, run_end) [b, s] int32: for image tokens the first
    and last index of their contiguous run; for text tokens the token's
    own index (pure causal). Runs are contiguous by construction
    (models/vision.py:image_block_ids)."""
    b, s = block_ids.shape
    idx = jnp.arange(s, dtype=jnp.int32)[None]
    is_img = block_ids >= 0
    prev = jnp.pad(block_ids, ((0, 0), (1, 0)), constant_values=-1)[:, :-1]
    nxt = jnp.pad(block_ids, ((0, 0), (0, 1)), constant_values=-1)[:, 1:]
    starts = jnp.logical_and(is_img, prev != block_ids)
    ends = jnp.logical_and(is_img, nxt != block_ids)
    run_start = jax.lax.cummax(jnp.where(starts, idx, -1), axis=1)
    run_end = jax.lax.cummin(
        jnp.where(ends, idx, s), axis=1, reverse=True)
    run_start = jnp.where(is_img, run_start, idx)
    run_end = jnp.where(is_img, run_end, idx)
    return run_start, run_end


@functools.partial(
    jax.jit,
    static_argnames=("softmax_scale", "window_left", "block_q", "block_k",
                     "interpret"),
)
def image_block_prefill(
    q: jax.Array,  # [b, hq, s, d]
    k: jax.Array,  # [b, hkv, s, d]
    v: jax.Array,
    block_ids: jax.Array,  # [b, s] int32: image-run id, -1 for text
    *,
    softmax_scale: Optional[float] = None,
    window_left: int = -1,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Flash attention with mask (causal AND window) OR same-image-run.

    Equal q/k lengths, top-left aligned (the multimodal prefill layout);
    GQA folded in the K/V index maps. Numerically the flash tiling of
    llama._attention_dense_masked's mask algebra.
    """
    batch, num_heads, sq, head_dim = q.shape
    _, num_kv_heads, sk, _ = k.shape
    assert sq == sk, "image-block prefill is whole-prompt (sq == sk)"
    group = num_heads // num_kv_heads
    if softmax_scale is None:
        softmax_scale = softmax_scale_default(head_dim)
    if interpret is None:
        interpret = default_interpret()

    cfg = choose_prefill_config(sq, sk, head_dim, q.dtype.itemsize)
    bq = block_q or cfg.block_q
    bk = block_k or cfg.block_k
    bq = min(bq, round_up(sq, 8))
    bk = min(bk, round_up(sk, 128))
    # q and kv pad independently to their own block multiples (row/col
    # offsets in the mask are absolute, so unequal padded lengths are
    # fine — same scheme as kernels/prefill.py)
    sq_p = round_up(sq, bq)
    sk_p = round_up(sk, bk)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    if sk_p != sk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
    bid_q = jnp.pad(block_ids, ((0, 0), (0, sq_p - sq)),
                    constant_values=-1)
    bid_k = jnp.pad(block_ids, ((0, 0), (0, sk_p - sk)),
                    constant_values=-1)
    num_q_blocks = sq_p // bq
    num_kv_blocks = sk_p // bk

    # ---- per-(b, q-block) kv block bounds (jnp, O(b*s)) ----
    # Padded q rows are text (-1) with run_end = own index; their bounds
    # are clipped into range and their outputs sliced off below.
    run_start, run_end = image_run_bounds(bid_q)
    rows = run_end.reshape(batch, num_q_blocks, bq)
    kv_last = jnp.clip(rows.max(axis=2), 0, sk_p - 1) // bk  # [b, nq]
    if window_left >= 0:
        idx = jnp.arange(sq_p, dtype=jnp.int32)[None]
        lo = jnp.minimum(jnp.maximum(idx - window_left, 0), run_start)
        kv_first = jnp.maximum(
            lo.reshape(batch, num_q_blocks, bq).min(axis=2), 0) // bk
    else:
        kv_first = jnp.zeros((batch, num_q_blocks), jnp.int32)
    kv_first = jnp.minimum(kv_first.astype(jnp.int32),
                           kv_last.astype(jnp.int32))
    kv_last = kv_last.astype(jnp.int32)

    bid_rows = bid_q[:, :, None]  # [b, sq_p, 1]
    bid_cols = bid_k[:, None, :]  # [b, 1, sk_p]

    def kv_map(b, h, i, j, first_ref, last_ref):
        return (b, h // group, jnp.clip(j, first_ref[b, i], last_ref[b, i]),
                0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, num_heads, num_q_blocks, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, bq, head_dim),
                         lambda b, h, i, j, f, l: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bk, head_dim), kv_map),
            pl.BlockSpec((1, 1, bk, head_dim), kv_map),
            pl.BlockSpec((1, bq, 1),
                         lambda b, h, i, j, f, l: (b, i, 0)),
            pl.BlockSpec((1, 1, bk),
                         lambda b, h, i, j, f, l:
                         (b, 0, jnp.clip(j, f[b, i], l[b, i]))),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, head_dim),
                               lambda b, h, i, j, f, l: (b, h, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, head_dim), jnp.float32),
        ],
    )
    kern = functools.partial(
        _kernel,
        scale_log2e=float(softmax_scale) * _LOG2E,
        block_q=bq, block_k=bk, window_left=window_left,
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_heads, sq_p, head_dim), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * batch * num_heads * sq * sk * head_dim * 0.5),
            bytes_accessed=int(
                q.size * q.dtype.itemsize * 3),
            transcendentals=int(batch * num_heads * sq * sk * 0.5),
        ),
        interpret=interpret,
    )(kv_first, kv_last, q, k, v, bid_rows, bid_cols)
    return out[:, :, :sq]
