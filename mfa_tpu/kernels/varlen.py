"""Pallas TPU varlen (packed / continuous-batching) attention.

TPU-native re-design of the reference varlen path
(csrc/mfa/api.cpp:189-267; per-CTA sequence resolution prefill.cuh:19-33).

The reference sizes its CUDA grid for max_seqlen and lets CTAs past a
sequence's real length exit early (prefill.cuh:724-726). A TPU grid is
static and has no early exit, so the design is inverted (SURVEY.md §7 "hard
parts"): the packed token axis is tiled directly, sequence membership is a
*segment-id mask*, and per-q-block KV block bounds are scalar-prefetched so
out-of-segment KV tiles are skipped via `pl.when` with clamped index maps
(no compute, no new DMA).

Masks:
- segment mask: q token and kv token must belong to the same cu_seqlens
  interval (replaces per-CTA base-pointer arithmetic, prefill.cuh:19-33).
- causal: per-sequence-local `col > row` (top-left, prefill.cuh:393-421),
  with local positions carried as side arrays.

Paged K/V (block_table): gathered to packed layout with an XLA gather
before the kernel. Correct for any page size (the reference instead
requires page_block_size >= kBlockN, SURVEY.md §2.4 warning). Prefill is
MXU-bound so the gather copy is off the critical path; an in-kernel DMA
paged variant can replace it later without API change.
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
    round_up,
    softmax_scale_default,
)

_LOG2E = math.log2(math.e)
_LN2 = math.log(2.0)
_MASK = -1e30

from mfa_tpu.kernels.prefill import _lane_partial_sum as _lane_partials  # noqa: E402


def _varlen_kernel(
    kv_first_ref,  # scalar prefetch: [n_q_blocks] int32
    kv_last_ref,  # scalar prefetch: [n_q_blocks] int32
    bits_ref,  # scalar prefetch: [h * n_q_blocks] int32 risky bits
    q_ref,  # [1, bq, d]
    k_ref,  # [1, bk, d]
    v_ref,  # [1, bk, d]
    seg_q_ref,  # [bq, 1] int32
    pos_q_ref,  # [bq, 1] int32
    seg_k_ref,  # [1, bk] int32
    pos_k_ref,  # [1, bk] int32
    *rest,  # [alibi slopes (1, LANES)], o_ref, [lse_ref], m/l/acc scratch
    scale_log2e: float,
    causal: bool,
    n_q_blocks: int,
    block_q: int,
    block_k: int,
    softcap: float = 0.0,
    softcap_mul: float = 0.0,
    alibi: bool = False,
    window_left: int = -1,
    window_right: int = -1,
    sinks: int = 0,
    with_lse: bool = False,
):
    """Packed varlen flash tile, zero-shift fast path (see prefill.py's
    _bound_body for the scheme): safe q blocks run p = exp2(s) with no
    running max and no rescale; blocks whose score range cannot be proven
    inside fp32 exp2 range (risky bit, scalar-prefetched) take the
    embedded classic body. Cells fully INTERIOR to one segment and the
    causal/window band additionally skip the mask build (the varlen analog
    of prefill's needs_mask gating — the reference masks only boundary
    tiles too, prefill.cuh:774-778)."""
    if alibi:
        slopes_ref, *rest = rest
    else:
        slopes_ref = None
    if with_lse:
        o_ref, lse_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
        lse_ref = None
    h = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    risky = bits_ref[h * n_q_blocks + i] != 0

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(
            m_scr, jnp.where(risky, jnp.float32(_MASK), 0.0))
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    first_j = kv_first_ref[i]
    last_j = kv_last_ref[i]
    run = jnp.logical_and(j >= first_j, j <= last_j)

    # Interior test (scalars): one segment covers the whole tile and the
    # causal/window band bounds pass at the tile corners.
    interior = jnp.logical_and(
        seg_q_ref[0, 0] == seg_q_ref[block_q - 1, 0],
        jnp.logical_and(seg_q_ref[0, 0] == seg_k_ref[0, 0],
                        seg_k_ref[0, 0] == seg_k_ref[0, block_k - 1]),
    )
    if causal or window_right >= 0:
        wr = 0 if causal or window_right == 0 else window_right
        interior = jnp.logical_and(
            interior, pos_k_ref[0, block_k - 1] <= pos_q_ref[0, 0] + wr)
    if window_left >= 0:
        interior = jnp.logical_and(
            interior,
            pos_k_ref[0, 0] >= pos_q_ref[block_q - 1, 0] - window_left)

    def _scores():
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if softcap:
            s = jnp.tanh(s * softcap_mul) * softcap  # Gemma2-style softcap
        s = s * scale_log2e
        if alibi:
            # ALiBi on SEGMENT-relative positions (log2-domain slopes)
            s = s - slopes_ref[0, 0, 0] * jnp.abs(
                pos_q_ref[...] - pos_k_ref[...]).astype(jnp.float32)
        return s

    def _mask(s):
        mask = seg_q_ref[...] == seg_k_ref[...]  # [bq, bk] via broadcast
        if causal or window_right == 0:
            mask = jnp.logical_and(mask, pos_k_ref[...] <= pos_q_ref[...])
        elif window_right > 0:
            mask = jnp.logical_and(
                mask, pos_k_ref[...] <= pos_q_ref[...] + window_right)
        if window_left >= 0:
            # sliding window on SEGMENT-relative positions; attention
            # sinks (StreamingLLM) keep the first `sinks` tokens of each
            # sequence visible through the window
            in_win = pos_k_ref[...] >= pos_q_ref[...] - window_left
            if sinks > 0:
                in_win = jnp.logical_or(in_win, pos_k_ref[...] < sinks)
            mask = jnp.logical_and(mask, in_win)
        return jnp.where(mask, s, _MASK)

    def _fast(masked: bool):
        s = _scores()
        if masked:
            s = _mask(s)
        p = jnp.exp2(s)  # zero shift
        ps = _lane_partials(p)
        if ps.shape[1] == 1:
            l_scr[:, :1] = l_scr[:, :1] + ps
        else:
            l_scr[...] = l_scr[...] + ps
        v = v_ref[0]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] + pv

    def _classic():
        s = _mask(_scores())
        m_prev = m_scr[...]
        m_next = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, :1])
        l_scr[...] = alpha * l_scr[...] + _lane_partials(p)
        m_scr[...] = m_next
        v = v_ref[0]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    safe = jnp.logical_not(risky)
    pl.when(jnp.logical_and(run, jnp.logical_and(safe, interior)))(
        lambda: _fast(False))
    pl.when(jnp.logical_and(run, jnp.logical_and(
        safe, jnp.logical_not(interior))))(lambda: _fast(True))
    pl.when(jnp.logical_and(run, risky))(_classic)

    @pl.when(j == last_j)
    def _store():
        l = jnp.sum(l_scr[...], axis=1, keepdims=True)
        # Fully-masked rows (possible when a left window pushes past the
        # end of a SHORTER kv sequence): on the classic path every visited
        # score was _MASK, m stayed at its init and p = 1 polluted l/acc —
        # detect via m. On the fast path masked scores contribute
        # exp2(-huge) = 0 exactly, so l == 0 detects them (m sits at 0,
        # never near _MASK).
        dead = m_scr[:, :1] <= _MASK * 0.5
        bad = jnp.logical_or(dead, jnp.logical_or(l == 0.0, jnp.isnan(l)))
        l_safe = jnp.where(bad, 1.0, l)
        o = acc_scr[...] / l_safe
        o_ref[0] = jnp.where(dead, 0.0, o).astype(o_ref.dtype)
        if with_lse:
            # natural-log LSE of the kernel's score domain (scale-folded
            # raw scores, or capped scores under softcap) — what the
            # backward's P recomputation expects (backward.py:_recompute_p)
            lse = m_scr[:, :1] * _LN2 + jnp.log(l_safe)
            lse = jnp.where(jnp.logical_or(l == 0.0, dead), -jnp.inf, lse)
            lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _segments_from_cu(cu: jax.Array, total: int, pad_to: int, fill: int):
    """Segment ids and in-sequence positions from cumulative lengths.

    Padded tail rows get segment id `fill` (never matches a real segment).
    """
    idx = jnp.arange(pad_to, dtype=jnp.int32)
    seg = jnp.searchsorted(cu[1:-1], idx, side="right").astype(jnp.int32)
    seg = jnp.where(idx < total, seg, fill)
    pos = idx - cu[seg.clip(0, cu.shape[0] - 2)]
    return seg, pos


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_seqlen_q",
        "max_seqlen_k",
        "causal",
        "softmax_scale",
        "block_q",
        "block_k",
        "logit_softcap",
        "interpret",
        "window_size",
        "sink_tokens",
        "return_lse",
    ),
)
def varlen_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    cu_seqlens_q: jax.Array,
    cu_seqlens_k: jax.Array,
    max_seqlen_q: int,
    max_seqlen_k: int,
    causal: bool = False,
    block_table: Optional[jax.Array] = None,
    softmax_scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret: Optional[bool] = None,
    logit_softcap: float = 0.0,
    alibi_slopes: Optional[jax.Array] = None,
    window_size: tuple[int, int] = (-1, -1),
    sink_tokens: int = 0,
    return_lse: bool = False,
) -> jax.Array:
    """Packed varlen attention.

    q: [total_q, num_heads, head_dim]
    k/v: [total_k, num_kv_heads, head_dim], or with block_table a paged pool
         [num_pages, page_size, num_kv_heads, head_dim].
    Returns [total_q, num_heads, head_dim] (and, with return_lse, the
    natural-log softmax LSE [num_heads, total_q] fp32 — flash-attn's varlen
    softmax_lse convention, on both the paged and non-paged routes).
    """
    total_q, num_heads, head_dim = q.shape
    if softmax_scale is None:
        softmax_scale = softmax_scale_default(head_dim)
    if interpret is None:
        interpret = default_interpret()
    batch = cu_seqlens_q.shape[0] - 1
    window_left, window_right = window_size
    if causal:
        window_right = 0
    if sink_tokens and window_left < 0:
        sink_tokens = 0  # without a left window, sinks are a no-op

    if block_table is not None:
        # Paged path: unpack q per sequence and run the in-kernel-DMA paged
        # prefill kernel (kernels/paged_prefill.py) — pages stream straight
        # from HBM, no materialized gather of the pool. Reference causal is
        # top-left per sequence (prefill.cuh:393-421) == q_start 0 here.
        from mfa_tpu.kernels.paged_prefill import paged_prefill_attention

        cu_q = jnp.asarray(cu_seqlens_q, jnp.int32)
        lens_q = (cu_q[1:] - cu_q[:-1]).astype(jnp.int32)
        lens_k = (cu_seqlens_k[1:] - cu_seqlens_k[:-1]).astype(jnp.int32)
        seg, pos = _segments_from_cu(cu_q, total_q, total_q, fill=0)
        q_pad = jnp.zeros(
            (batch, int(max_seqlen_q), num_heads, head_dim), q.dtype
        ).at[seg, pos].set(q)
        # Gather ONLY the batch's pages (the shared pool may be far
        # larger); the kernel then sees a dense remapped table.
        pps = block_table.shape[1]
        flat = jnp.asarray(block_table, jnp.int32).reshape(-1)
        pool = jnp.transpose(k[flat], (2, 0, 1, 3))  # [hkv, b*pps, page, d]
        pool_v = jnp.transpose(v[flat], (2, 0, 1, 3))
        from mfa_tpu.cache.paged_cache import stored_width

        # page rows must be 128-lane padded for the kernel's per-page DMA
        # (hard Mosaic constraint on real TPU; interpret mode is lenient)
        w = stored_width(head_dim)
        if w != pool.shape[-1]:
            wpad = ((0, 0), (0, 0), (0, 0), (0, w - pool.shape[-1]))
            pool = jnp.pad(pool, wpad)
            pool_v = jnp.pad(pool_v, wpad)
        dense_table = jnp.arange(batch * pps, dtype=jnp.int32).reshape(
            batch, pps)
        out4 = paged_prefill_attention(
            q_pad, pool, pool_v, lens_k,
            jnp.zeros((batch,), jnp.int32), dense_table,
            # The paged kernel shares the non-paged band semantics: row r
            # (q_start 0 -> absolute position r) sees columns in
            # [r - window_left, r + window_right]; causal == the
            # window_right 0 band (normalized inside).
            q_lens=lens_q, causal=causal,
            softmax_scale=softmax_scale,
            interpret=interpret, logit_softcap=logit_softcap,
            window_left=window_left, window_right=window_right,
            sink_tokens=sink_tokens,
            alibi_slopes=alibi_slopes,
            return_lse=return_lse,
        )
        if return_lse:
            out4, lse4 = out4  # lse4 [b, h, max_sq]
            # -> flash-attn varlen convention [num_heads, total_q]
            return out4[seg, pos], jnp.transpose(lse4[seg, :, pos])
        return out4[seg, pos]

    total_k, num_kv_heads, _ = k.shape
    lens_k = (cu_seqlens_k[1:] - cu_seqlens_k[:-1]).astype(jnp.int32)
    k_start = jnp.asarray(cu_seqlens_k[:-1], jnp.int32)

    group = num_heads // num_kv_heads
    bq = min(block_q, round_up(total_q, 8))
    bk = min(block_k, round_up(total_k, 128))
    tq_p = round_up(total_q, bq)
    tk_p = round_up(total_k, bk)

    qt = jnp.swapaxes(q, 0, 1)  # [h, total_q, d]
    kt = jnp.swapaxes(k, 0, 1)
    vt = jnp.swapaxes(v, 0, 1)
    if tq_p != total_q:
        qt = jnp.pad(qt, ((0, 0), (0, tq_p - total_q), (0, 0)))
    if tk_p != total_k:
        kt = jnp.pad(kt, ((0, 0), (0, tk_p - total_k), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, tk_p - total_k), (0, 0)))

    n_q_blocks = tq_p // bq
    n_kv_blocks = tk_p // bk

    cu_q = jnp.asarray(cu_seqlens_q, jnp.int32)

    seg_q, pos_q = _segments_from_cu(cu_q, total_q, tq_p, fill=-1)
    cu_k = jnp.asarray(cu_seqlens_k, jnp.int32)
    seg_k, pos_k = _segments_from_cu(cu_k, total_k, tk_p, fill=-2)

    # Per-q-block KV block bounds from the spanned sequences.
    qb_start = jnp.arange(n_q_blocks, dtype=jnp.int32) * bq
    qb_end = jnp.minimum(qb_start + bq - 1, max(total_q - 1, 0))
    seg_first = seg_q[qb_start].clip(0, batch - 1)
    seg_last = seg_q[qb_end].clip(0, batch - 1)
    kv_first_tok = k_start[seg_first]
    if window_left >= 0 and sink_tokens == 0:
        # Tighten with the block's FIRST row's window start, clamped to
        # the first segment's own kv range: when lens_k < lens_q the
        # untightened bound could overshoot into (or past) the NEXT
        # segment's kv range and skip blocks its rows still need. The
        # clamp keeps kv_first <= k_start of every later segment the
        # block spans (mirrors varlen_attention_bwd, backward.py:926).
        kv_first_tok = jnp.minimum(
            kv_first_tok + jnp.maximum(0, pos_q[qb_start] - window_left),
            k_start[seg_first] + jnp.maximum(lens_k[seg_first] - 1, 0))
    kv_first = kv_first_tok // bk
    if causal or window_right >= 0:
        # Last kv token needed by row r is pos_q(r) + window_right within
        # its sequence; bound with the block's last row in its (last)
        # sequence.
        last_pos = pos_q[qb_end] + max(window_right, 0)
        kv_last_tok = k_start[seg_last] + jnp.minimum(
            last_pos, lens_k[seg_last] - 1
        )
    else:
        kv_last_tok = k_start[seg_last] + lens_k[seg_last] - 1
    kv_last = jnp.clip(kv_last_tok, 0, max(total_k - 1, 0)) // bk
    kv_last = jnp.maximum(kv_last, kv_first)

    varlen_extra = []
    if alibi_slopes is not None:
        if logit_softcap:
            raise ValueError("alibi_slopes and logit_softcap are exclusive")
        varlen_extra.append(jnp.broadcast_to(
            (jnp.asarray(alibi_slopes, jnp.float32) * _LOG2E)[:, None, None],
            (num_heads, 8, LANES)))

    # Per-(head, q-block) risky bits for the zero-shift fast path (see
    # prefill._bound_risky): ALiBi shifts scores unboundedly downward ->
    # always classic; softcap bounds |s| by the cap itself -> trace-time
    # constant; otherwise |s| <= |q|max |k|max * scale, one fused norm
    # pass over each of Q and K.
    from mfa_tpu.kernels.prefill import _BOUND_SAFE_LOG2

    scale_l2e = (_LOG2E if logit_softcap else float(softmax_scale) * _LOG2E)
    if alibi_slopes is not None:
        bits = jnp.ones((num_heads * n_q_blocks,), jnp.int32)
    elif logit_softcap:
        const_risky = float(logit_softcap) * _LOG2E > _BOUND_SAFE_LOG2
        bits = jnp.full((num_heads * n_q_blocks,), int(const_risky),
                        jnp.int32)
    else:
        qn = jnp.sqrt(jnp.sum(
            qt.astype(jnp.float32) ** 2, axis=-1))  # [h, tq_p]
        qn_blk = jnp.max(qn.reshape(num_heads, n_q_blocks, bq), axis=-1)
        maxk = jnp.max(jnp.sqrt(jnp.sum(
            kt.astype(jnp.float32) ** 2, axis=-1)), axis=-1)  # [hkv]
        bits = (qn_blk * jnp.repeat(maxk, group)[:, None] * scale_l2e
                > _BOUND_SAFE_LOG2).reshape(-1).astype(jnp.int32)

    def kv_index_map(h, i, j, kv_first_ref, kv_last_ref, bits_ref):
        return (h // group, jnp.clip(j, kv_first_ref[i], kv_last_ref[i]), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_heads, n_q_blocks, n_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, bq, head_dim),
                         lambda h, i, j, *_: (h, i, 0)),
            pl.BlockSpec((1, bk, head_dim), kv_index_map),
            pl.BlockSpec((1, bk, head_dim), kv_index_map),
            pl.BlockSpec((bq, 1), lambda h, i, j, *_: (i, 0)),
            pl.BlockSpec((bq, 1), lambda h, i, j, *_: (i, 0)),
            pl.BlockSpec((1, bk), lambda h, i, j, *_: (0, j)),
            pl.BlockSpec((1, bk), lambda h, i, j, *_: (0, j)),
        ] + ([pl.BlockSpec((1, 8, LANES), lambda h, i, j, *_: (h, 0, 0))]
             if alibi_slopes is not None else []),
        out_specs=[
            pl.BlockSpec((1, bq, head_dim), lambda h, i, j, *_: (h, i, 0)),
        ] + ([pl.BlockSpec((1, bq, LANES), lambda h, i, j, *_: (h, i, 0))]
             if return_lse else []),
        scratch_shapes=[
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, head_dim), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _varlen_kernel,
        scale_log2e=scale_l2e,
        softcap=float(logit_softcap),
        softcap_mul=(float(softmax_scale) / float(logit_softcap)
                     if logit_softcap else 0.0),
        causal=causal,
        n_q_blocks=n_q_blocks,
        block_q=bq,
        block_k=bk,
        alibi=alibi_slopes is not None,
        window_left=int(window_left),
        window_right=int(window_right),
        sinks=int(sink_tokens),
        with_lse=return_lse,
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_heads, tq_p, head_dim), q.dtype),
        ] + ([jax.ShapeDtypeStruct((num_heads, tq_p, LANES), jnp.float32)]
             if return_lse else []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        kv_first.astype(jnp.int32),
        kv_last.astype(jnp.int32),
        bits,
        qt,
        kt,
        vt,
        seg_q[:, None],
        pos_q[:, None],
        seg_k[None, :],
        pos_k[None, :],
        *varlen_extra,
    )

    if return_lse:
        o, lse = out
        return jnp.swapaxes(o[:, :total_q], 0, 1), lse[:, :total_q, 0]
    return jnp.swapaxes(out[0][:, :total_q], 0, 1)
