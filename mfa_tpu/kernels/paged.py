"""Pallas TPU paged-attention decode kernel (manual DMA + quantized KV).

TPU-native re-design of the reference paged decode path
(csrc/mfa/decode.cuh:47-77 paged addressing; api.cpp:242-257 paged params).
The reference addresses one 64-row KV tile through a single block-table
entry (page_block_size >= kBlockN constraint, SURVEY.md §2.4 warning); here
pages are gathered with one async DMA per page into a double-buffered VMEM
block, so any page size >= 8 works and non-contiguous tables are free.

Design (cf. the public jax paged_attention pattern, SNIPPETS.md [3]):
- K/V pages stay in HBM (`pltpu.ANY`); the kernel issues per-page
  `pltpu.make_async_copy` into `(2, pages_per_block, page, d)` VMEM buffers
  — all pages of a block in flight concurrently, next block prefetched
  while the current one is computed (the cp.async double-buffer pipeline of
  prefill.cuh:755-791, done with explicit DMA instead of BlockSpecs because
  the addressing is data-dependent).
- `lengths` and the flattened `block_table` are scalar-prefetched so DMA
  addresses are known before the body runs.
- Quantized KV (INT8 / FP8, no reference counterpart — BASELINE.json north
  star): pages are stored quantized with one fp32 scale per (kv_head,
  token-row). Dequantization never touches the payload: K row scales are
  applied to score *columns* after QK^T and V row scales are folded into
  the probabilities before PV, so the MXU consumes the raw converted
  payload and the VPU does O(tokens) extra work, not O(tokens*d).
- Per-batch output is written once, at that sequence's last valid block
  (data-dependent; replaces the reference's grid-wide combine for splits).
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
    cdiv,
    default_interpret,
    round_up,
    softmax_scale_default,
)

_LOG2E = math.log2(math.e)
_LN2 = math.log(2.0)
_MASK = -1e30
_LANES = 128


def _make_page_copy(pages_hbm, buf, sems, table_ref, *, h, table_base, j, slot,
                    num_pages):
    """Async copy of one KV page: HBM[h, page_id] -> buf[slot, j]."""
    page_id = jnp.clip(table_ref[table_base + j], 0, num_pages - 1)
    return pltpu.make_async_copy(
        pages_hbm.at[h, page_id],
        buf.at[slot, j],
        sems.at[slot, j],
    )


def _paged_kernel_body(
    lens_ref,
    table_ref,
    q_ref,
    k_scale_ref,
    v_scale_ref,
    k_pages,
    v_pages,
    o_ref,
    lse_ref,
    m_scr,
    l_scr,
    acc_scr,
    k_buf,
    v_buf,
    k_sems,
    v_sems,
    state_ref,
    *,
    scale_log2e: float,
    page_size: int,
    pages_per_block: int,
    pages_per_seq: int,
    batch: int,
    num_kv_heads: int,
    num_pages: int,
    max_blocks: int,
    quantized: bool,
):
    b, h, i = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    bt = page_size * pages_per_block  # tokens per compute block
    length = lens_ref[b]

    @pl.when(jnp.logical_and(b == 0, jnp.logical_and(h == 0, i == 0)))
    def _init_state():
        # Scratch is uninitialized at grid start; arm the pipeline flags.
        state_ref[0] = 0
        state_ref[1] = 0

    def start_block(bb, hh, blk, slot):
        base = bb * pages_per_seq + blk * pages_per_block
        for j in range(pages_per_block):
            _make_page_copy(
                k_pages, k_buf, k_sems, table_ref,
                h=hh, table_base=base, j=j, slot=slot, num_pages=num_pages,
            ).start()
            _make_page_copy(
                v_pages, v_buf, v_sems, table_ref,
                h=hh, table_base=base, j=j, slot=slot, num_pages=num_pages,
            ).start()

    def wait_block(bb, hh, blk, slot):
        base = bb * pages_per_seq + blk * pages_per_block
        for j in range(pages_per_block):
            _make_page_copy(
                k_pages, k_buf, k_sems, table_ref,
                h=hh, table_base=base, j=j, slot=slot, num_pages=num_pages,
            ).wait()
            _make_page_copy(
                v_pages, v_buf, v_sems, table_ref,
                h=hh, table_base=base, j=j, slot=slot, num_pages=num_pages,
            ).wait()

    def next_valid_cell(bb, hh, blk):
        """Lexicographic successor, skipping past-length blocks and empty seqs."""
        blk1 = blk + 1
        seq_done = jnp.logical_or(
            blk1 * bt >= lens_ref[bb], blk1 >= max_blocks
        )
        hh1 = jnp.where(seq_done, hh + 1, hh)
        blk1 = jnp.where(seq_done, 0, blk1)
        bb1 = jnp.where(hh1 == num_kv_heads, bb + 1, bb)
        hh1 = jnp.where(hh1 == num_kv_heads, 0, hh1)

        def skip_empty(carry):
            return jnp.logical_and(
                carry < batch, lens_ref[jnp.minimum(carry, batch - 1)] == 0
            )

        bb2 = jax.lax.while_loop(skip_empty, lambda c: c + 1, bb1)
        return bb2, hh1, blk1

    @pl.when(jnp.logical_and(length == 0, i == 0))
    def _zero_out():
        # Zero-length sequence: defined output (reference writes nothing;
        # we emit zeros for determinism).
        o_ref[0, 0] = jnp.zeros_like(o_ref[0, 0])
        lse_ref[0, 0] = jnp.full_like(lse_ref[0, 0], -jnp.inf)

    block_valid = i * bt < length

    @pl.when(block_valid)
    def _compute():
        @pl.when(i == 0)
        def _init_stats():
            m_scr[...] = jnp.full_like(m_scr, _MASK)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        # First ever valid cell bootstraps the pipeline.
        @pl.when(state_ref[0] == 0)
        def _bootstrap():
            state_ref[0] = 1
            state_ref[1] = 0
            start_block(b, h, i, 0)

        slot = state_ref[1]

        # Prefetch the next valid block into the other buffer.
        nb, nh, ni = next_valid_cell(b, h, i)

        @pl.when(nb < batch)
        def _prefetch():
            start_block(nb, nh, ni, 1 - slot)
            state_ref[1] = 1 - slot

        wait_block(b, h, i, slot)

        q = q_ref[0, 0]  # [group_p, d]
        k = k_buf[slot].reshape(bt, -1)  # [bt, d] payload dtype
        v = v_buf[slot].reshape(bt, -1)
        if quantized:
            k = k.astype(jnp.bfloat16)
            v = v.astype(jnp.bfloat16)

        sc = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if quantized:
            # K row scales apply to score columns: s[g, t] *= k_scale[t]
            sc = sc * k_scale_ref[0, 0]  # [1, bt] broadcast over rows
        sc = sc * scale_log2e
        col = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1) + i * bt
        sc = jnp.where(col < length, sc, _MASK)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_cur = jnp.max(sc, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(sc - m_next[:, :1])
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next

        if quantized:
            # V row scales fold into the probabilities: p[g, t] *= v_scale[t]
            p = p * v_scale_ref[0, 0]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

        last_block = cdiv(length, bt) - 1

        @pl.when(i == last_block)
        def _store():
            l = l_scr[:, :1]
            l_safe = jnp.where(jnp.logical_or(l == 0.0, jnp.isnan(l)), 1.0, l)
            o_ref[0, 0] = acc_scr[...] / l_safe
            lse = m_scr[:, :1] * _LN2 + jnp.log(l_safe)
            lse = jnp.where(l == 0.0, -jnp.inf, lse)
            lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def paged_attention(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    cache_seqlens: jax.Array,
    block_table: jax.Array,
    *,
    k_scales: Optional[jax.Array] = None,
    v_scales: Optional[jax.Array] = None,
    softmax_scale: Optional[float] = None,
    pages_per_compute_block: Optional[int] = None,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
):
    """Paged decode attention (seqlen_q == 1).

    q: [batch, num_heads, head_dim]
    k_pages/v_pages: [num_kv_heads, num_pages, page_size, head_dim]
        (bf16/fp16/fp32, or int8 / fp8 with k_scales/v_scales)
    k_scales/v_scales: [num_kv_heads, num_pages, page_size] fp32 per-row
        dequant scales (required iff pages are quantized).
    cache_seqlens: [batch] int32; block_table: [batch, pages_per_seq] int32.

    Returns [batch, num_heads, head_dim] (and, if return_lse, a fp32
    LSE [batch, num_heads] for cross-chip combines).
    """
    batch, num_heads, head_dim = q.shape
    num_kv_heads, num_pages, page_size, _ = k_pages.shape
    group = num_heads // num_kv_heads
    pages_per_seq = block_table.shape[1]
    quantized = k_scales is not None
    if softmax_scale is None:
        softmax_scale = softmax_scale_default(head_dim)
    if interpret is None:
        interpret = default_interpret()

    if pages_per_compute_block is None:
        pages_per_compute_block = max(1, min(pages_per_seq, 512 // page_size))
    ppb = pages_per_compute_block
    bt = ppb * page_size
    max_blocks = cdiv(pages_per_seq, ppb)

    group_p = max(8, round_up(group, 8))
    qg = q.reshape(batch, num_kv_heads, group, head_dim)
    if group_p != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, group_p - group), (0, 0)))
    if quantized and qg.dtype != jnp.bfloat16:
        qg = qg.astype(jnp.bfloat16)

    lens32 = jnp.asarray(cache_seqlens, jnp.int32)
    table_flat = jnp.asarray(block_table, jnp.int32).reshape(-1)

    in_specs = [
        pl.BlockSpec(
            (1, 1, group_p, head_dim), lambda b, h, i, *refs: (b, h, 0, 0)
        ),
    ]
    inputs = [qg]
    if quantized:
        # Gather per-row scales by block table outside the kernel (tiny:
        # 4 bytes/token vs ~2*head_dim payload bytes/token).
        def gather_scales(scales):
            g = scales[:, block_table]  # [hkv, b, pages_per_seq, page]
            g = jnp.transpose(g, (1, 0, 2, 3)).reshape(batch, num_kv_heads, -1)
            pad = max_blocks * bt - g.shape[-1]
            if pad:
                g = jnp.pad(g, ((0, 0), (0, 0), (0, pad)))
            return g.reshape(batch, num_kv_heads, 1, max_blocks * bt)

        scale_spec = pl.BlockSpec(
            (1, 1, 1, bt), lambda b, h, i, *refs: (b, h, 0, i)
        )
        in_specs += [scale_spec, scale_spec]
        inputs += [gather_scales(k_scales), gather_scales(v_scales)]
    else:
        in_specs += [None, None]  # placeholder — filtered below
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    inputs += [k_pages, v_pages]
    in_specs = [s for s in in_specs if s is not None]

    body = functools.partial(
        _paged_kernel_body,
        scale_log2e=float(softmax_scale) * _LOG2E,
        page_size=page_size,
        pages_per_block=ppb,
        pages_per_seq=pages_per_seq,
        batch=batch,
        num_kv_heads=num_kv_heads,
        num_pages=num_pages,
        max_blocks=max_blocks,
        quantized=quantized,
    )
    if quantized:
        kernel = body
    else:
        def kernel(lens, table, q_ref, kp, vp, *rest):
            return body(lens, table, q_ref, None, None, kp, vp, *rest)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, num_kv_heads, max_blocks),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, group_p, head_dim), lambda b, h, i, *refs: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, group_p, _LANES), lambda b, h, i, *refs: (b, h, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((group_p, _LANES), jnp.float32),
            pltpu.VMEM((group_p, _LANES), jnp.float32),
            pltpu.VMEM((group_p, head_dim), jnp.float32),
            pltpu.VMEM((2, ppb, page_size, head_dim), k_pages.dtype),
            pltpu.VMEM((2, ppb, page_size, head_dim), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, ppb)),
            pltpu.SemaphoreType.DMA((2, ppb)),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )

    payload_bytes = 2 * batch * num_kv_heads  # rough: k+v stream per step
    o_parts, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(
                (batch, num_kv_heads, group_p, head_dim), jnp.float32
            ),
            jax.ShapeDtypeStruct(
                (batch, num_kv_heads, group_p, _LANES), jnp.float32
            ),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * batch * num_heads * pages_per_seq * page_size * head_dim),
            bytes_accessed=int(
                payload_bytes * pages_per_seq * page_size * head_dim
                * k_pages.dtype.itemsize
            ),
            transcendentals=int(batch * num_heads * pages_per_seq * page_size),
        ),
        interpret=interpret,
    )(lens32, table_flat, *inputs)

    out = o_parts[:, :, :group].reshape(batch, num_heads, head_dim).astype(q.dtype)
    if return_lse:
        return out, lse[:, :, :group, 0].reshape(batch, num_heads)
    return out
