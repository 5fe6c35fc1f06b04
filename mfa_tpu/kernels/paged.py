"""Pallas TPU paged-attention decode kernel (manual DMA + quantized KV).

TPU-native re-design of the reference paged decode path
(csrc/mfa/decode.cuh:47-77 paged addressing; api.cpp:242-257 paged params).
The reference addresses one 64-row KV tile through a single block-table
entry (page_block_size >= kBlockN constraint, SURVEY.md §2.4 warning); here
pages are gathered with async DMA into double-buffered VMEM blocks, so any
page size >= 8 works and non-contiguous tables are free.

Performance shape (measured on v5e): decode is DMA-issue-latency-bound, so
the kernel minimizes descriptor count, not just bytes:

- One grid cell per (sequence, KV compute block) handles **all kv heads**:
  each page is fetched with a single strided DMA covering every head
  (src `pages.at[:, page_id]`, dst head-major VMEM `buf.at[slot, :, j]`),
  so a block of P pages costs 2P descriptors total instead of
  2P * num_kv_heads.
- VMEM buffers are head-major `(2, hkv, pages, page, d)` so each head's
  tokens are contiguous and reshape to [block_tokens, d] for the MXU with
  no relayout.
- The next block (possibly of the next sequence) is prefetched while the
  current one is computed (the cp.async double-buffer pipeline of
  prefill.cuh:755-791 with data-dependent addressing).
- `lengths` + flattened `block_table` are scalar-prefetched so DMA
  addresses are known before the body runs.
- Quantized KV (INT8 / FP8, no reference counterpart — BASELINE.json north
  star): one fp32 scale per (kv_head, token-row); K scales multiply score
  *columns* after QK^T and V scales fold into the probabilities, so the
  MXU consumes raw converted payload and dequant is O(tokens) VPU work.
- Per-sequence output is written once, at that sequence's last valid block.
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
from mfa_tpu.kernels.quant import fp8_bits_to_bf16

_LOG2E = math.log2(math.e)


def _unpack_int4(b):
    """Token-pair nibble-packed int4 pages: b [rows, d] int8, where byte
    (r, c) holds token 2r's feature c in its LOW nibble and token 2r+1's
    feature c in its HIGH nibble (quant.pack_int4_pairs). Returns
    [2*rows, d] int32 values ordered [even tokens..., odd tokens...] — a
    PERMUTED token order, which is sound because softmax accumulation is
    order-invariant; masks and per-token scales are permuted to match
    (_pair_permute_iota + host-side scale shuffle).

    Why this layout: int8 HBM arrays narrower than 128 lanes can't be
    sliced by the strided per-page DMA on v5e, and lane-slicing inside the
    kernel costs vector relayouts — lane-aligned token pairing needs only
    two full-width shift chains and one sublane concat. Arithmetic in
    int32 (sub-word int8 shifts fail to lower on v5e).
    """
    b32 = b.astype(jnp.int32)
    even = jnp.right_shift(jnp.left_shift(b32, 28), 28)
    odd = jnp.right_shift(jnp.left_shift(b32, 24), 28)
    return jnp.concatenate([even, odd], axis=0)


def gather_page_scales(scales, block_table, batch, num_kv_heads, max_blocks,
                       bt, pack2):
    """Gather per-row dequant scales by block table OUTSIDE the kernel
    (tiny: 4 bytes/token vs ~head_dim payload bytes/token) into
    [b, max_blocks, hkv, bt] — the (hkv, bt) trailing dims satisfy
    Mosaic's (full, 128-multiple) block tiling rule. Shared by the paged
    decode and paged prefill kernels."""
    g = scales[:, block_table]  # [hkv, b, pages_per_seq, page]
    g = jnp.transpose(g, (1, 0, 2, 3)).reshape(batch, num_kv_heads, -1)
    pad = max_blocks * bt - g.shape[-1]
    if pad:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, pad)))
    g = g.reshape(batch, num_kv_heads, max_blocks, bt)
    if pack2:
        # match the kernel's [evens, odds] token order per block
        g = jnp.concatenate([g[..., 0::2], g[..., 1::2]], axis=-1)
    return jnp.transpose(g, (0, 2, 1, 3))


def _pair_permute_iota(rows_p, bt, base):
    """[rows_p, bt] int32 token positions matching _unpack_int4's
    [evens..., odds...] column order: column i is token base + 2i for
    i < bt/2, else base + 2(i - bt/2) + 1."""
    off = jax.lax.broadcasted_iota(jnp.int32, (rows_p, bt), 1)
    perm = jnp.where(off < bt // 2, 2 * off, 2 * off - bt + 1)
    return perm + base
_LN2 = math.log(2.0)
_MASK = -1e30
_LANES = 128


def _page_copy(pages_hbm, buf, sems, table_ref, *, table_base, j, slot,
               num_pages):
    """One strided DMA: page `table[table_base+j]` for ALL kv heads.

    src [hkv, page, d] (strided over heads) -> dst buf[slot, :, j] (head-
    major). One descriptor per page instead of one per (page, head).
    """
    page_id = jnp.clip(table_ref[table_base + j], 0, num_pages - 1)
    return pltpu.make_async_copy(
        pages_hbm.at[:, page_id],
        buf.at[slot, :, j],
        sems.at[slot, j],
    )


def _paged_kernel_body(
    lens_ref,
    table_ref,
    q_ref,  # [1, hkv, group_p, d]
    slopes_ref,  # [hkv, rows_p, LANES] log2-domain ALiBi slopes or None
    k_scale_ref,  # [1, hkv, 1, bt] or None
    v_scale_ref,
    k_pages,  # HBM [hkv, P, page, d]
    v_pages,
    o_ref,  # [1, hkv, group_p, d] fp32
    lse_ref,  # [1, hkv, group_p, LANES] fp32
    m_scr,  # [hkv, group_p, LANES]
    l_scr,
    acc_scr,  # [hkv, group_p, d]
    k_buf,  # [2, hkv, ppb, page, d]
    v_buf,
    k_sems,  # [2, ppb]
    v_sems,
    state_ref,  # SMEM [2]: (pipeline armed, current slot)
    *,
    scale_log2e: float,
    softcap: float,
    softcap_mul: float,
    page_size: int,
    pages_per_block: int,
    pages_per_seq: int,
    batch: int,
    num_kv_heads: int,
    num_pages: int,
    max_blocks: int,
    quantized: bool,
    pack2: bool,
    fp8: bool,
    head_dim: int,
    window_left: int,
    sinks: int,
    q_span: int,
    group: int,
    pos_offset: int = 0,
):
    b, i = pl.program_id(0), pl.program_id(1)
    bt = page_size * pages_per_block
    length = lens_ref[b]

    def _win_start(bb):
        """First visible column of the OLDEST query row of sequence bb
        (query row si sits at absolute position lens-q_span+si; sliding
        window caps each row's visibility to window_left tokens back)."""
        if window_left < 0:
            return jnp.int32(0)
        return jnp.maximum(
            0, lens_ref[bb] + pos_offset - q_span - window_left)

    def _first_block(bb):
        if sinks > 0:  # sink blocks precede the window band
            return jnp.int32(0)
        return _win_start(bb) // bt

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _init_state():
        state_ref[0] = 0
        state_ref[1] = 0

    def _page_valid(bb, blk, j):
        # Page j of block blk intersects the visible range [start, length).
        valid = (blk * bt + j * page_size) < lens_ref[bb]
        if window_left >= 0:
            in_win = blk * bt + (j + 1) * page_size > _win_start(bb)
            if sinks > 0:  # StreamingLLM: sink pages stay visible
                in_win = jnp.logical_or(in_win, blk * bt + j * page_size < sinks)
            valid = jnp.logical_and(valid, in_win)
        return valid

    def start_block(bb, blk, slot):
        base = bb * pages_per_seq + blk * pages_per_block
        for j in range(pages_per_block):
            valid = _page_valid(bb, blk, j)

            @pl.when(valid)
            def _fetch(j=j):
                _page_copy(k_pages, k_buf, k_sems, table_ref,
                           table_base=base, j=j, slot=slot,
                           num_pages=num_pages).start()
                _page_copy(v_pages, v_buf, v_sems, table_ref,
                           table_base=base, j=j, slot=slot,
                           num_pages=num_pages).start()

            @pl.when(jnp.logical_not(valid))
            def _zero(j=j):
                # Zero V so masked (weight==0) columns can't inject NaN/Inf
                # through the PV matmul; K needs nothing (scores are
                # replaced, not added, under the length mask).
                v_buf[slot, :, j] = jnp.zeros_like(v_buf[slot, :, j])

    def wait_block(bb, blk, slot):
        base = bb * pages_per_seq + blk * pages_per_block
        for j in range(pages_per_block):
            @pl.when(_page_valid(bb, blk, j))
            def _wait(j=j):
                _page_copy(k_pages, k_buf, k_sems, table_ref,
                           table_base=base, j=j, slot=slot,
                           num_pages=num_pages).wait()
                _page_copy(v_pages, v_buf, v_sems, table_ref,
                           table_base=base, j=j, slot=slot,
                           num_pages=num_pages).wait()

    def next_valid_cell(bb, blk):
        """Lexicographic successor, skipping past-length blocks, empty
        sequences, and (with attention sinks) the invisible gap between
        the sink prefix and the window band — the double-buffer pipeline
        must only ever prefetch cells that will actually compute."""
        blk1 = blk + 1
        if window_left >= 0 and sinks > 0:
            win_blk = _win_start(bb) // bt
            in_gap = jnp.logical_and(
                blk1 * bt >= sinks, (blk1 + 1) * bt <= _win_start(bb)
            )
            blk1 = jnp.where(in_gap, win_blk, blk1)
        seq_done = jnp.logical_or(
            blk1 * bt >= lens_ref[bb], blk1 >= max_blocks
        )
        bb1 = jnp.where(seq_done, bb + 1, bb)

        def skip_empty(carry):
            return jnp.logical_and(
                carry < batch, lens_ref[jnp.minimum(carry, batch - 1)] == 0
            )

        bb2 = jax.lax.while_loop(skip_empty, lambda c: c + 1, bb1)
        # Entering a new sequence: jump straight to its first VISIBLE block
        # (windowed decode never touches blocks before the window start, so
        # no DMA may be issued for them — an unmatched start would poison
        # the double-buffer semaphores).
        blk1 = jnp.where(
            seq_done, _first_block(jnp.minimum(bb2, batch - 1)), blk1
        )
        return bb2, blk1

    @pl.when(jnp.logical_and(length == 0, i == 0))
    def _zero_out():
        # Zero-length sequence: defined output (reference writes nothing).
        o_ref[0] = jnp.zeros_like(o_ref[0])
        lse_ref[0] = jnp.full_like(lse_ref[0], -jnp.inf)

    block_valid = i * bt < length
    if window_left >= 0:
        in_win = (i + 1) * bt > _win_start(b)
        if sinks > 0:
            in_win = jnp.logical_or(in_win, i * bt < sinks)
        block_valid = jnp.logical_and(block_valid, in_win)

    @pl.when(block_valid)
    def _compute():
        @pl.when(i == _first_block(b))
        def _init_stats():
            m_scr[...] = jnp.full_like(m_scr, _MASK)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        # First ever valid cell bootstraps the pipeline.
        @pl.when(state_ref[0] == 0)
        def _bootstrap():
            state_ref[0] = 1
            state_ref[1] = 0
            start_block(b, i, 0)

        slot = state_ref[1]

        nb, ni = next_valid_cell(b, i)

        @pl.when(nb < batch)
        def _prefetch():
            start_block(nb, ni, 1 - slot)
            state_ref[1] = 1 - slot

        wait_block(b, i, slot)

        # Per-row masks: query row r covers speculative position
        # si = r // group (rows are [q_span, group] flattened; pad rows get
        # si >= q_span — their garbage output is sliced away by the host).
        # Row si's absolute position is length - q_span + si, so it sees
        # cols < length - q_span + 1 + si (multi-query causal alignment).
        rows_p = max(8, -(-(q_span * group) // 8) * 8)
        if pack2:  # paired int4: kv columns are in [evens, odds] order
            col = _pair_permute_iota(rows_p, bt, i * bt)
        else:
            col = jax.lax.broadcasted_iota(
                jnp.int32, (rows_p, bt), 1) + i * bt
        if q_span == 1:
            in_len = col < length
            if window_left >= 0:
                vis = col >= _win_start(b)
                if sinks > 0:
                    vis = jnp.logical_or(vis, col < sinks)
                in_len = jnp.logical_and(in_len, vis)
        else:
            si = jax.lax.broadcasted_iota(jnp.int32, (rows_p, bt), 0) // group
            # row si's absolute position is length + pos_offset - q_span
            # + si; reads stay bounded by the STORED length (deferred
            # appends: pos_offset > 0 means the span's own K/V is not in
            # the cache — the caller merges it via LSE combine)
            in_len = col < jnp.minimum(
                length, length + pos_offset - q_span + 1 + si)
            if window_left >= 0:
                row_start = jnp.maximum(
                    0, (length + pos_offset - q_span + si) - window_left
                )
                vis = col >= row_start
                if sinks > 0:
                    vis = jnp.logical_or(vis, col < sinks)
                in_len = jnp.logical_and(in_len, vis)
        last_block = cdiv(length, bt) - 1

        for h in range(num_kv_heads):  # static unroll over kv heads
            q = q_ref[0, h]  # [group_p, d]
            if pack2:  # paired int4 rows -> [bt, d] in [evens, odds] order
                k = _unpack_int4(k_buf[slot, h].reshape(bt // 2, -1))
                v = _unpack_int4(v_buf[slot, h].reshape(bt // 2, -1))
            else:
                k = k_buf[slot, h].reshape(bt, -1)
                v = v_buf[slot, h].reshape(bt, -1)
            if quantized:
                if fp8:  # int8-carried e4m3 bits (see fp8_bits_to_bf16)
                    k = fp8_bits_to_bf16(k)
                    v = fp8_bits_to_bf16(v)
                else:
                    k = k.astype(jnp.bfloat16)
                    v = v.astype(jnp.bfloat16)

            sc = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if quantized:
                sc = sc * k_scale_ref[0, 0, h : h + 1, :]  # [1, bt] K row scales
            if softcap:
                # Gemma2 logit softcap on the dequantized raw logits; the
                # softmax scale folds into the tanh argument and
                # scale_log2e is log2(e) (see prefill.py)
                sc = jnp.tanh(sc * softcap_mul) * softcap
            sc = sc * scale_log2e
            if slopes_ref is not None:
                # ALiBi: per-row slopes (log2 domain); row si sits at
                # absolute position length - q_span + si
                si_rows = jax.lax.broadcasted_iota(
                    jnp.int32, (sc.shape[0], 1), 0) // group
                pos_rows = (length + pos_offset - q_span) + si_rows
                sc = sc - slopes_ref[h][:, :1] * jnp.abs(
                    pos_rows - col).astype(jnp.float32)
            sc = jnp.where(in_len, sc, _MASK)

            m_prev = m_scr[h]
            l_prev = l_scr[h]
            m_cur = jnp.max(sc, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(sc - m_next[:, :1])
            l_scr[h] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_scr[h] = m_next

            if quantized:
                p = p * v_scale_ref[0, 0, h : h + 1, :]  # V row scales fold into probs
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_scr[h] = acc_scr[h] * alpha[:, :1] + pv

        @pl.when(i == last_block)
        def _store():
            l = l_scr[...][:, :, :1]
            l_safe = jnp.where(jnp.logical_or(l == 0.0, jnp.isnan(l)), 1.0, l)
            o_ref[0] = acc_scr[...] / l_safe
            lse = m_scr[...][:, :, :1] * _LN2 + jnp.log(l_safe)
            lse = jnp.where(l == 0.0, -jnp.inf, lse)
            lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


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
    window_left: int = -1,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
    logit_softcap: float = 0.0,
    quant_dtype: Optional[str] = None,
    sink_tokens: int = 0,
    alibi_slopes: Optional[jax.Array] = None,
    pos_offset: int = 0,
):
    """Paged decode attention (seqlen_q == 1, or a small speculative span).

    pos_offset (static, DEFERRED-APPEND serving): query row si sits at
    absolute position cache_seqlens + pos_offset - q_span + si while
    reads stay bounded by cache_seqlens — the span's own K/V rows are
    NOT yet in the cache (models/llama.py decode_step/verify_step
    scatter them after the layer scan with _append_all_layers and fold
    their contribution in with an exact LSE combine, _merge_deferred).
    0 = classic behavior. Requires window_left >= q_span when windowed
    (the caller's intra-span merge has no window mask, and a window
    ending before the stored length can skip the store block).

    q: [batch, num_heads, head_dim], or [batch, q_span, num_heads,
        head_dim] for multi-query (speculative verify / MTP) decoding —
        query row si sits at absolute position length - q_span + si and is
        masked causally (call with lengths that already include the span's
        tokens). The reference is strictly seqlen_q == 1
        (interface.py:116); the span generalization has no counterpart.
    k_pages/v_pages: [num_kv_heads, num_pages, page_size, head_dim]
        (bf16/fp16/fp32, or int8 / fp8 with k_scales/v_scales)
    k_scales/v_scales: [num_kv_heads, num_pages, page_size] fp32 per-row
        dequant scales (required iff pages are quantized).
    cache_seqlens: [batch] int32; block_table: [batch, pages_per_seq] int32.
    window_left: sliding window — attend only to the last window_left+1
        tokens (-1 = unbounded).

    Returns [batch, num_heads, head_dim] (and, if return_lse, a fp32
    LSE [batch, num_heads] for cross-chip combines).
    """
    if q.ndim == 3:
        q_span = 1
        batch, num_heads, head_dim = q.shape
    else:
        batch, q_span, num_heads, head_dim = q.shape
    if pos_offset and 0 <= window_left < q_span:
        raise ValueError(
            f"pos_offset={pos_offset} (deferred append) needs "
            f"window_left >= q_span ({q_span}), got {window_left}")
    num_kv_heads, num_pages, page_rows, pwidth = k_pages.shape
    group = num_heads // num_kv_heads
    pages_per_seq = block_table.shape[1]
    quantized = k_scales is not None
    # int4: row-PAIRED pages [hkv, P, page_size/2, head_dim] (see
    # _unpack_int4) — quant_dtype="int4" must be passed since the shape is
    # ambiguous with an int8 cache of half the page size.
    pack2 = quant_dtype == "int4"
    if pack2 and not quantized:
        raise ValueError("int4 pages require k_scales/v_scales")
    # fp8 pools: Mosaic DMAs/relayouts of float8-typed arrays are ~10x
    # slower than int8 on this chip (scripts/probe_fp8.py), so the kernel
    # consumes the BIT PATTERNS as int8 (bitcast is free under jit) and
    # decodes e4m3->bf16 arithmetically (quant.fp8_bits_to_bf16).
    fp8 = quantized and (quant_dtype == "fp8"
                         or k_pages.dtype == jnp.float8_e4m3fn)
    if fp8 and k_pages.dtype != jnp.int8:
        if k_pages.dtype != jnp.float8_e4m3fn:
            raise ValueError(f"fp8 pages must be float8_e4m3fn or int8 "
                             f"bits, got {k_pages.dtype}")
        k_pages = jax.lax.bitcast_convert_type(k_pages, jnp.int8)
        v_pages = jax.lax.bitcast_convert_type(v_pages, jnp.int8)
    page_size = page_rows * 2 if pack2 else page_rows
    # Narrow head dims are stored 128-lane padded (the strided per-page
    # DMA can't address sub-128-lane rows; zero features are inert in
    # both QK^T and PV) — pad q to match and slice the output back.
    if pwidth < head_dim:
        raise ValueError(
            f"page width {pwidth} < head_dim {head_dim}: pages must be "
            f"created with a 128-lane-padded width (cache layer does this)")
    hd_p = pwidth
    if softmax_scale is None:
        softmax_scale = softmax_scale_default(head_dim)
    if interpret is None:
        interpret = default_interpret()

    if pages_per_compute_block is None:
        # Bigger compute blocks = fewer grid cells and fewer, larger DMA
        # descriptor batches (the kernel is issue-latency-bound; measured
        # 93% of roofline with whole-sequence blocks at kv=8192). Per-page
        # DMA skipping makes oversized blocks free for short sequences.
        # Capped so the double-buffered KV stays within the VMEM budget.
        budget = 32 * 1024 * 1024  # bytes for the 2x2 KV buffers
        per_page = 4 * num_kv_heads * page_rows * pwidth * k_pages.dtype.itemsize
        ppb_vmem = max(1, budget // per_page)
        pages_per_compute_block = max(1, min(pages_per_seq, ppb_vmem))
    ppb = pages_per_compute_block
    bt = ppb * page_size
    max_blocks = cdiv(pages_per_seq, ppb)

    # Rows are [q_span, group] flattened (kernel decodes si = row // group).
    rows = q_span * group
    rows_p = max(8, round_up(rows, 8))
    if q.ndim == 3:
        qg = q.reshape(batch, num_kv_heads, group, head_dim)
    else:
        qg = jnp.transpose(
            q.reshape(batch, q_span, num_kv_heads, group, head_dim),
            (0, 2, 1, 3, 4),
        ).reshape(batch, num_kv_heads, rows, head_dim)
    if rows_p != rows or hd_p != head_dim:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, rows_p - rows),
                          (0, hd_p - head_dim)))
    if quantized and qg.dtype not in (jnp.bfloat16, jnp.float32):
        qg = qg.astype(jnp.bfloat16)

    lens32 = jnp.asarray(cache_seqlens, jnp.int32)
    table_flat = jnp.asarray(block_table, jnp.int32).reshape(-1)

    in_specs = [
        pl.BlockSpec((1, num_kv_heads, rows_p, hd_p),
                     lambda b, i, *refs: (b, 0, 0, 0)),
    ]
    inputs = [qg]
    if alibi_slopes is not None:
        if logit_softcap:
            raise ValueError("alibi_slopes and logit_softcap are exclusive")
        # per-row slopes: row r of kv head h is q head h*group + r%group;
        # log2 domain (scores are scaled by scale*log2e in-kernel)
        sl = jnp.asarray(alibi_slopes, jnp.float32).reshape(
            num_kv_heads, group) * _LOG2E
        row_slope = jnp.tile(sl[:, None, :], (1, rows_p // group + 1, 1)
                             ).reshape(num_kv_heads, -1)[:, :rows_p]
        slopes_in = jnp.broadcast_to(row_slope[..., None],
                                     (num_kv_heads, rows_p, _LANES))
        in_specs.append(pl.BlockSpec((num_kv_heads, rows_p, _LANES),
                                     lambda b, i, *refs: (0, 0, 0)))
        inputs.append(slopes_in)
    if quantized:
        scale_spec = pl.BlockSpec(
            (1, 1, num_kv_heads, bt), lambda b, i, *refs: (b, i, 0, 0)
        )
        in_specs += [scale_spec, scale_spec]
        inputs += [
            gather_page_scales(k_scales, block_table, batch, num_kv_heads,
                               max_blocks, bt, pack2),
            gather_page_scales(v_scales, block_table, batch, num_kv_heads,
                               max_blocks, bt, pack2),
        ]
    in_specs += [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs += [k_pages, v_pages]

    body = functools.partial(
        _paged_kernel_body,
        scale_log2e=(_LOG2E if logit_softcap
                     else float(softmax_scale) * _LOG2E),
        softcap=float(logit_softcap),
        softcap_mul=(float(softmax_scale) / float(logit_softcap)
                     if logit_softcap else 0.0),
        page_size=page_size,
        pages_per_block=ppb,
        pages_per_seq=pages_per_seq,
        batch=batch,
        num_kv_heads=num_kv_heads,
        num_pages=num_pages,
        max_blocks=max_blocks,
        quantized=quantized,
        pack2=pack2,
        fp8=fp8,
        head_dim=head_dim,
        window_left=window_left,
        sinks=int(sink_tokens) if window_left >= 0 else 0,
        q_span=q_span,
        group=group,
        pos_offset=int(pos_offset),
    )
    has_alibi = alibi_slopes is not None

    def kernel(lens, table, *refs):
        refs = list(refs)
        q_ref = refs.pop(0)
        sl_ref = refs.pop(0) if has_alibi else None
        if quantized:
            ks_ref, vs_ref = refs.pop(0), refs.pop(0)
        else:
            ks_ref = vs_ref = None
        return body(lens, table, q_ref, sl_ref, ks_ref, vs_ref, *refs)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, max_blocks),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, num_kv_heads, rows_p, hd_p),
                         lambda b, i, *refs: (b, 0, 0, 0)),
            pl.BlockSpec((1, num_kv_heads, rows_p, _LANES),
                         lambda b, i, *refs: (b, 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((num_kv_heads, rows_p, _LANES), jnp.float32),
            pltpu.VMEM((num_kv_heads, rows_p, _LANES), jnp.float32),
            pltpu.VMEM((num_kv_heads, rows_p, hd_p), jnp.float32),
            pltpu.VMEM((2, num_kv_heads, ppb, page_rows, pwidth),
                       k_pages.dtype),
            pltpu.VMEM((2, num_kv_heads, ppb, page_rows, pwidth),
                       v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, ppb)),
            pltpu.SemaphoreType.DMA((2, ppb)),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )

    kv_stream = 2 * batch * num_kv_heads  # K+V per step
    o_parts, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(
                (batch, num_kv_heads, rows_p, hd_p), jnp.float32
            ),
            jax.ShapeDtypeStruct(
                (batch, num_kv_heads, rows_p, _LANES), jnp.float32
            ),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * batch * num_heads * pages_per_seq * page_size
                      * head_dim),
            bytes_accessed=int(
                kv_stream * pages_per_seq * page_rows * pwidth
                * k_pages.dtype.itemsize
            ),
            transcendentals=int(batch * num_heads * pages_per_seq * page_size),
        ),
        interpret=interpret,
    )(lens32, table_flat, *inputs)

    out = o_parts[:, :, :rows, :head_dim]
    if q.ndim == 3:
        out = out.reshape(batch, num_heads, head_dim).astype(q.dtype)
        if return_lse:
            return out, lse[:, :, :rows, 0].reshape(batch, num_heads)
        return out
    out = jnp.transpose(
        out.reshape(batch, num_kv_heads, q_span, group, head_dim),
        (0, 2, 1, 3, 4),
    ).reshape(batch, q_span, num_heads, head_dim).astype(q.dtype)
    if return_lse:
        lse_out = jnp.transpose(
            lse[:, :, :rows, 0].reshape(batch, num_kv_heads, q_span, group),
            (0, 2, 1, 3),
        ).reshape(batch, q_span, num_heads)
        return out, lse_out
    return out
