"""Pallas TPU paged PREFILL kernel: query chunks against a paged KV cache.

Companion to kernels/paged.py (decode): the same per-page async-DMA
double-buffer machinery, but with a q-block axis — each grid cell computes
a [block_q x block_tokens] attention tile for ALL heads of one sequence.
This is the chunked-prefill / varlen-paged hot path done natively: no
materialized XLA gather of the prefix (the gather-based fallback reads the
prefix twice), and the chunk offset (`q_start`) is a scalar-prefetched
RUNTIME value, so one compiled program serves every chunk position.

Semantics: query row r of sequence b sits at absolute position
q_start[b] + r and sees columns c with
    c <= q_start[b] + r + window_right       (band end; causal == right 0)
    c >= q_start[b] + r - window_left        (optional sliding window)
    c <  lengths[b]                          (cache bound)
which generalizes prefill causal masking (offset 0), decode (q_len 1),
and the non-paged varlen kernel's full (left, right) band — including
non-causal local attention (reference window semantics,
flash_api.cpp window_size_left/right).

Quantized KV (INT8/FP8) is handled exactly like the decode kernel: raw
payload through the MXU, per-row scales applied to score columns (K) and
folded into probabilities (V). No reference counterpart: the reference's
paged path is decode-only and requires page >= kv-block (SURVEY.md §2.4).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mfa_tpu.dispatch.config import cdiv, default_interpret, round_up, \
    softmax_scale_default
from mfa_tpu.kernels.quant import fp8_bits_to_bf16
from mfa_tpu.kernels.paged import (_page_copy, _pair_permute_iota,
                                   _unpack_int4, gather_page_scales)

_LOG2E = math.log2(math.e)
_LN2 = math.log(2.0)
_MASK = -1e30
_LANES = 128


def _body(
    lens_ref,  # [b] int32 (scalar prefetch): visible KV length
    qstart_ref,  # [b] int32: absolute position of q row 0
    qlens_ref,  # [b] int32: number of real q rows
    table_ref,  # [b*pps] int32
    q_ref,  # [1, 1, hkv, group*bq, d]
    slopes_ref,  # [hkv, rows_p, LANES] log2-domain ALiBi slopes, or None
    k_scale_ref,  # [1, 1, 1, hkv, bt] or None
    v_scale_ref,
    k_pages,  # HBM [hkv, P, page, d]
    v_pages,
    o_ref,  # [1, 1, hkv, group*bq, d] fp32
    lse_ref,  # [1, 1, hkv, group*bq, LANES] fp32 natural-log row LSE,
    #           or None (the output block only exists under return_lse —
    #           an unconditional one would DOUBLE the kernel's output
    #           bytes on the serving chunked-prefill hot path)
    m_scr,  # [hkv, group*bq, LANES]
    l_scr,
    acc_scr,  # [hkv, group*bq, d]
    k_buf,  # [2, hkv, ppb, page, d]
    v_buf,
    k_sems,
    v_sems,
    state_ref,  # SMEM [2]
    *,
    scale_log2e: float,
    softcap: float,
    softcap_mul: float,
    page_size: int,
    pages_per_block: int,
    pages_per_seq: int,
    batch: int,
    num_q_blocks: int,
    block_q: int,
    num_kv_heads: int,
    group: int,
    num_pages: int,
    max_blocks: int,
    quantized: bool,
    pack2: bool,
    fp8: bool,
    head_dim: int,
    sinks: int,
    window_left: int,
    window_right: int,
):
    b, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    bt = page_size * pages_per_block
    # causal is the window_right == 0 band (the wrapper normalizes);
    # window_right < 0 means unbounded right visibility (non-causal).
    banded = window_right >= 0

    def _row_hi(bb, ii):
        """One past the last visible column of q block ii of sequence bb
        (its newest row's band end under right-bounded alignment;
        everything under unbounded right visibility)."""
        if not banded:
            return lens_ref[bb]
        return jnp.minimum(
            qstart_ref[bb] + (ii + 1) * block_q + window_right, lens_ref[bb]
        )

    def _row_lo(bb, ii):
        """First visible column (oldest row's window start)."""
        if window_left < 0:
            return jnp.int32(0)
        return jnp.maximum(0, qstart_ref[bb] + ii * block_q - window_left)

    def _q_rows(bb):
        """Number of real q rows for sequence bb."""
        return qlens_ref[bb]

    def _last_block(bb, ii):
        return jnp.maximum(0, (_row_hi(bb, ii) - 1)) // bt

    def _first_block(bb, ii):
        if sinks > 0:  # sink blocks precede the window band
            return jnp.int32(0)
        # Clamp to _last_block: when a left window lies entirely past the
        # end of a SHORTER kv range (row_lo >= row_hi), the raw bounds
        # would be empty and the cell-walker would never visit this q
        # block, leaving its output block unwritten (garbage). Running the
        # last in-length block instead is cheap and fully masked, so the
        # dead-row store writes the required zeros.
        return jnp.minimum(_row_lo(bb, ii) // bt, _last_block(bb, ii))

    def _cell_live(bb, ii):
        """q block ii of sequence bb has at least one real row."""
        return ii * block_q < _q_rows(bb)

    @pl.when(jnp.logical_and(b == 0, jnp.logical_and(i == 0, j == 0)))
    def _init_state():
        state_ref[0] = 0
        state_ref[1] = 0

    def _page_valid(bb, ii, blk, p):
        lo = blk * bt + p * page_size
        valid = lo < _row_hi(bb, ii)
        if window_left >= 0:
            in_win = lo + page_size > _row_lo(bb, ii)
            if sinks > 0:
                in_win = jnp.logical_or(in_win, lo < sinks)
            valid = jnp.logical_and(valid, in_win)
        return valid

    def start_block(bb, ii, blk, slot):
        base = bb * pages_per_seq + blk * pages_per_block
        for p in range(pages_per_block):
            valid = _page_valid(bb, ii, blk, p)

            @pl.when(valid)
            def _fetch(p=p):
                _page_copy(k_pages, k_buf, k_sems, table_ref,
                           table_base=base, j=p, slot=slot,
                           num_pages=num_pages).start()
                _page_copy(v_pages, v_buf, v_sems, table_ref,
                           table_base=base, j=p, slot=slot,
                           num_pages=num_pages).start()

            @pl.when(jnp.logical_not(valid))
            def _zero(p=p):
                v_buf[slot, :, p] = jnp.zeros_like(v_buf[slot, :, p])

    def wait_block(bb, ii, blk, slot):
        base = bb * pages_per_seq + blk * pages_per_block
        for p in range(pages_per_block):
            @pl.when(_page_valid(bb, ii, blk, p))
            def _wait(p=p):
                _page_copy(k_pages, k_buf, k_sems, table_ref,
                           table_base=base, j=p, slot=slot,
                           num_pages=num_pages).wait()
                _page_copy(v_pages, v_buf, v_sems, table_ref,
                           table_base=base, j=p, slot=slot,
                           num_pages=num_pages).wait()

    def next_valid_cell(bb, ii, blk):
        """Lexicographic successor over LIVE (b, i, kv-block) cells."""
        blk1 = blk + 1
        row_done = jnp.logical_or(blk1 > _last_block(bb, ii),
                                  blk1 >= max_blocks)
        ii1 = jnp.where(row_done, ii + 1, ii)
        seq_done = jnp.logical_or(
            ii1 >= num_q_blocks,
            jnp.logical_not(_cell_live(bb, jnp.minimum(ii1, num_q_blocks - 1))),
        )
        seq_done = jnp.logical_and(row_done, seq_done)
        ii1 = jnp.where(seq_done, 0, ii1)
        bb1 = jnp.where(seq_done, bb + 1, bb)

        def skip_dead(carry):
            return jnp.logical_and(
                carry < batch,
                _q_rows(jnp.minimum(carry, batch - 1)) == 0,
            )

        bb2 = jax.lax.while_loop(skip_dead, lambda c: c + 1, bb1)
        bbc = jnp.minimum(bb2, batch - 1)
        blk1 = jnp.where(row_done, _first_block(bbc, ii1), blk1)
        if window_left >= 0 and sinks > 0:
            # skip the sink-to-window gap so the pipeline only prefetches
            # cells that compute
            lo_blk = _row_lo(bbc, ii1) // bt
            in_gap = jnp.logical_and(blk1 * bt >= sinks,
                                     (blk1 + 1) * bt <= _row_lo(bbc, ii1))
            blk1 = jnp.where(in_gap, lo_blk, blk1)
        return bb2, ii1, blk1

    live = _cell_live(b, i)
    blk_ok = jnp.logical_and(j >= _first_block(b, i), j <= _last_block(b, i))
    if window_left >= 0 and sinks > 0:
        # exclude the invisible gap between the sink prefix and the window
        in_gap = jnp.logical_and(j * bt >= sinks,
                                 (j + 1) * bt <= _row_lo(b, i))
        blk_ok = jnp.logical_and(blk_ok, jnp.logical_not(in_gap))
    run = jnp.logical_and(live, blk_ok)

    @pl.when(jnp.logical_and(jnp.logical_not(live), j == 0))
    def _dead_out():
        o_ref[0, 0] = jnp.zeros_like(o_ref[0, 0])
        if lse_ref is not None:
            lse_ref[0, 0] = jnp.full_like(lse_ref[0, 0], -jnp.inf)

    @pl.when(run)
    def _compute():
        @pl.when(j == _first_block(b, i))
        def _init_stats():
            m_scr[...] = jnp.full_like(m_scr, _MASK)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        @pl.when(state_ref[0] == 0)
        def _bootstrap():
            state_ref[0] = 1
            state_ref[1] = 0
            start_block(b, i, j, 0)

        slot = state_ref[1]
        nb, ni, nj = next_valid_cell(b, i, j)

        @pl.when(nb < batch)
        def _prefetch():
            start_block(nb, ni, nj, 1 - slot)
            state_ref[1] = 1 - slot

        wait_block(b, i, j, slot)

        rows = group * block_q
        rows_p = max(8, -(-rows // 8) * 8)
        # absolute q position of each row: rows are [group, bq] flattened
        # (head-group major keeps each head's rows contiguous for the MXU)
        r_in_q = jax.lax.broadcasted_iota(jnp.int32, (rows_p, bt), 0) % block_q
        pos = qstart_ref[b] + i * block_q + r_in_q
        if pack2:  # paired int4: kv columns are in [evens, odds] order
            col = _pair_permute_iota(rows_p, bt, j * bt)
        else:
            col = jax.lax.broadcasted_iota(
                jnp.int32, (rows_p, bt), 1) + j * bt
        vis = col < lens_ref[b]
        if banded:
            vis = jnp.logical_and(vis, col <= pos + window_right)
        if window_left >= 0:
            in_win = col >= pos - window_left
            if sinks > 0:
                in_win = jnp.logical_or(in_win, col < sinks)
            vis = jnp.logical_and(vis, in_win)

        for h in range(num_kv_heads):
            q = q_ref[0, 0, h]  # [group*bq, d]
            if pack2:  # paired int4 rows -> [bt, d], [evens, odds] order
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
                sc = sc * k_scale_ref[0, 0, 0, h : h + 1, :]
            if softcap:
                sc = jnp.tanh(sc * softcap_mul) * softcap  # Gemma2 softcap
            sc = sc * scale_log2e
            if slopes_ref is not None:
                # ALiBi, top-left-aligned |pos - col| on absolute
                # positions; slopes arrive pre-multiplied by log2(e) so
                # the bias lands in the scaled log2 domain of sc
                sc = sc - slopes_ref[h][:, :1] * jnp.abs(
                    pos[: sc.shape[0]] - col[: sc.shape[0]]
                ).astype(jnp.float32)
            sc = jnp.where(vis[: sc.shape[0]], sc, _MASK)

            m_prev = m_scr[h]
            l_prev = l_scr[h]
            m_cur = jnp.max(sc, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(sc - m_next[:, :1])
            l_scr[h] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_scr[h] = m_next
            if quantized:
                p = p * v_scale_ref[0, 0, 0, h : h + 1, :]
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_scr[h] = acc_scr[h] * alpha[:, :1] + pv

        @pl.when(j == _last_block(b, i))
        def _store():
            l = l_scr[...][:, :, :1]
            # Rows with NO visible column (left window past the end of a
            # shorter kv range) leave m at its _MASK init while
            # p = exp2(_MASK - _MASK) = 1 pollutes l/acc uniformly;
            # detect via m and zero the row (see kernels/prefill.py).
            dead = m_scr[...][:, :, :1] <= _MASK * 0.5
            bad = jnp.logical_or(dead, jnp.logical_or(l == 0.0, jnp.isnan(l)))
            l_safe = jnp.where(bad, 1.0, l)
            o_ref[0, 0] = jnp.where(dead, 0.0, acc_scr[...] / l_safe)
            if lse_ref is not None:
                # natural-log LSE (m is in the scaled log2 domain); -inf
                # on rows with no visible column — the cross-chip /
                # deferred merge convention of kernels/paged.py:395
                lse = m_scr[...][:, :, :1] * _LN2 + jnp.log(l_safe)
                lse = jnp.where(bad, -jnp.inf, lse)
                lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def paged_prefill_attention(
    q: jax.Array,  # [batch, sq, num_heads, head_dim]
    k_pages: jax.Array,  # [hkv, num_pages, page, d]
    v_pages: jax.Array,
    lengths: jax.Array,  # [batch] int32: visible cache length (incl. chunk)
    q_start: jax.Array,  # [batch] int32: absolute position of q[:, 0]
    block_table: jax.Array,  # [batch, pages_per_seq] int32
    *,
    q_lens: Optional[jax.Array] = None,  # [batch] int32 real q rows
    k_scales: Optional[jax.Array] = None,
    v_scales: Optional[jax.Array] = None,
    softmax_scale: Optional[float] = None,
    causal: bool = True,
    window_left: int = -1,
    window_right: int = -1,
    block_q: int = 256,
    pages_per_compute_block: Optional[int] = None,
    interpret: Optional[bool] = None,
    logit_softcap: float = 0.0,
    quant_dtype: Optional[str] = None,
    sink_tokens: int = 0,
    alibi_slopes: Optional[jax.Array] = None,
    return_lse: bool = False,
) -> jax.Array:
    """Chunk prefill against a paged KV cache. Returns [b, sq, h, d]
    (with return_lse, also the natural-log row LSE [b, h, sq] fp32,
    -inf on rows with no visible column — for cross-chip combines).

    q_lens defaults to lengths - q_start (the chunk covers the cache tail).
    Rows past q_lens[b] are garbage (callers slice by true chunk length).
    The chunk's own K/V must already be written to the pages
    (write-then-attend, like the serving decode path). causal=False gives
    full visibility to lengths[b] (varlen non-causal semantics) unless a
    window bounds it: row at absolute position p = q_start[b] + r sees
    columns c with p - window_left <= c <= p + window_right (either side
    -1 = unbounded), the same top-left band alignment as the non-paged
    varlen kernel. causal=True is exactly the window_right == 0 band.
    """
    if causal:
        window_right = 0
    batch, sq, num_heads, head_dim = q.shape
    num_kv_heads, num_pages, page_rows, pwidth = k_pages.shape
    group = num_heads // num_kv_heads
    pages_per_seq = block_table.shape[1]
    quantized = k_scales is not None
    # int4: row-paired pages (see kernels/paged.py:_unpack_int4)
    pack2 = quant_dtype == "int4"
    if pack2 and not quantized:
        raise ValueError("int4 pages require k_scales/v_scales")
    # fp8 pools ride the int8 DMA path as bit patterns (float8 moves are
    # ~10x slower in Mosaic on this chip — see kernels/paged.py)
    fp8 = quantized and (quant_dtype == "fp8"
                         or k_pages.dtype == jnp.float8_e4m3fn)
    if fp8 and k_pages.dtype != jnp.int8:
        if k_pages.dtype != jnp.float8_e4m3fn:
            raise ValueError(f"fp8 pages must be float8_e4m3fn or int8 "
                             f"bits, got {k_pages.dtype}")
        k_pages = jax.lax.bitcast_convert_type(k_pages, jnp.int8)
        v_pages = jax.lax.bitcast_convert_type(v_pages, jnp.int8)
    page_size = page_rows * 2 if pack2 else page_rows
    if pwidth < head_dim:
        raise ValueError(
            f"page width {pwidth} < head_dim {head_dim}: pages must be "
            f"created with a 128-lane-padded width (cache layer does this)")
    hd_p = pwidth  # narrow head dims are stored 128-lane padded
    if softmax_scale is None:
        softmax_scale = softmax_scale_default(head_dim)
    if interpret is None:
        interpret = default_interpret()

    bq = min(block_q, round_up(sq, 8))
    sq_p = round_up(sq, bq)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0), (0, 0)))
    num_q_blocks = sq_p // bq

    if pages_per_compute_block is None:
        budget = 16 * 1024 * 1024
        per_page = 4 * num_kv_heads * page_rows * pwidth * k_pages.dtype.itemsize
        pages_per_compute_block = max(1, min(pages_per_seq,
                                             budget // per_page))
    ppb = pages_per_compute_block
    bt = ppb * page_size
    max_blocks = cdiv(pages_per_seq, ppb)

    rows = group * bq
    rows_p = max(8, round_up(rows, 8))
    # [b, nq, hkv, group*bq, d] with rows [group, bq] flattened
    qg = jnp.transpose(
        q.reshape(batch, num_q_blocks, bq, num_kv_heads, group, head_dim),
        (0, 1, 3, 4, 2, 5),
    ).reshape(batch, num_q_blocks, num_kv_heads, rows, head_dim)
    if rows_p != rows or hd_p != head_dim:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, 0), (0, rows_p - rows),
                          (0, hd_p - head_dim)))
    if quantized and qg.dtype not in (jnp.bfloat16, jnp.float32):
        qg = qg.astype(jnp.bfloat16)

    lens32 = jnp.asarray(lengths, jnp.int32)
    qstart32 = jnp.asarray(q_start, jnp.int32)
    if q_lens is None:
        qlens32 = jnp.maximum(lens32 - qstart32, 0)
    else:
        qlens32 = jnp.asarray(q_lens, jnp.int32)
    table_flat = jnp.asarray(block_table, jnp.int32).reshape(-1)

    in_specs = [
        pl.BlockSpec((1, 1, num_kv_heads, rows_p, hd_p),
                     lambda b, i, j, *refs: (b, i, 0, 0, 0)),
    ]
    inputs = [qg]
    if alibi_slopes is not None:
        if logit_softcap:
            raise ValueError("alibi_slopes and logit_softcap are exclusive")
        # per-ROW slopes: rows are [group, bq] flattened per kv head;
        # pre-multiplied by log2(e) (kernel scores are scaled log2-domain)
        sl = (jnp.asarray(alibi_slopes, jnp.float32) * _LOG2E).reshape(
            num_kv_heads, group)
        sl = jnp.repeat(sl, bq, axis=1)  # [hkv, group*bq]
        if rows_p != rows:
            sl = jnp.pad(sl, ((0, 0), (0, rows_p - rows)))
        sl = jnp.broadcast_to(sl[:, :, None],
                              (num_kv_heads, rows_p, _LANES))
        in_specs.append(pl.BlockSpec(
            (num_kv_heads, rows_p, _LANES), lambda b, i, j, *refs: (0, 0, 0)))
        inputs.append(sl)
    if quantized:
        def gather_scales(scales):
            # shared gather (kernels/paged.py) + a broadcast axis so the
            # q-block grid dimension views the same block
            return gather_page_scales(
                scales, block_table, batch, num_kv_heads, max_blocks, bt,
                pack2)[:, None]  # [b, 1, max_blocks, hkv, bt]

        # scales blocked on (b, j); the q-block axis views the same block
        scale_spec = pl.BlockSpec(
            (1, 1, 1, num_kv_heads, bt), lambda b, i, j, *refs: (b, 0, j, 0, 0)
        )
        in_specs += [scale_spec, scale_spec]
        inputs += [gather_scales(k_scales), gather_scales(v_scales)]
    in_specs += [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs += [k_pages, v_pages]

    body = functools.partial(
        _body,
        scale_log2e=(_LOG2E if logit_softcap
                     else float(softmax_scale) * _LOG2E),
        softcap=float(logit_softcap),
        softcap_mul=(float(softmax_scale) / float(logit_softcap)
                     if logit_softcap else 0.0),
        page_size=page_size,
        pages_per_block=ppb,
        pages_per_seq=pages_per_seq,
        batch=batch,
        num_q_blocks=num_q_blocks,
        block_q=bq,
        num_kv_heads=num_kv_heads,
        group=group,
        num_pages=num_pages,
        max_blocks=max_blocks,
        quantized=quantized,
        pack2=pack2,
        fp8=fp8,
        head_dim=head_dim,
        sinks=int(sink_tokens) if window_left >= 0 else 0,
        window_left=window_left,
        window_right=window_right,
    )
    alibi = alibi_slopes is not None

    def kernel(lens, qst, qlns, table, q_ref, *rest_refs):
        rest = list(rest_refs)
        slopes = rest.pop(0) if alibi else None
        ks = rest.pop(0) if quantized else None
        vs = rest.pop(0) if quantized else None
        kp, vp, o_ref = rest[:3]
        rest = rest[3:]
        lse_ref = rest.pop(0) if return_lse else None
        return body(lens, qst, qlns, table, q_ref, slopes, ks, vs,
                    kp, vp, o_ref, lse_ref, *rest)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(batch, num_q_blocks, max_blocks),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, num_kv_heads, rows_p, hd_p),
                         lambda b, i, j, *refs: (b, i, 0, 0, 0)),
        ] + ([pl.BlockSpec((1, 1, num_kv_heads, rows_p, _LANES),
                           lambda b, i, j, *refs: (b, i, 0, 0, 0))]
             if return_lse else []),
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

    o_parts, *lse_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(
                (batch, num_q_blocks, num_kv_heads, rows_p, hd_p),
                jnp.float32,
            ),
        ] + ([jax.ShapeDtypeStruct(
                (batch, num_q_blocks, num_kv_heads, rows_p, _LANES),
                jnp.float32)] if return_lse else []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * batch * num_heads * sq
                      * pages_per_seq * page_size * head_dim),
            bytes_accessed=int(
                2 * batch * num_kv_heads * pages_per_seq * page_size
                * head_dim * k_pages.dtype.itemsize * num_q_blocks
            ),
            transcendentals=int(batch * num_heads * sq * pages_per_seq
                                * page_size),
        ),
        interpret=interpret,
    )(lens32, qstart32, qlens32, table_flat, *inputs)

    # [b, nq, hkv, group, bq, d] -> [b, sq, h, d]
    out = o_parts[:, :, :, :rows, :head_dim].reshape(
        batch, num_q_blocks, num_kv_heads, group, bq, head_dim
    )
    out = jnp.transpose(out, (0, 1, 4, 2, 3, 5)).reshape(
        batch, sq_p, num_heads, head_dim
    )
    out = out[:, :sq].astype(q.dtype)
    if not return_lse:
        return out
    # [b, nq, hkv, rows, 1] rows=[group, bq] -> [b, h, sq]
    lse = lse_out[0][:, :, :, :rows, 0].reshape(
        batch, num_q_blocks, num_kv_heads, group, bq)
    lse = jnp.transpose(lse, (0, 2, 3, 1, 4)).reshape(
        batch, num_heads, sq_p)[:, :, :sq]
    return out, lse
