"""Pallas TPU flash-attention prefill (forward) kernel.

TPU-native re-design of the reference CUDA prefill kernel
(csrc/mfa/prefill.cuh:711-803). Capabilities reproduced:

- Tiled Q-block x KV-block online-softmax loop (reference hot loop
  prefill.cuh:760-791) — here the KV loop is the innermost ("arbitrary")
  grid dimension with fp32 m/l/acc scratch carried across iterations.
- exp2-based softmax with the scale pre-multiplied by log2(e)
  (reference: csrc/mfa/api.cpp:99-100).
- Causal masking with whole-block skipping (reference n_block_max pruning,
  prefill.cuh:749-752). On TPU the grid is static, so skipping is done with
  `pl.when` on the compute plus *clamped KV index maps* so that skipped
  iterations re-address the previous block and trigger no new DMA.
- GQA/MQA head folding kv_head = q_head // group (prefill.cuh:49) done in
  the K/V BlockSpec index maps — no KV duplication in HBM.
- Arbitrary (non-tile-multiple) sequence lengths via in-kernel column
  masking (replaces the reference's per-CTA early exit + zero-fill
  predication, prefill.cuh:142-153, 724-726).
- Sliding-window masking (the reference carries window params but never
  exposes them, _C.pyi:4-41; here they are first-class).
- expsum==0 / NaN guard on the final normalization (prefill.cuh:599-612).

The MMA/ldmatrix/swizzle machinery of the reference (prefill.cuh:317-364,
traits.h:39-47) has no hand-written analog here: tiles are fed to the MXU
with `jax.lax.dot_general` and Mosaic owns layout.
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
    choose_prefill_config,
    default_interpret,
    round_up,
    softmax_scale_default,
)

_LOG2E = math.log2(math.e)
_LN2 = math.log(2.0)
# Large negative, safe in fp32 exp2 (exp2(x - m) flushes to 0, never NaN).
_MASK = -1e30


def _prefill_kernel(*refs, **params):
    """Rectangular-grid variant: (batch, heads, q_blocks, kv_blocks); kv
    blocks outside the visible band idle behind `run` (used when there is
    no band to prune)."""
    i = pl.program_id(2)  # q block index
    j = pl.program_id(3)  # kv block index
    first_j, last_j = _kv_block_bounds(
        i, params["block_q"], params["block_k"], params["num_kv_blocks"],
        params["window_left"], params["window_right"],
        params.get("kv_off", 0),
    )
    run = jnp.logical_and(j >= first_j, j <= last_j)
    _prefill_body(i, j, run, first_j, last_j, *refs, **params)


def _prefill_tri_kernel(imap_ref, jmap_ref, *refs, **params):
    """Triangular-grid variant: the (q_block, kv_block) plane is flattened
    to only the LIVE cells of the causal/window band, enumerated by the
    scalar-prefetched (imap, jmap) tables. This is the exact TPU analog of
    the reference's n_block_max grid pruning (prefill.cuh:749-752): where
    CUDA sizes the grid per-CTA and exits early, a TPU grid is static — so
    the dead cells are never enumerated at all. At seqlen 8k with 1024
    tiles, 44% of the rectangular grid is dead; here it costs nothing."""
    t = pl.program_id(2)
    i = imap_ref[t]
    j = jmap_ref[t]
    first_j, last_j = _kv_block_bounds(
        i, params["block_q"], params["block_k"], params["num_kv_blocks"],
        params["window_left"], params["window_right"],
        params.get("kv_off", 0),
    )
    _prefill_body(i, j, None, first_j, last_j, *refs, **params)


def _prefill_body(
    i,
    j,
    run,
    first_j,
    last_j,
    *refs,
    scale_log2e: float,
    block_q: int,
    block_k: int,
    seqlen_k: int,
    num_kv_blocks: int,
    window_left: int,
    window_right: int,
    with_lse: bool,
    softcap: float = 0.0,
    softcap_mul: float = 0.0,
    sinks: int = 0,
    alibi: bool = False,
    diag_sub: int = 0,
    kv_off: int = 0,
):
    if alibi:  # per-head ALiBi slope rides as an extra input block
        (q_ref, k_ref, v_ref, slopes_ref, o_ref, lse_ref,
         m_scr, l_scr, acc_scr) = refs
    else:
        q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr = refs
        slopes_ref = None

    # with sinks, a q block's first enumerated cell is sink block 0
    # (the triangular table lists sink blocks ahead of the window band)
    init_j = 0 if sinks > 0 else first_j

    @pl.when(j == init_j)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _MASK)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # Mask only the blocks that need it (reference prefill.cuh:774-778):
    # the flash inner loop is VPU-bound at d=128, and the iota/compare/
    # select chain is a large share of the per-block vector work. A block
    # is mask-free iff it is fully inside the sequence AND fully inside
    # the visibility window of every row it covers.
    # kv_off shifts every q row's ABSOLUTE position by +kv_off relative to
    # the kv columns (ring attention pairs: q chunk leads the visiting kv
    # chunk by a static step*chunk offset) — fold it into the row base.
    needs_tail = (j + 1) * block_k > seqlen_k
    needs_diag = jnp.bool_(False)
    if window_right >= 0:
        needs_diag = ((j + 1) * block_k - 1
                      > i * block_q + kv_off + window_right)
    if window_left >= 0:
        needs_diag = jnp.logical_or(
            needs_diag,
            j * block_k < (i + 1) * block_q + kv_off - 1 - window_left
        )
    needs_mask = jnp.logical_or(needs_tail, needs_diag)

    def _scores(q, k, row0, col0, nrows, ncols):
        """Raw (unscaled) scores for a q-slab x kv-slab pair; softcap /
        ALiBi applied. row0/col0 are the slab's global offsets."""
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if softcap:
            # Gemma2-style attention logit softcap: the scale folds into
            # the tanh argument (softcap_mul = scale/cap); thereafter s is
            # the FINAL logit and the caller sets scale_log2e = log2(e).
            s = jnp.tanh(s * softcap_mul) * softcap
        # s stays in the RAW score domain; the softmax scale is folded into
        # the exp2 argument below (s*c - m*c is one FMA pass over the tile,
        # where a separate `s *= c` pass would cost an extra full [bq, bk]
        # traversal — the inner loop is VPU-bound, reference analog
        # api.cpp:99-100 pre-multiplies for the same reason).
        if alibi:
            # slopes arrive pre-divided by the softmax scale so the bias
            # lands in the raw score domain; top-left-aligned |i - j|
            rowa = jax.lax.broadcasted_iota(jnp.int32, (nrows, 1), 0) + row0
            cola = jax.lax.broadcasted_iota(jnp.int32, (1, ncols), 1) + col0
            s = s - slopes_ref[0, 0, 0] * jnp.abs(rowa - cola).astype(jnp.float32)
        return s

    def _online_update(s, qsl, v):
        """Online-softmax update of the m/l/acc state rows in `qsl` with the
        score slab `s` and its value slab `v` (reference softmax state
        machine, prefill.cuh:452-483)."""
        m_prev = m_scr[qsl, :]  # [rows, LANES], raw domain
        l_prev = l_scr[qsl, :]
        m_cur = jnp.max(s, axis=1, keepdims=True)  # [rows, 1]
        m_next = jnp.maximum(m_prev, m_cur)  # lane-broadcast
        alpha = jnp.exp2((m_prev - m_next) * scale_log2e)
        # Subtract-FIRST, then scale. The algebraically equal
        # `s*c - m*c` form compiles to fma(s, c, -(m*c)), whose exact
        # s*c product minus the ROUNDED m*c leaves a residual of up to
        # ~ulp(|m*c|)/2 — for a fully-masked row (s == m == -1e30) that
        # is ~1e22, and exp2(+1e22) = inf poisons acc with inf*0 = NaN
        # on the next block's rescale. (s - m) is IEEE-exact at 0 for
        # s == m and can never be positive, so p <= 1 always.
        p = jnp.exp2((s - m_next[:, :1]) * scale_log2e)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[qsl, :] = m_next
        l_scr[qsl, :] = l_next
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[qsl, :] = acc_scr[qsl, :] * alpha[:, :1] + pv

    def _step(masked: bool):
        q = q_ref[0, 0]  # [block_q, d]
        k = k_ref[0, 0]  # [block_k, d]
        s = _scores(q, k, i * block_q + kv_off, j * block_k,
                    block_q, block_k)

        if masked:
            # Skinny iotas: [bq, 1] rows and [1, bk] cols broadcast inside
            # the compare, instead of materializing two full [bq, bk]
            # index planes (2 fewer full-tile passes on masked blocks).
            col = jax.lax.broadcasted_iota(
                jnp.int32, (1, block_k), 1) + j * block_k
            mask = col < seqlen_k
            if window_right >= 0 or window_left >= 0:
                row = jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, 1), 0) + i * block_q + kv_off
                if window_right >= 0:
                    mask = jnp.logical_and(mask, col <= row + window_right)
                if window_left >= 0:
                    in_window = col >= row - window_left
                    if sinks > 0:
                        # StreamingLLM attention sinks: the first `sinks`
                        # tokens stay visible through the window
                        in_window = jnp.logical_or(in_window, col < sinks)
                    mask = jnp.logical_and(mask, in_window)
            s = jnp.where(mask, s, _MASK)

        _online_update(s, slice(None), v_ref[0, 0])

    def _step_diag():
        """Causal diagonal cell (i == j, block_q == block_k, no window/tail)
        sub-tiled at diag_sub granularity. The sub-tile liveness pattern is
        POSITION-INDEPENDENT on the diagonal, so dead upper-triangle
        sub-tiles are skipped at trace time (never emitted) and only the
        diagonal sub-tiles carry a mask — and that mask is the static
        relative `col <= row`. This recovers the reference's block-skipping
        (prefill.cuh:749-752) *inside* the big tile: a monolithic bq x bq
        causal tile wastes ~half its FLOPs; at n = bq/diag_sub subdivisions
        the waste drops to 1/(n+1)."""
        nsub = block_q // diag_sub
        for qi in range(nsub):
            qsl = slice(qi * diag_sub, (qi + 1) * diag_sub)
            q = q_ref[0, 0, qsl]
            for kj in range(qi + 1):
                ksl = slice(kj * diag_sub, (kj + 1) * diag_sub)
                s = _scores(
                    q, k_ref[0, 0, ksl],
                    i * block_q + qi * diag_sub,
                    j * block_k + kj * diag_sub,
                    diag_sub, diag_sub,
                )
                if kj == qi:
                    row = jax.lax.broadcasted_iota(
                        jnp.int32, (diag_sub, 1), 0)
                    col = jax.lax.broadcasted_iota(
                        jnp.int32, (1, diag_sub), 1)
                    s = jnp.where(col <= row, s, _MASK)
                _online_update(s, qsl, v_ref[0, 0, ksl])

    # diag_sub > 0 is only set for pure top-left causal with bq == bk
    # (see prefill_attention), where the masked live cells are exactly
    # i == j plus the sequence-tail column.
    if diag_sub:
        fast = jnp.logical_and(i == j, jnp.logical_not(needs_tail))
    else:
        fast = jnp.bool_(False)
    do_masked = jnp.logical_and(needs_mask, jnp.logical_not(fast))
    do_plain = jnp.logical_not(needs_mask)
    if run is not None:
        fast = jnp.logical_and(run, fast)
        do_masked = jnp.logical_and(run, do_masked)
        do_plain = jnp.logical_and(run, do_plain)
    if diag_sub:
        pl.when(fast)(_step_diag)
    pl.when(do_masked)(lambda: _step(True))
    pl.when(do_plain)(lambda: _step(False))

    @pl.when(j == last_j)
    def _store():
        l = l_scr[:, :1]
        # expsum==0/NaN guard (reference prefill.cuh:599-612): fully-masked
        # rows produce zeros instead of NaN. A row with NO visible column
        # (left window past the end of a shorter kv sequence) leaves m at
        # its _MASK init — and since masked scores are also _MASK,
        # p = exp2((_MASK - _MASK)*c) = 1 pollutes l/acc with a uniform
        # distribution rather than leaving l == 0; detect via m directly.
        dead = m_scr[:, :1] <= _MASK * 0.5
        bad = jnp.logical_or(dead, jnp.logical_or(l == 0.0, jnp.isnan(l)))
        l_safe = jnp.where(bad, 1.0, l)
        o = acc_scr[...] / l_safe
        o_ref[0, 0] = jnp.where(dead, 0.0, o).astype(o_ref.dtype)
        if with_lse:
            # m is in the raw score domain: LSE = m*scale + log(l).
            lse = m_scr[:, :1] * (scale_log2e * _LN2) + jnp.log(l_safe)
            lse = jnp.where(jnp.logical_or(l == 0.0, dead), -jnp.inf, lse)
            lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _bound_kernel(*refs, **params):
    """Rectangular-grid bound-softmax variant (see _bound_body)."""
    i = pl.program_id(2)
    j = pl.program_id(3)
    first_j, last_j = _kv_block_bounds(
        i, params["block_q"], params["block_k"], params["num_kv_blocks"],
        params["window_left"], params["window_right"],
        params.get("kv_off", 0),
    )
    run = jnp.logical_and(j >= first_j, j <= last_j)
    _bound_body(i, j, run, first_j, last_j, *refs, **params)


def _bound_tri_kernel(imap_ref, jmap_ref, *refs, **params):
    """Triangular-grid bound-softmax variant (see _bound_body)."""
    t = pl.program_id(2)
    i = imap_ref[t]
    j = jmap_ref[t]
    first_j, last_j = _kv_block_bounds(
        i, params["block_q"], params["block_k"], params["num_kv_blocks"],
        params["window_left"], params["window_right"],
        params.get("kv_off", 0),
    )
    _bound_body(i, j, None, first_j, last_j, *refs, **params)


def _bound_body(
    i,
    j,
    run,
    first_j,
    last_j,
    q_ref,
    k_ref,
    v_ref,
    maxk_ref,
    o_ref,
    lse_ref,
    flag_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    scale_log2e: float,
    block_q: int,
    block_k: int,
    seqlen_k: int,
    num_kv_blocks: int,
    window_left: int,
    window_right: int,
    with_lse: bool,
    sinks: int = 0,
    kv_off: int = 0,
    diag_sub: int = 0,
):
    """Max-free ("bound softmax") flash tile: the per-row running max is
    replaced by a FIXED upper bound b_i = |q_i|_2 * max_j |k_j|_2
    (Cauchy-Schwarz), computed once per q block at init. Softmax is
    shift-invariant, so the result is exact as long as the winning entry
    of each row does not underflow exp2 (arg > ~-126); `flag` records
    min_row(l) per q block so the caller can detect total-underflow rows
    (l == 0) and rerun the classic max-tracking kernel — which on real
    data never triggers (RMS-normed activations give |q||k| ~ 1e2, four
    orders below the ~1e3 raw-score underflow horizon at d=128).

    Why: the online rowmax reduce + alpha-rescale chain is pure VPU time
    ON TOP of the exp2/sum passes, measured at ~15% of the whole kernel
    (probe: 137.4 -> 158.6 raw TFLOP/s with max tracking stripped, vs a
    159.5 dots-only ceiling). The reference CUDA kernel tracks the max for
    free alongside tensor-core MMAs (prefill.cuh:452-483); on TPU the VPU
    is the bottleneck, so the TPU-native design removes the reduce from
    the hot loop entirely instead of overlapping it.
    """
    init_j = 0 if sinks > 0 else first_j

    @pl.when(j == init_j)
    def _init():
        qf = q_ref[0, 0].astype(jnp.float32)
        qn = jnp.sqrt(jnp.sum(qf * qf, axis=1, keepdims=True))  # [bq, 1]
        m_scr[...] = jnp.broadcast_to(
            qn * maxk_ref[0, 0, :1, :1], m_scr.shape)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    needs_tail = (j + 1) * block_k > seqlen_k
    needs_diag = jnp.bool_(False)
    if window_right >= 0:
        needs_diag = ((j + 1) * block_k - 1
                      > i * block_q + kv_off + window_right)
    if window_left >= 0:
        needs_diag = jnp.logical_or(
            needs_diag,
            j * block_k < (i + 1) * block_q + kv_off - 1 - window_left
        )
    needs_mask = jnp.logical_or(needs_tail, needs_diag)

    def _step(masked: bool):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if masked:
            col = jax.lax.broadcasted_iota(
                jnp.int32, (1, block_k), 1) + j * block_k
            mask = col < seqlen_k
            if window_right >= 0 or window_left >= 0:
                row = jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, 1), 0) + i * block_q + kv_off
                if window_right >= 0:
                    mask = jnp.logical_and(mask, col <= row + window_right)
                if window_left >= 0:
                    in_window = col >= row - window_left
                    if sinks > 0:
                        in_window = jnp.logical_or(in_window, col < sinks)
                    mask = jnp.logical_and(mask, in_window)
            s = jnp.where(mask, s, _MASK)
        # The fixed bound makes this the WHOLE per-tile vector chain:
        # one fused FMA+exp2 pass and one rowsum pass.
        p = jnp.exp2(s * scale_log2e - m_scr[:, :1] * scale_log2e)
        l_scr[...] = l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0, 0]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] + pv

    def _step_diag():
        """Causal diagonal cell (i == j, block_q == block_k, no tail),
        COLUMN-subtiled into tall slabs. Because the bound-softmax update
        is purely additive (no running max, no alpha rescale), the dead
        upper triangle can be dropped at trace time by pairing kv column
        slab [c0, c0+diag_sub) with only the q rows that can see it
        (rows >= c0): each sub-dot is a tall [bq - c0, diag_sub] MXU call
        and executed FLOPs drop from bq^2 to ~bq^2 * (1 + 1/n)/2 at
        n = bq/diag_sub slabs. The classic path can't do this cheaply —
        its per-slab m/l/acc online chain over overlapping row ranges
        costs more VPU time than the dead triangle costs MXU time
        (measured: diag_block=256 classic 61.7 vs 71.3 TFLOP/s monolith)."""
        nsub = block_k // diag_sub
        for c in range(nsub):
            c0 = c * diag_sub
            qsl = slice(c0, block_q)
            q = q_ref[0, 0, qsl]                       # [bq - c0, d]
            kk = k_ref[0, 0, c0:c0 + diag_sub]         # [dsub, d]
            s = jax.lax.dot_general(
                q, kk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # relative mask: slab row r_rel is absolute tile row r_rel+c0,
            # slab col c_rel is absolute tile col c_rel+c0 -> live iff
            # c_rel <= r_rel. Only the first diag_sub rows have any dead
            # entries, but one skinny-iota select over the slab is cheap.
            rowa = jax.lax.broadcasted_iota(
                jnp.int32, (block_q - c0, 1), 0)
            cola = jax.lax.broadcasted_iota(
                jnp.int32, (1, diag_sub), 1)
            s = jnp.where(cola <= rowa, s, _MASK)
            p = jnp.exp2(s * scale_log2e - m_scr[qsl, :1] * scale_log2e)
            l_scr[qsl, :] = l_scr[qsl, :] + jnp.sum(p, axis=1, keepdims=True)
            vv = v_ref[0, 0, c0:c0 + diag_sub]
            pv = jax.lax.dot_general(
                p.astype(vv.dtype), vv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_scr[qsl, :] = acc_scr[qsl, :] + pv

    # diag_sub > 0 is only set for pure top-left causal with bq == bk
    # (see prefill_attention): the masked live cells are exactly i == j
    # plus the sequence-tail column, and tail cells keep the generic path.
    if diag_sub:
        fast = jnp.logical_and(i == j, jnp.logical_not(needs_tail))
    else:
        fast = jnp.bool_(False)
    do_masked = jnp.logical_and(needs_mask, jnp.logical_not(fast))
    do_plain = jnp.logical_not(needs_mask)
    if run is not None:
        fast = jnp.logical_and(run, fast)
        do_masked = jnp.logical_and(run, do_masked)
        do_plain = jnp.logical_and(run, do_plain)
    if diag_sub:
        pl.when(fast)(_step_diag)
    pl.when(do_masked)(lambda: _step(True))
    pl.when(do_plain)(lambda: _step(False))

    @pl.when(j == last_j)
    def _store():
        l = l_scr[:, :1]
        l_safe = jnp.where(jnp.logical_or(l == 0.0, jnp.isnan(l)), 1.0, l)
        o_ref[0, 0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)
        if with_lse:
            lse = m_scr[:, :1] * (scale_log2e * _LN2) + jnp.log(l_safe)
            lse = jnp.where(l == 0.0, -jnp.inf, lse)
            lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])
        # Underflow flag: min l over rows that can legitimately see at
        # least one kv column. Rows with an EMPTY visible set (only
        # possible when a left window pushes past the end of a shorter
        # kv sequence) are excluded; q-padding rows always see columns
        # (top-left causal) so they never false-positive.
        row = jax.lax.broadcasted_iota(
            jnp.int32, (l.shape[0], 1), 0) + i * block_q + kv_off
        valid = jnp.ones_like(l, jnp.bool_)
        if window_left >= 0 and sinks == 0:
            valid = row - window_left < seqlen_k
        lv = jnp.where(valid, l, 1.0)
        flag_ref[0, 0] = jnp.broadcast_to(
            jnp.min(lv, axis=0, keepdims=True), flag_ref.shape[2:])


def _kv_block_bounds(i, block_q, block_k, num_kv_blocks, window_left,
                     window_right, kv_off=0):
    """Range of KV blocks intersecting q block i's visible window.
    kv_off: static amount by which q ABSOLUTE positions lead the kv
    columns (ring-attention pairs) — shifts the row base.

    first is clamped to last: when the window lies entirely past a
    SHORTER kv sequence the raw range would be empty (first > last) and,
    worse, first could index past the kv array — clamping runs one
    in-range, fully-masked block instead, whose rows the dead-row store
    guard then zeroes."""
    if window_right >= 0:
        last = jnp.minimum(
            num_kv_blocks - 1,
            ((i + 1) * block_q + kv_off - 1 + window_right) // block_k
        )
        last = jnp.maximum(last, 0)
    else:
        last = num_kv_blocks - 1
    if window_left >= 0:
        first = jnp.minimum(
            jnp.maximum(0, (i * block_q + kv_off - window_left) // block_k),
            last)
    else:
        first = 0
    return first, last


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal",
        "softmax_scale",
        "window_size",
        "block_q",
        "block_k",
        "return_lse",
        "interpret",
        "logit_softcap",
        "sink_tokens",
        "diag_block",
        "bound_softmax",
        "kv_position_offset",
    ),
)
def prefill_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    window_size: tuple[int, int] = (-1, -1),
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
    logit_softcap: float = 0.0,
    sink_tokens: int = 0,
    alibi_slopes: Optional[jax.Array] = None,
    diag_block: Optional[int] = None,
    bound_softmax: Optional[bool] = None,
    kv_position_offset: int = 0,
):
    """Flash-attention forward on [batch, heads, seq, head_dim] layout.

    q: [b, hq, sq, d]; k/v: [b, hkv, sk, d] with hq % hkv == 0.
    Returns [b, hq, sq, d] (and lse [b, hq, sq] fp32 if return_lse).

    Causal is top-left aligned (col > row masked), matching the reference
    (csrc/mfa/prefill.cuh:393-421); causal == window (-1, 0).

    kv_position_offset (static, >= 0): q row r sits at ABSOLUTE position
    r + kv_position_offset relative to the kv columns — causal/window
    masks and block pruning shift accordingly. This is how ring attention
    expresses a sliding window across chips: the pair (q chunk, visiting
    kv chunk from `step` hops back) is exactly this kernel with
    offset = step * chunk (shard/ring.py). ALiBi biases also use the
    shifted absolute distance.
    """
    batch, num_heads, sq, head_dim = q.shape
    _, num_kv_heads, sk, _ = k.shape
    group = num_heads // num_kv_heads
    if softmax_scale is None:
        softmax_scale = softmax_scale_default(head_dim)
    if interpret is None:
        interpret = default_interpret()
    window_left, window_right = window_size
    if causal:
        window_right = 0
    if sink_tokens and window_left < 0:
        sink_tokens = 0  # without a left window, sinks are a no-op
    kv_off = int(kv_position_offset)
    if kv_off < 0:
        raise ValueError("kv_position_offset must be >= 0 (q leads kv)")
    if kv_off and sink_tokens:
        raise NotImplementedError(
            "kv_position_offset with attention sinks is not supported "
            "(the ring path handles sink blocks on the owning shard)")

    cfg = choose_prefill_config(sq, sk, head_dim, q.dtype.itemsize)
    bq = block_q or cfg.block_q
    bk = block_k or cfg.block_k
    bq = min(bq, round_up(sq, 8))
    bk = min(bk, round_up(sk, 128))

    # Diagonal sub-tiling applies on the pure top-left-causal path with
    # square tiles; everything else (windows, sinks) keeps the generic
    # masked-monolith path.
    diag_ok = (window_left < 0 and window_right == 0 and sink_tokens == 0
               and kv_off == 0 and bq == bk)
    dsub = cfg.diag_block if diag_block is None else diag_block
    if not (diag_ok and dsub and bq > dsub and bq % dsub == 0):
        dsub = 0

    # Bound-softmax (max-free) fast path: exact whenever no row fully
    # underflows (see _bound_body); a per-block min-l flag output detects
    # the (adversarial-only) failure case and falls back to the classic
    # max-tracking kernel under lax.cond. Softcap changes the score
    # domain and ALiBi widens the underflow margin unboundedly — both
    # keep the classic path.
    if bound_softmax is None:
        bound_softmax = True
    use_bound = (bound_softmax and not logit_softcap
                 and alibi_slopes is None)
    if use_bound:
        # Column-subtiled diagonal (see _bound_body._step_diag); explicit
        # diag_block overrides. Measured on v5e (scripts/ab_bound.py,
        # b*s=32k tokens, h=24, d=128): at s=2048 (2 q blocks, diag cells
        # are 2/3 of the grid) 512-slabs win — 76.4 vs 64.8 (256) vs 67.2
        # (monolith) TFLOP/s; at s=8192 256/512 are within noise of each
        # other (126.8/121.0) and both beat the monolith (124.9). Finer
        # slabs lose everywhere (128: 56.6 at s=2048) — per-slab VPU
        # passes outgrow the skipped-triangle MXU savings. The classic
        # fallback inside the lax.cond stays monolithic (its online
        # chain makes subtiling a loss: 61.7 vs 71.3).
        if diag_block is not None:
            bsub = diag_block
        else:
            bsub = 512 if cdiv(sq, bq) <= 2 else 256
        if not (diag_ok and bsub and bq > bsub and bq % bsub == 0):
            bsub = 0
        dsub = 0
    else:
        bsub = 0

    sq_p = round_up(sq, bq)
    sk_p = round_up(sk, bk)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    if sk_p != sk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))

    num_q_blocks = sq_p // bq
    num_kv_blocks = sk_p // bk

    def kv_index_map(b, h, i, j):
        first, last = _kv_block_bounds(i, bq, bk, num_kv_blocks,
                                       window_left, window_right, kv_off)
        return (b, h // group, jnp.clip(j, first, last), 0)

    kparams = dict(
        # with softcap, the scale is applied inside the tanh argument and
        # the softmax runs on the capped logits directly (scale 1)
        scale_log2e=(_LOG2E if logit_softcap
                     else float(softmax_scale) * _LOG2E),
        block_q=bq,
        block_k=bk,
        seqlen_k=sk,
        num_kv_blocks=num_kv_blocks,
        window_left=window_left,
        window_right=window_right,
        with_lse=return_lse,
        softcap=float(logit_softcap),
        softcap_mul=(float(softmax_scale) / float(logit_softcap)
                     if logit_softcap else 0.0),
        sinks=int(sink_tokens),
        alibi=alibi_slopes is not None,
        diag_sub=int(dsub),
        kv_off=kv_off,
    )
    if alibi_slopes is not None:
        if logit_softcap:
            raise ValueError("alibi_slopes and logit_softcap are exclusive")
        # pre-divide by the scale: the kernel's scores are raw (unscaled)
        slopes_in = jnp.broadcast_to(
            (jnp.asarray(alibi_slopes, jnp.float32)
             / float(softmax_scale))[:, None, None],
            (num_heads, 8, LANES),  # 8 sublanes: Mosaic block tiling
        )
    kernel = functools.partial(_prefill_kernel, **kparams)

    out_shapes = [
        jax.ShapeDtypeStruct((batch, num_heads, sq_p, head_dim), q.dtype),
        jax.ShapeDtypeStruct((batch, num_heads, sq_p, LANES), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, bq, head_dim), lambda b, h, i, j: (b, h, i, 0)),
        pl.BlockSpec((1, 1, bq, LANES), lambda b, h, i, j: (b, h, i, 0)),
    ]
    if not return_lse:
        out_shapes = out_shapes[:1]
        out_specs = out_specs[:1]

    flops_mult = 0.5 if window_right == 0 and sq == sk else 1.0
    scratch_shapes = [
        pltpu.VMEM((bq, LANES), jnp.float32),
        pltpu.VMEM((bq, LANES), jnp.float32),
        pltpu.VMEM((bq, head_dim), jnp.float32),
    ]
    cost = pl.CostEstimate(
        flops=int(4 * batch * num_heads * sq * sk * head_dim * flops_mult),
        bytes_accessed=int(
            q.size * q.dtype.itemsize
            + (k.size + v.size) * k.dtype.itemsize * num_q_blocks * flops_mult
        ),
        transcendentals=int(batch * num_heads * sq * sk * flops_mult),
    )

    # Live (q_block, kv_block) cells of the visibility band (python mirror
    # of _kv_block_bounds). When the band prunes anything, flatten the two
    # block axes to just these cells (triangular grid) so dead cells are
    # never enumerated — the reference's n_block_max pruning, inverted for
    # TPU's static grids.
    sink_blocks = cdiv(int(sink_tokens), bk) if sink_tokens else 0
    cells_i, cells_j = [], []
    for bi in range(num_q_blocks):
        last = (num_kv_blocks - 1 if window_right < 0 else
                max(0, min(num_kv_blocks - 1,
                           ((bi + 1) * bq + kv_off - 1 + window_right)
                           // bk)))
        # first clamps to last (mirror of _kv_block_bounds): an empty raw
        # band still enumerates one in-range masked block so the cell is
        # visited and its dead rows store zeros
        first = (0 if window_left < 0
                 else min(max(0, (bi * bq + kv_off - window_left) // bk),
                          last))
        # attention-sink blocks stay visible ahead of the window band
        for bj in range(min(sink_blocks, first)):
            cells_i.append(bi)
            cells_j.append(bj)
        for bj in range(first, last + 1):
            cells_i.append(bi)
            cells_j.append(bj)
    # Sinks REQUIRE the triangular grid: only its cell table enumerates
    # the sink blocks sitting below the window band — the rectangular
    # kernel's `run` gate and clamped kv index maps skip everything
    # outside [first_j, last_j], silently dropping sink attention when
    # the sink cells happen to fill the pruned gap exactly.
    use_tri = (len(cells_i) < num_q_blocks * num_kv_blocks
               or sink_blocks > 0)

    def _call(variant_kernel, tri_variant_kernel, extra_inputs=(),
              extra_in_specs=(), extra_out_shapes=(), extra_out_specs=(),
              n_scratch=3):
        v_out_shapes = out_shapes + list(extra_out_shapes)
        if use_tri:
            qo_map = lambda b, h, t, im, jm: (b, h, im[t], 0)  # noqa: E731
            kv_map = lambda b, h, t, im, jm: (b, h // group, jm[t], 0)  # noqa: E731
            tri_in_specs = [
                pl.BlockSpec((1, 1, bq, head_dim), qo_map),
                pl.BlockSpec((1, 1, bk, head_dim), kv_map),
                pl.BlockSpec((1, 1, bk, head_dim), kv_map),
            ] + [s(True) for s in extra_in_specs]
            v_out_specs = [
                pl.BlockSpec(spec.block_shape, qo_map) for spec in out_specs
            ] + [s(True) for s in extra_out_specs]
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(batch, num_heads, len(cells_i)),
                in_specs=tri_in_specs,
                out_specs=v_out_specs,
                scratch_shapes=scratch_shapes,
            )
            kern = (tri_variant_kernel if return_lse
                    else _drop_lse_arg(tri_variant_kernel, n_scratch))
            return pl.pallas_call(
                kern,
                grid_spec=grid_spec,
                out_shape=v_out_shapes,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel", "arbitrary"),
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
                cost_estimate=cost,
                interpret=interpret,
            )(
                jnp.asarray(cells_i, jnp.int32),
                jnp.asarray(cells_j, jnp.int32),
                q, k, v, *extra_inputs,
            )
        rect_in_specs = [
            pl.BlockSpec((1, 1, bq, head_dim),
                         lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bk, head_dim), kv_index_map),
            pl.BlockSpec((1, 1, bk, head_dim), kv_index_map),
        ] + [s(False) for s in extra_in_specs]
        v_out_specs = out_specs + [s(False) for s in extra_out_specs]
        kern = (variant_kernel if return_lse
                else _drop_lse_arg(variant_kernel, n_scratch))
        return pl.pallas_call(
            kern,
            grid=(batch, num_heads, num_q_blocks, num_kv_blocks),
            in_specs=rect_in_specs,
            out_specs=v_out_specs,
            out_shape=v_out_shapes,
            scratch_shapes=scratch_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=cost,
            interpret=interpret,
        )(q, k, v, *extra_inputs)

    def call_classic():
        extra_inputs, extra_in_specs = (), ()
        if alibi_slopes is not None:
            extra_inputs = (slopes_in,)
            extra_in_specs = (
                lambda tri: pl.BlockSpec(
                    (1, 8, LANES),
                    (lambda b, h, t, im, jm: (h, 0, 0)) if tri
                    else (lambda b, h, i, j: (h, 0, 0))),
            )
        outs = _call(kernel, functools.partial(_prefill_tri_kernel,
                                               **kparams),
                     extra_inputs, extra_in_specs)
        return tuple(outs) if isinstance(outs, (list, tuple)) else (outs,)

    if use_bound:
        bparams = dict(
            scale_log2e=kparams["scale_log2e"], block_q=bq, block_k=bk,
            seqlen_k=sk, num_kv_blocks=num_kv_blocks,
            window_left=window_left, window_right=window_right,
            with_lse=return_lse, sinks=int(sink_tokens), kv_off=kv_off,
            diag_sub=int(bsub),
        )
        kf32 = k.astype(jnp.float32)
        maxk = jnp.max(jnp.sqrt(jnp.sum(kf32 * kf32, axis=-1)),
                       axis=-1)  # [b, hkv]
        maxk_in = jnp.broadcast_to(maxk[:, :, None, None],
                                   (batch, num_kv_heads, 8, LANES))
        extra_inputs = (maxk_in,)
        extra_in_specs = (
            lambda tri: pl.BlockSpec(
                (1, 1, 8, LANES),
                (lambda b, h, t, im, jm: (b, h // group, 0, 0)) if tri
                else (lambda b, h, i, j: (b, h // group, 0, 0))),
        )
        # Mosaic requires the block's second-minor dim be a multiple of 8
        # (sublanes), so the per-q-block flag occupies an 8-row stripe.
        extra_out_shapes = (jax.ShapeDtypeStruct(
            (batch, num_heads, num_q_blocks * 8, LANES), jnp.float32),)
        extra_out_specs = (
            lambda tri: pl.BlockSpec(
                (1, 1, 8, LANES),
                (lambda b, h, t, im, jm: (b, h, im[t], 0)) if tri
                else (lambda b, h, i, j: (b, h, i, 0))),
        )
        outs_b = _call(
            functools.partial(_bound_kernel, **bparams),
            functools.partial(_bound_tri_kernel, **bparams),
            extra_inputs, extra_in_specs, extra_out_shapes, extra_out_specs,
            n_scratch=4,
        )
        flag = outs_b[-1]
        risky = jnp.any(flag == 0.0)
        outs = jax.lax.cond(risky, call_classic,
                            lambda: tuple(outs_b[:-1]))
    else:
        outs = call_classic()

    if return_lse:
        out, lse = outs
        return out[:, :, :sq], lse[:, :, :sq, 0]
    out = outs[0] if isinstance(outs, (list, tuple)) else outs
    return out[:, :, :sq]


def _drop_lse_arg(kernel, n_tail=3):
    """Adapt the kernel signature when no LSE output exists: the lse ref
    sits immediately before the last `n_tail` refs (3 scratch refs; the
    bound variant adds its flag output ref ahead of them)."""

    def wrapped(*refs):
        return kernel(*refs[:-n_tail], None, *refs[-n_tail:])

    return wrapped
