"""Pallas TPU flash-attention prefill (forward) kernel.

TPU-native re-design of the reference CUDA prefill kernel
(csrc/mfa/prefill.cuh:711-803). Capabilities reproduced:

- Tiled Q-block x KV-block online-softmax loop (reference hot loop
  prefill.cuh:760-791) — here the whole (batch, head, q_block, kv_block)
  iteration space is FLATTENED to one "arbitrary" grid dimension whose
  live cells are enumerated by scalar-prefetched tables, so the Mosaic
  pipeline never drains at batch/head boundaries (measured: the
  (b, h, cell) grid stalled ~2us per (b, h) transition, which at
  b8/s2048 — 3 cells per (b, h) — was ~25% of the whole kernel).
- exp2-based softmax with the scale pre-multiplied by log2(e)
  (reference: csrc/mfa/api.cpp:99-100).
- Causal masking with whole-block skipping (reference n_block_max pruning,
  prefill.cuh:749-752). On TPU the grid is static, so dead (q, kv) cells
  are simply never enumerated in the cell table.
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

Three softmax engines share the wrapper (bound_softmax selects):

- classic (False): online-softmax with per-row running max (the
  reference's state machine, prefill.cuh:452-483).
- max-free prepass ("prepass"): the online-softmax shift is fixed at
  ZERO — one exp2 pass per tile, no rowmax reduce, no alpha rescale (on
  TPU the VPU, not the MXU, is the per-tile bottleneck at d=128).
  Softmax is shift-invariant, so this is exact for every block whose
  score range provably stays inside fp32 exp2 range
  (|q|max*|k|max*scale*log2e <= 100, checked per q block in a fused
  prepass, Cauchy-Schwarz); rare risky blocks run the classic body
  EMBEDDED in the same kernel behind `pl.when`. The prepass is a serial
  q+k HBM reduction: ~10% of the kernel at b8/s2048.
- max-free DEFERRED REPAIR (True, the default): the zero-shift kernel
  runs at full "unchecked" speed and DETECTS poisoned q blocks after
  the fact, from values already in registers (row sums outside
  (_L_MIN, finite), non-finite output rows — sufficient for every
  silent-corruption mode, see _L_MIN). A second near-empty kernel
  (_repair_kernel) recomputes exactly the flagged blocks with the
  classic algorithm, writing o/lse in place via input_output_aliases.
  Measured on v5e (scripts/probe_r4.py): 85.3 vs unchecked 87.3
  TFLOP/s at b8/s2048 (prepass: 79.8) and 139.0 vs 140.9 at b2/s8192.
  Rejected alternatives, both measured: whole-array lax.cond between
  two kernels round-trips operands (~0.5-0.7 ms); trailing in-kernel
  repair CELLS (same BlockSpec indices, manual DMA) stall the Mosaic
  pipeline ~1.9 us per cell (~0.5 ms).
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
# Max-free safety horizon: with the softmax shift m fixed at ZERO,
# p = exp2(s * scale_log2e) is exact as long as every |score| * scale
# stays within fp32 exp2 range — winning entries must not flush to 0
# (arg > -126) and p/l/acc must not overflow (arg + log2(block) < 128).
# |s| <= |q||k|, so blocks with |q|_max |k|_max * scale_log2e <= SAFE
# are provably exact; others take the embedded classic body. 100 leaves
# >= 26 doublings of headroom on both sides. See _bound_risky.
_BOUND_SAFE_LOG2 = 100.0
# Deferred-repair poison detector (default bound_softmax path): a
# zero-shift q block is UNPOISONED iff its row sums stay inside
# (_L_MIN, finite) and its output is finite. l <= block_k * p_max <= 2^11
# * p_max, so l > 2^-89 proves the row's max exp2 argument > -100 — every
# entry within 24 doublings of the winner then survives the fp32 flush
# (smaller ones vanish under classic rounding too). l == 0 (fully masked
# OR fully flushed) and inf/NaN l/acc all fail the check; flagged blocks
# are recomputed by the separate classic repair kernel (_repair_kernel).
_L_MIN = 2.0 ** -89


def _lane_partial_sum(p):
    """[rows, w] -> [rows, LANES] partial row sums (w a multiple of LANES).

    Defers the cross-lane reduction to the q-block epilogue: the hot loop
    does only full-vreg adds (no lane shuffles), and the single
    [rows, LANES] -> [rows, 1] reduce runs once per q block. Widths not a
    multiple of LANES (sub-128 diag slabs) fall back to a keepdims sum,
    which broadcasts against the [rows, LANES] accumulator."""
    w = p.shape[1]
    if w % LANES:
        return jnp.sum(p, axis=1, keepdims=True)
    acc = p[:, :LANES]
    for c0 in range(LANES, w, LANES):
        acc = acc + p[:, c0:c0 + LANES]
    return acc


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


def _band_mask(s, i, j, block_q, block_k, seqlen_k, window_left,
               window_right, sinks, kv_off, col0=0, ncols=None):
    """Apply the sequence-tail / causal / window mask to a score slab
    whose columns are [j*block_k + col0, ... + ncols). Skinny [bq,1]/[1,w]
    iotas broadcast inside the compares — no full index planes (the
    flash inner loop is VPU-bound, reference analog prefill.cuh:393-421)."""
    nrows = s.shape[0]
    ncols = s.shape[1] if ncols is None else ncols
    col = jax.lax.broadcasted_iota(jnp.int32, (1, ncols), 1) \
        + j * block_k + col0
    mask = col < seqlen_k
    if window_right >= 0 or window_left >= 0:
        row = jax.lax.broadcasted_iota(jnp.int32, (nrows, 1), 0) \
            + i * block_q + kv_off
        if window_right >= 0:
            mask = jnp.logical_and(mask, col <= row + window_right)
        if window_left >= 0:
            in_window = col >= row - window_left
            if sinks > 0:
                # StreamingLLM attention sinks: the first `sinks` tokens
                # stay visible through the window
                in_window = jnp.logical_or(in_window, col < sinks)
            mask = jnp.logical_and(mask, in_window)
    return jnp.where(mask, s, _MASK)


# --------------------------------------------------------------------------
# classic (online max-tracking) kernel
# --------------------------------------------------------------------------


def _prefill_body(
    i,
    j,
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
    # (the cell table lists sink blocks ahead of the window band)
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
        # the exp2 argument below.
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
            s = _band_mask(s, i, j, block_q, block_k, seqlen_k,
                           window_left, window_right, sinks, kv_off)
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
        o = acc_scr[...] * (1.0 / l_safe)
        o_ref[0, 0] = jnp.where(dead, 0.0, o).astype(o_ref.dtype)
        if with_lse:
            # m is in the raw score domain: LSE = m*scale + log(l).
            lse = m_scr[:, :1] * (scale_log2e * _LN2) + jnp.log(l_safe)
            lse = jnp.where(jnp.logical_or(l == 0.0, dead), -jnp.inf, lse)
            lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _prefill_flat_kernel(imap_ref, jmap_ref, *refs, ncells, **params):
    """Classic kernel on the flat grid: one 'arbitrary' dimension running
    batch-major / head / cell-inner; the (q_block, kv_block) cell is read
    from the scalar-prefetched tables."""
    c = pl.program_id(0) % ncells
    i = imap_ref[c]
    j = jmap_ref[c]
    first_j, last_j = _kv_block_bounds(
        i, params["block_q"], params["block_k"], params["num_kv_blocks"],
        params["window_left"], params["window_right"],
        params.get("kv_off", 0),
    )
    _prefill_body(i, j, first_j, last_j, *refs, **params)


def _prefill_bht_kernel(imap_ref, jmap_ref, *refs, ncells, **params):
    """Classic kernel on the (batch, head, cell) grid."""
    c = pl.program_id(2)
    i = imap_ref[c]
    j = jmap_ref[c]
    first_j, last_j = _kv_block_bounds(
        i, params["block_q"], params["block_k"], params["num_kv_blocks"],
        params["window_left"], params["window_right"],
        params.get("kv_off", 0),
    )
    _prefill_body(i, j, first_j, last_j, *refs, **params)


# --------------------------------------------------------------------------
# bound-softmax (max-free) kernel
# --------------------------------------------------------------------------


def _bound_body(
    i,
    j,
    risky,
    first_j,
    last_j,
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    lse_ref,
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
    kv_slab: int = 0,
    with_classic: bool = True,
    flag_ref=None,
):
    """Max-free flash tile with an EMBEDDED per-block classic fallback.

    Fast path: the online-softmax shift is fixed at ZERO — p is simply
    exp2(s * scale_log2e), no running max, no rescale, no bound input at
    all. Softmax is shift-invariant, so this is exact whenever every
    score the block can produce keeps exp2 within fp32 range; the caller
    proves |q|_max |k|_max * scale_log2e <= _BOUND_SAFE_LOG2 per q block
    in a fused prepass and ships one RISKY BIT per (b, h, q_block) via
    scalar prefetch. Rare risky blocks (adversarially scaled inputs)
    run the classic max-tracking body INSIDE this kernel behind pl.when —
    measured on v5e, the per-cell branch costs ~2 TFLOP/s where a
    whole-array lax.cond between two kernels cost ~15 (the cond
    round-trips the operands; b8/s2048 went 72 -> 87 TFLOP/s when it was
    removed). The reference CUDA kernel tracks the max for free alongside
    tensor-core MMAs (prefill.cuh:452-483); on TPU the VPU is the
    bottleneck, so the TPU-native design removes the reduce from the hot
    loop entirely instead of overlapping it.

    l_scr holds [bq, LANES] PARTIAL row sums (cross-lane reduce deferred
    to the store); kv_slab > 0 splits non-diagonal tiles into column
    slabs so Mosaic can overlap slab c+1's MXU dots with slab c's VPU
    exp2 pass. m_scr carries the classic running max for risky blocks
    and sits at exactly 0 for safe ones, which makes the store formulas
    (normalize + LSE + dead-row guard) shared by both paths.
    """
    init_j = 0 if sinks > 0 else first_j

    @pl.when(j == init_j)
    def _init():
        m_scr[...] = jnp.full_like(
            m_scr, jnp.where(risky, jnp.float32(_MASK), 0.0))
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

    def _slab_update(s, qsl, v):
        """Purely additive max-free update (shift fixed at 0): one exp2
        pass, partial-lane l sums, PV accumulate for the rows in qsl.
        Masked entries are s = -1e30 -> exp2(-huge) = 0 exactly."""
        p = jnp.exp2(s * scale_log2e)
        ps = _lane_partial_sum(p)
        if ps.shape[1] == 1:
            # sub-LANES slab: a full [rows, 1] sum — land it in lane 0
            # only (the store cross-lane-sums l_scr, so a broadcast add
            # would count it LANES times)
            l_scr[qsl, :1] = l_scr[qsl, :1] + ps
        else:
            l_scr[qsl, :] = l_scr[qsl, :] + ps
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[qsl, :] = acc_scr[qsl, :] + pv

    def _step(masked: bool):
        # l/pv accumulate in loop-carried VALUES and hit the scratch refs
        # ONCE per cell. On an isolated full-tile loop this beats per-slab
        # scratch RMW by ~5% (155.9 vs 148.5 TFLOP/s, probe_overlap.py);
        # inside the full kernel it measured neutral-to-+1% — kept for the
        # simpler dependency structure, not as a perf claim.
        q = q_ref[0, 0]
        width = kv_slab if kv_slab else block_k
        l_acc = None
        pv_acc = None
        for c in range(block_k // width):
            ksl = slice(c * width, (c + 1) * width)
            s = jax.lax.dot_general(
                q, k_ref[0, 0, ksl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if masked:
                s = _band_mask(s, i, j, block_q, block_k, seqlen_k,
                               window_left, window_right, sinks, kv_off,
                               col0=c * width)
            p = jnp.exp2(s * scale_log2e)
            ps = _lane_partial_sum(p)
            l_acc = ps if l_acc is None else l_acc + ps
            pv = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, 0, ksl],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            pv_acc = pv if pv_acc is None else pv_acc + pv
        l_scr[...] = l_scr[...] + l_acc
        acc_scr[...] = acc_scr[...] + pv_acc

    def _step_diag():
        """Causal diagonal cell (i == j, block_q == block_k, no tail),
        COLUMN-subtiled into tall slabs: kv column slab [c0, c0+diag_sub)
        is paired with only the q rows that can see it (rows >= c0), so
        the dead upper triangle is dropped at trace time — each sub-dot
        is a tall [bq - c0, diag_sub] MXU call and executed FLOPs drop
        from bq^2 to ~bq^2 * (1 + 1/n)/2 at n = bq/diag_sub slabs. Only
        additive updates make this cheap; the classic kernel's online
        chain over overlapping row ranges costs more VPU time than the
        dead triangle costs MXU time (measured: diag 256 classic 61.7 vs
        71.3 TFLOP/s monolith)."""
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
            _slab_update(s, qsl, v_ref[0, 0, c0:c0 + diag_sub])

    def _step_classic():
        """Embedded classic max-tracking body for RISKY blocks (scores
        can leave fp32 exp2 range with the zero shift). Always masked —
        this path is exactness-critical and rare, never hot."""
        q = q_ref[0, 0]
        s = jax.lax.dot_general(
            q, k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = _band_mask(s, i, j, block_q, block_k, seqlen_k,
                       window_left, window_right, sinks, kv_off)
        m_prev = m_scr[...]  # [bq, LANES], raw domain
        m_next = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp2((m_prev - m_next) * scale_log2e)
        # subtract-FIRST (see _prefill_body._online_update): the fused
        # s*c - m*c FMA leaves a +-1e22 residual when s == m == -1e30
        p = jnp.exp2((s - m_next[:, :1]) * scale_log2e)
        l_scr[...] = alpha * l_scr[...] + _lane_partial_sum(p)
        m_scr[...] = m_next
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    # diag_sub > 0 is only set for pure top-left causal with bq == bk
    # (see prefill_attention): the masked live cells are exactly i == j
    # plus the sequence-tail column, and tail cells keep the generic path.
    safe = jnp.logical_not(risky) if with_classic else jnp.bool_(True)
    if diag_sub:
        fast = jnp.logical_and(i == j, jnp.logical_not(needs_tail))
    else:
        fast = jnp.bool_(False)
    do_masked = jnp.logical_and(needs_mask, jnp.logical_not(fast))
    do_plain = jnp.logical_not(needs_mask)
    if diag_sub:
        pl.when(jnp.logical_and(safe, fast))(_step_diag)
    pl.when(jnp.logical_and(safe, do_masked))(lambda: _step(True))
    pl.when(jnp.logical_and(safe, do_plain))(lambda: _step(False))
    if with_classic:
        pl.when(risky)(_step_classic)

    @pl.when(j == last_j)
    def _store():
        l = jnp.sum(l_scr[...], axis=1, keepdims=True)
        # Dead rows (no visible column): on the safe path masked scores
        # contribute exp2(-huge) = 0 so l == 0 detects them; on the
        # classic path m stays at its _MASK init while p = 1 pollutes l,
        # so m detects them (m is exactly 0 for safe blocks — never near
        # _MASK).
        dead = m_scr[:, :1] <= _MASK * 0.5
        bad = jnp.logical_or(dead, jnp.logical_or(l == 0.0, jnp.isnan(l)))
        l_safe = jnp.where(bad, 1.0, l)
        # reciprocal-then-multiply: [bq, 1] divides instead of a [bq, d]
        # broadcast divide (VPU divides are multi-op; the epilogue runs on
        # the same grid step as a full tile body)
        o = acc_scr[...] * (1.0 / l_safe)
        o_ref[0, 0] = jnp.where(dead, 0.0, o).astype(o_ref.dtype)
        if with_lse:
            # shared formula: m = 0 on the safe path, the raw running max
            # on the classic path
            lse = m_scr[:, :1] * (scale_log2e * _LN2) + jnp.log(l_safe)
            lse = jnp.where(jnp.logical_or(l == 0.0, dead), -jnp.inf, lse)
            lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])
        if flag_ref is not None:
            # Deferred-repair poison flag (see _L_MIN): any row whose sum
            # left (_L_MIN, finite) or whose output rows are non-finite
            # sends the whole q block to the separate repair kernel
            # (_repair_poisoned). The check reads only the row sums
            # already in registers and writes one broadcast (8, LANES)
            # block — measured FREE at b8/s2048 (r5 ladder: 87.2 flagged
            # == 87.2 flag_presence vs 87.7 unchecked) after dropping the
            # isfinite(output) sweep (~5%) and gating the empty-band
            # arithmetic to windowed grids; the safety it buys used to
            # cost a serial q+k HBM prepass (~10% of the kernel).
            l_ok = jnp.logical_and(l > _L_MIN, l < jnp.inf)
            if window_left >= 0:
                # A row whose mask band is STRUCTURALLY empty (window/
                # ring kv_off edge geometries, clamped raw bands)
                # legitimately has l == 0: let it pass, or its block
                # repairs on every call forever while the repair just
                # recomputes the same dead row. Emptiness is static-
                # geometry arithmetic on the row index — poisoned
                # underflow rows (l == 0 with a live band) still flag.
                # An empty band needs a window lower bound, so plain
                # causal/full grids compile none of this in.
                rowa = jax.lax.broadcasted_iota(
                    jnp.int32, (l.shape[0], 1), 0) + i * block_q + kv_off
                hi = (jnp.minimum(seqlen_k, rowa + window_right + 1)
                      if window_right >= 0
                      else jnp.full_like(rowa, seqlen_k))
                lo = jnp.maximum(0, rowa - window_left)
                empty = hi <= lo
                if sinks > 0:  # sink columns stay visible unless hi <= 0
                    empty = jnp.logical_and(empty, hi <= 0)
                l_ok = jnp.logical_or(
                    l_ok, jnp.logical_and(empty, l == 0.0))
            # The row sums alone detect every zero-shift range violation:
            # overflow drives l to inf, total underflow drives it to 0 or
            # below _L_MIN, and a partial flush only loses weight that is
            # < 2^-126 of the row's winner (below fp32 noise). acc can
            # only go non-finite with l still in range if V itself
            # carries inf/NaN — which the classic repair body reproduces,
            # not fixes. The previous isfinite(output) sweep re-read the
            # whole [bq, d] block per store and cost ~5% of the kernel
            # (r5 ladder: flag 82.4 vs flag_presence 87.2 TFLOP/s).
            good = jnp.all(l_ok)
            flag_ref[0, 0] = jnp.full(flag_ref.shape[2:],
                                      1 - good.astype(jnp.int32))


def _bound_flat_kernel(imap_ref, jmap_ref, bits_ref, *refs, ncells,
                       num_q_blocks_pad, **params):
    """Max-free kernel on the flat grid (see _prefill_flat_kernel).
    bits_ref: scalar-prefetched per-(b, h, q_block) RISKY bit — blocks
    whose score range cannot be proven inside fp32 exp2 range take the
    embedded classic body (see _bound_body)."""
    t = pl.program_id(0)
    c = t % ncells
    i = imap_ref[c]
    j = jmap_ref[c]
    risky = bits_ref[(t // ncells) * num_q_blocks_pad + i] != 0
    first_j, last_j = _kv_block_bounds(
        i, params["block_q"], params["block_k"], params["num_kv_blocks"],
        params["window_left"], params["window_right"],
        params.get("kv_off", 0),
    )
    _bound_body(i, j, risky, first_j, last_j, *refs, **params)


def _bound_bht_kernel(imap_ref, jmap_ref, bits_ref, *refs, ncells,
                      num_q_blocks_pad, num_heads, **params):
    """Max-free kernel on the (batch, head, cell) grid."""
    b = pl.program_id(0)
    h = pl.program_id(1)
    c = pl.program_id(2)
    i = imap_ref[c]
    j = jmap_ref[c]
    risky = bits_ref[(b * num_heads + h) * num_q_blocks_pad + i] != 0
    first_j, last_j = _kv_block_bounds(
        i, params["block_q"], params["block_k"], params["num_kv_blocks"],
        params["window_left"], params["window_right"],
        params.get("kv_off", 0),
    )
    _bound_body(i, j, risky, first_j, last_j, *refs, **params)


def _flagged_flat_kernel(imap_ref, jmap_ref, q_ref, k_ref, v_ref,
                         o_ref, lse_ref, flag_ref, m_scr, l_scr,
                         acc_scr, *, ncells, **params):
    """Zero-shift kernel on the flat grid + per-q-block poison flag
    output (the deferred-repair default; _repair_kernel fixes flagged
    blocks in a separate near-empty kernel)."""
    t = pl.program_id(0)
    c = t % ncells
    i = imap_ref[c]
    j = jmap_ref[c]
    first_j, last_j = _kv_block_bounds(
        i, params["block_q"], params["block_k"], params["num_kv_blocks"],
        params["window_left"], params["window_right"],
        params.get("kv_off", 0),
    )
    compute_flag = params.pop("compute_flag", True)
    _bound_body(i, j, jnp.bool_(False), first_j, last_j, q_ref, k_ref,
                v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                with_classic=False,
                flag_ref=flag_ref if compute_flag else None, **params)


def _flagged_bht_kernel(imap_ref, jmap_ref, q_ref, k_ref, v_ref,
                        o_ref, lse_ref, flag_ref, m_scr, l_scr,
                        acc_scr, *, ncells, **params):
    """Zero-shift + poison-flag kernel on the (batch, head, cell) grid."""
    del ncells
    i = imap_ref[pl.program_id(2)]
    j = jmap_ref[pl.program_id(2)]
    first_j, last_j = _kv_block_bounds(
        i, params["block_q"], params["block_k"], params["num_kv_blocks"],
        params["window_left"], params["window_right"],
        params.get("kv_off", 0),
    )
    compute_flag = params.pop("compute_flag", True)
    _bound_body(i, j, jnp.bool_(False), first_j, last_j, q_ref, k_ref,
                v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                with_classic=False,
                flag_ref=flag_ref if compute_flag else None, **params)


def _repair_kernel(
    flags_ref,
    q_any,
    k_any,
    v_any,
    o_in,
    lse_in,
    o_any,
    lse_any,
    qscr,
    kscr,
    vscr,
    oscr,
    lsescr,
    m_scr,
    l_scr,
    acc_scr,
    sem,
    *,
    num_heads: int,
    num_q_blocks: int,
    group: int,
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
    **_unused,
):
    """Classic recompute of POISONED q blocks (deferred-repair path).

    A single grid step scans the scalar-prefetched per-(b, h, q_block)
    poison flags the zero-shift kernel emitted; benign inputs cost one
    near-empty kernel launch (a ~B*H*nq-iteration scalar loop, no DMA,
    no compute) instead of the serial q+k HBM prepass of the old design
    (~10% of the kernel at b8/s2048, scripts/probe_r4.py — in-kernel
    trailing repair CELLS were also tried first and cost ~0.5 ms of
    pipeline stalls). Flagged blocks stream q/k/v by manual DMA from
    ANY-space refs and overwrite their o/lse rows IN PLACE: the outputs
    alias the zero-shift kernel's outputs (input_output_aliases), so
    untouched blocks keep their already-correct values. Plain
    online-softmax, always masked — exact for any finite input; rare,
    never hot."""
    del o_in, lse_in  # aliased: o_any/lse_any ARE their buffers
    nq = num_q_blocks

    def fix(idx, carry):
        @pl.when(flags_ref[idx] != 0)
        def _repair():
            b = idx // (num_heads * nq)
            h = (idx // nq) % num_heads
            i = idx % nq
            kvh = h // group
            first_j, last_j = _kv_block_bounds(
                i, block_q, block_k, num_kv_blocks, window_left,
                window_right, kv_off)
            cq = pltpu.make_async_copy(
                q_any.at[b, h, pl.ds(i * block_q, block_q)], qscr, sem)
            cq.start()
            cq.wait()
            m_scr[...] = jnp.full_like(m_scr, _MASK)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)
            q = qscr[...]

            def visit(jj, carry):
                ck = pltpu.make_async_copy(
                    k_any.at[b, kvh, pl.ds(jj * block_k, block_k)],
                    kscr, sem)
                ck.start()
                ck.wait()
                cv = pltpu.make_async_copy(
                    v_any.at[b, kvh, pl.ds(jj * block_k, block_k)],
                    vscr, sem)
                cv.start()
                cv.wait()
                s = jax.lax.dot_general(
                    q, kscr[...], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                s = _band_mask(s, i, jj, block_q, block_k, seqlen_k,
                               window_left, window_right, sinks, kv_off)
                m_prev = m_scr[...]
                m_next = jnp.maximum(m_prev,
                                     jnp.max(s, axis=1, keepdims=True))
                alpha = jnp.exp2((m_prev - m_next) * scale_log2e)
                # subtract-FIRST (see _prefill_body._online_update)
                p = jnp.exp2((s - m_next[:, :1]) * scale_log2e)
                l_scr[...] = alpha * l_scr[...] + _lane_partial_sum(p)
                m_scr[...] = m_next
                pv = jax.lax.dot_general(
                    p.astype(vscr.dtype), vscr[...],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv
                return carry

            if sinks > 0:
                nsink = jnp.minimum(
                    jnp.int32(cdiv(int(sinks), block_k)), first_j)
                jax.lax.fori_loop(0, nsink, visit, 0)
            jax.lax.fori_loop(first_j, last_j + 1, visit, 0)

            l = jnp.sum(l_scr[...], axis=1, keepdims=True)
            dead = m_scr[:, :1] <= _MASK * 0.5
            bad = jnp.logical_or(dead,
                                 jnp.logical_or(l == 0.0, jnp.isnan(l)))
            l_safe = jnp.where(bad, 1.0, l)
            o = acc_scr[...] * (1.0 / l_safe)
            oscr[...] = jnp.where(dead, 0.0, o).astype(oscr.dtype)
            co = pltpu.make_async_copy(
                oscr, o_any.at[b, h, pl.ds(i * block_q, block_q)], sem)
            co.start()
            co.wait()
            if with_lse:
                lse = (m_scr[:, :1] * (scale_log2e * _LN2)
                       + jnp.log(l_safe))
                lse = jnp.where(jnp.logical_or(l == 0.0, dead),
                                -jnp.inf, lse)
                lsescr[...] = jnp.broadcast_to(lse, lsescr.shape)
                cl = pltpu.make_async_copy(
                    lsescr,
                    lse_any.at[b, h, pl.ds(i * block_q, block_q)], sem)
                cl.start()
                cl.wait()
        return carry

    jax.lax.fori_loop(0, flags_ref.shape[0], fix, 0)


def _repair_poisoned(flags, q, k, v, outs, kparams, *, batch, num_heads,
                     num_q_blocks, group, bq, bk, head_dim, return_lse,
                     interpret):
    """Launch _repair_kernel over the zero-shift kernel's outputs.

    flags: [batch*num_heads*num_q_blocks] int32 poison flags; outs: the
    (o [, lse]) arrays to repair IN PLACE via input_output_aliases.
    Returns the repaired outs tuple. Benign inputs cost one near-empty
    kernel launch (single grid step scanning the prefetched flags)."""
    o = outs[0]
    with_lse = return_lse
    scratch = [
        pltpu.VMEM((bq, head_dim), q.dtype),       # qscr
        pltpu.VMEM((bk, head_dim), k.dtype),       # kscr
        pltpu.VMEM((bk, head_dim), v.dtype),       # vscr
        pltpu.VMEM((bq, head_dim), o.dtype),       # oscr
        pltpu.VMEM((bq, LANES), jnp.float32),      # lsescr
        pltpu.VMEM((bq, LANES), jnp.float32),      # m
        pltpu.VMEM((bq, LANES), jnp.float32),      # l
        pltpu.VMEM((bq, head_dim), jnp.float32),   # acc
        pltpu.SemaphoreType.DMA,
    ]
    rparams = dict(kparams, num_heads=num_heads,
                   num_q_blocks=num_q_blocks, group=group)
    kern = functools.partial(_repair_kernel, **rparams)
    if not with_lse:
        def kern(flags_ref, q_any, k_any, v_any, o_in, o_any, *scr,
                 _k=rparams):
            return _repair_kernel(flags_ref, q_any, k_any, v_any, o_in,
                                  None, o_any, None, *scr, **_k)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    n_in = 4 + (1 if with_lse else 0)
    aliases = {4: 0}
    if with_lse:
        aliases[5] = 1
    out_shapes = [jax.ShapeDtypeStruct(o.shape, o.dtype)]
    if with_lse:
        out_shapes.append(jax.ShapeDtypeStruct(outs[1].shape,
                                               outs[1].dtype))
    res = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[any_spec] * n_in,
            out_specs=[any_spec] * len(out_shapes),
            scratch_shapes=scratch,
        ),
        out_shape=out_shapes,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(flags, q, k, v, *outs)
    return tuple(res)


def _bound_risky(maxq, maxk, scale_log2e):
    """True when the zero-shift softmax cannot be PROVEN exact for a
    block whose |q| / |k| row-norm maxima are maxq / maxk.

    Every score satisfies |s| <= maxq*maxk (Cauchy-Schwarz), so
    maxq*maxk*scale_log2e <= _BOUND_SAFE_LOG2 keeps every exp2 argument
    within +-100: no winning entry flushes to zero (fp32 flushes below
    2^-126) and no p/l/acc overflows (fp32 tops out at 2^128; l sums at
    most block_k <= 2^11 terms and acc folds |v| <= 2^15, both inside
    the >= 26-doubling headroom). Entries >= ~2^-26 below a row's winner
    survive; smaller ones flush to zero exactly as they vanish under the
    classic kernel's rounding. Real RMS-normed activations sit ~4 orders
    below the threshold; adversarially scaled inputs trip it and take
    the embedded classic body instead."""
    return maxq * maxk * abs(scale_log2e) > _BOUND_SAFE_LOG2


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
        "kv_slab",
        "flat_grid",
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
    kv_slab: Optional[int] = None,
    flat_grid: Optional[bool] = None,
    kv_position_offset: int = 0,
):
    """Flash-attention forward on [batch, heads, seq, head_dim] layout.

    q: [b, hq, sq, d]; k/v: [b, hkv, sk, d] with hq % hkv == 0.
    Returns [b, hq, sq, d] (and lse [b, hq, sq] fp32 if return_lse).

    Causal is top-left aligned (col > row masked), matching the reference
    (csrc/mfa/prefill.cuh:393-421); causal == window (-1, 0).

    diag_block selects the causal-diagonal sub-tile size. It is overloaded
    by design: on the bound-softmax path it is the COLUMN slab width of
    _bound_body._step_diag; on the classic path it is the square sub-tile
    of _prefill_body._step_diag. None = auto (tuned default); 0 = force
    the monolithic diagonal; an explicit positive value that cannot apply
    (window/sinks active, bq mismatch, non-divisor) raises ValueError
    rather than being silently dropped.

    kv_slab (bound path only): column slab width for NON-diagonal tiles
    (None = auto, 0 = monolithic tiles).

    bound_softmax selects the softmax engine. None/True (default):
    zero-shift max-free body with DEFERRED REPAIR — the store computes a
    per-q-block poison flag (row sums outside (_L_MIN, finite) or
    non-finite output) and a trailing repair cell recomputes flagged
    blocks with the classic algorithm in-kernel (exact for ANY finite
    input, ~zero cost when benign). "prepass": the pre-round-4 design — a
    fused q/k norm reduction proves safety ahead of time and risky blocks
    take an embedded classic body (costs a serial HBM pass over q and k,
    ~10% at b8/s2048). "unchecked": zero-shift only, no safety net (the
    caller guarantees bounded scores). False: classic online-softmax
    kernel.

    flat_grid: None = auto. True flattens (batch, head, cell) into ONE
    'arbitrary' grid dimension — keeps the Mosaic pipeline running across
    (b, h) boundaries, which wins when cells-per-(b, h) is small; False
    keeps the (b, h, cell) grid with parallel semantics, which pipelines
    better at long sequences (measured on v5e, scripts/probe_r3.py).

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

    def _resolve_sub(auto: int) -> int:
        """diag_block -> effective sub-tile (0 = monolith). Explicit
        positive values must actually apply (ADVICE r2: no silent drop)."""
        if diag_block is None:
            d = auto
            if not (diag_ok and d and bq > d and bq % d == 0 and d >= 128):
                return 0
            return d
        if diag_block == 0:
            return 0
        if not diag_ok:
            raise ValueError(
                "diag_block requires the pure causal path (no window/"
                "sinks/kv_position_offset) with square tiles")
        if diag_block >= bq:
            return 0  # a slab covering the whole tile IS the monolith
        if not (bq % diag_block == 0 and diag_block % 8 == 0):
            raise ValueError(
                f"diag_block={diag_block} must be a multiple of 8 "
                f"dividing block_q={bq}")
        return diag_block

    # Max-free (zero-shift) fast path: exact for every block whose score
    # range provably stays inside fp32 exp2 range (_bound_risky, checked
    # per q block in a fused prepass); other blocks run the classic
    # max-tracking body embedded in the same kernel. Softcap changes the
    # score domain and ALiBi shifts scores unboundedly — both keep the
    # standalone classic kernel unconditionally.
    if bound_softmax is None:
        bound_softmax = True
    use_bound = (bound_softmax and not logit_softcap
                 and alibi_slopes is None)
    if use_bound:
        # Tuned on v5e at the BENCH shapes with iters>=48
        # (scripts/probe_r3.py): short sequences (<= 2 q blocks, where
        # diagonal cells are most of the grid) measured best with
        # 256-wide diag + kv column slabs (87.4 vs 85.0 TFLOP/s at
        # b8/s2048); longer ones with bq/2 diag slabs and monolithic
        # full tiles (139.4 vs 132.9 at b2/s8192).
        short = cdiv(sq, bq) <= 2
        dsub = _resolve_sub(256 if (short and bq % 256 == 0 and bq > 256)
                            else bq // 2)
        if kv_slab is None:
            slab = 256 if (short and bk % 256 == 0 and bk > 256) else 0
        else:
            slab = kv_slab
        if slab and not (bk % slab == 0 and slab % 128 == 0 and slab < bk):
            raise ValueError(
                f"kv_slab={slab} must be a multiple of 128 dividing "
                f"block_k={bk}")
    else:
        # The classic fallback keeps the monolithic diagonal: its online
        # m/l/acc chain over overlapping row ranges makes subtiling a
        # loss (measured 61.7 vs 71.3 TFLOP/s).
        dsub = _resolve_sub(cfg.diag_block)
        slab = 0
        if kv_slab:
            raise ValueError("kv_slab applies to the bound-softmax path")

    sq_p = round_up(sq, bq)
    sk_p = round_up(sk, bk)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    if sk_p != sk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))

    num_q_blocks = sq_p // bq
    num_kv_blocks = sk_p // bk

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
        kv_off=kv_off,
        sinks=int(sink_tokens),
    )

    out_shapes = [
        jax.ShapeDtypeStruct((batch, num_heads, sq_p, head_dim), q.dtype),
        jax.ShapeDtypeStruct((batch, num_heads, sq_p, LANES), jnp.float32),
    ]
    if not return_lse:
        out_shapes = out_shapes[:1]

    flops_mult = 0.5 if window_right == 0 and sq == sk else 1.0
    base_scratch = [
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
    # of _kv_block_bounds). Dead cells are never enumerated — the
    # reference's n_block_max pruning (prefill.cuh:749-752), inverted for
    # TPU's static grids. Attention-sink blocks are listed ahead of the
    # window band (they are invisible to the rectangular bounds).
    # Deferred-repair mode (bound_softmax=True, the default): the
    # zero-shift kernel emits a per-q-block poison flag and a separate
    # near-empty repair kernel (_repair_kernel) recomputes flagged blocks
    # in place. The repair kernel's manual q/k/v DMA needs 128-lane-
    # aligned rows (Mosaic memref tiling — same constraint that pads
    # KV-cache page rows, cache/paged_cache.stored_width); narrower head
    # dims keep the prepass design, which has no manual DMA.
    # "flag_only" is a timing-decomposition mode (scripts/probe_r4.py):
    # the flag is computed and written but the repair kernel is not
    # launched — output is unsound for poisoned blocks; probes only.
    # "flag_presence" additionally skips the flag computation itself.
    # "flag_debug" = full default behavior (flags + repair) PLUS the raw
    # per-(b, h, q_block) flags as an extra return — the flag-rate
    # observability hook (tests/smoke assert zero flags on benign inputs).
    flagged = (use_bound
               and bound_softmax in (True, "flag_only", "flag_presence",
                                     "flag_debug")
               and head_dim % LANES == 0)
    if use_bound and bound_softmax is True and not flagged:
        bound_softmax = "prepass"
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
        for bj in range(min(sink_blocks, first)):
            cells_i.append(bi)
            cells_j.append(bj)
        for bj in range(first, last + 1):
            cells_i.append(bi)
            cells_j.append(bj)
    ncells = len(cells_i)
    H, C = num_heads, ncells
    # Grid layout (measured, scripts/probe_r3.py on v5e): flattening
    # (b, h, cell) into ONE 'arbitrary' dimension keeps the pipeline
    # running across (b, h) boundaries and wins when each (b, h) has only
    # a handful of cells; the (b, h, cell) grid with parallel semantics
    # pipelines better once the per-(b, h) cell run is long.
    use_flat = flat_grid if flat_grid is not None else C <= 8

    def _call(bht_kernel, flat_kernel, extra_inputs=(), extra_in_specs=(),
              extra_prefetch=(), extra_scratch=(), with_flag_out=False):
        """One pallas_call on the selected grid. extra_in_specs entries
        are callables (flat: bool) -> BlockSpec; extra_prefetch arrays
        ride as additional scalar-prefetch args (int32)."""
        scratch_shapes = base_scratch + list(extra_scratch)
        if use_flat:
            qo_map = lambda t, *_: \
                (t // (H * C), (t // C) % H, _[0][t % C], 0)  # noqa: E731
            kv_map = lambda t, *_: \
                (t // (H * C), ((t // C) % H) // group,
                 _[1][t % C], 0)  # noqa: E731
            grid = (batch * H * C,)
            semantics = ("arbitrary",)
            kernel = flat_kernel
        else:
            qo_map = lambda b, h, t, *_: (b, h, _[0][t], 0)  # noqa: E731
            kv_map = lambda b, h, t, *_: \
                (b, h // group, _[1][t], 0)  # noqa: E731
            grid = (batch, H, C)
            semantics = ("parallel", "parallel", "arbitrary")
            kernel = bht_kernel
        in_specs = [
            pl.BlockSpec((1, 1, bq, head_dim), qo_map),
            pl.BlockSpec((1, 1, bk, head_dim), kv_map),
            pl.BlockSpec((1, 1, bk, head_dim), kv_map),
        ] + [s(use_flat) for s in extra_in_specs]
        out_specs = [
            pl.BlockSpec((1, 1, bq, head_dim), qo_map),
            pl.BlockSpec((1, 1, bq, LANES), qo_map),
        ][: len(out_shapes)]
        if with_flag_out:
            # per-q-block poison flag: one broadcast (8, LANES) int32
            # block at row 8*i (the row dim exists only to satisfy Mosaic
            # block tiling; XLA reads [:, :, ::8, 0] afterwards)
            out_specs = out_specs + [
                pl.BlockSpec((1, 1, 8, LANES), qo_map)]
        all_out_shapes = out_shapes + ([jax.ShapeDtypeStruct(
            (batch, num_heads, num_q_blocks * 8, LANES), jnp.int32)]
            if with_flag_out else [])
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2 + len(extra_prefetch),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        )
        n_tail = len(scratch_shapes) + (1 if with_flag_out else 0)
        kern = (kernel if return_lse
                else _drop_lse_arg(kernel, n_tail=n_tail))
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=all_out_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=semantics,
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=cost,
            interpret=interpret,
        )(
            jnp.asarray(cells_i, jnp.int32),
            jnp.asarray(cells_j, jnp.int32),
            *extra_prefetch,
            q, k, v, *extra_inputs,
        )

    def call_classic():
        cparams = dict(
            kparams,
            softcap=float(logit_softcap),
            softcap_mul=(float(softmax_scale) / float(logit_softcap)
                         if logit_softcap else 0.0),
            alibi=alibi_slopes is not None,
            diag_sub=int(dsub if not use_bound else 0),
        )
        extra_inputs, extra_in_specs = (), ()
        if alibi_slopes is not None:
            if logit_softcap:
                raise ValueError(
                    "alibi_slopes and logit_softcap are exclusive")
            # pre-divide by the scale: the kernel's scores are raw; the 8
            # sublanes exist only for Mosaic's block tiling
            slopes_in = jnp.broadcast_to(
                (jnp.asarray(alibi_slopes, jnp.float32)
                 / float(softmax_scale))[:, None, None],
                (num_heads, 8, LANES),
            )
            extra_inputs = (slopes_in,)
            extra_in_specs = (lambda flat: pl.BlockSpec(
                (1, 8, LANES),
                (lambda t, *_: ((t // C) % H, 0, 0)) if flat
                else (lambda b, h, t, *_: (h, 0, 0))),)
        outs = _call(
            functools.partial(_prefill_bht_kernel, ncells=C, **cparams),
            functools.partial(_prefill_flat_kernel, ncells=C, **cparams),
            extra_inputs, extra_in_specs)
        return tuple(outs) if isinstance(outs, (list, tuple)) else (outs,)

    flags_debug = None
    if flagged:
        # DEFAULT bound-softmax path (deferred repair): the zero-shift
        # kernel runs UNCHECKED speed (its store emits a free poison
        # flag per q block) and a second, near-empty kernel repairs
        # flagged blocks in place. Safety without the serial q+k prepass:
        # the prepass was the whole 79.8-vs-87.6 TFLOP/s gap at b8/s2048
        # (scripts/probe_r4.py); in-kernel trailing repair cells were
        # tried first and stalled the pipeline ~0.5 ms.
        fparams = dict(kparams, diag_sub=int(dsub), kv_slab=int(slab),
                       compute_flag=bound_softmax != "flag_presence")
        outs = _call(
            functools.partial(_flagged_bht_kernel, ncells=C, **fparams),
            functools.partial(_flagged_flat_kernel, ncells=C, **fparams),
            with_flag_out=True,
        )
        *outs, flags4d = outs
        outs = tuple(outs)
        if bound_softmax in (True, "flag_debug"):
            flags = flags4d[:, :, ::8, 0].reshape(-1)
            if bound_softmax == "flag_debug":
                flags_debug = flags.reshape(batch, H, num_q_blocks)
            outs = _repair_poisoned(
                flags, q, k, v, outs, kparams, batch=batch, num_heads=H,
                num_q_blocks=num_q_blocks, group=group, bq=bq, bk=bk,
                head_dim=head_dim, return_lse=return_lse,
                interpret=interpret)
    elif use_bound:
        # bound_softmax="unchecked": the caller statically asserts its
        # activations keep |q||k|*scale*log2e under _BOUND_SAFE_LOG2
        # (e.g. RMS-normed q/k), so the classic fallback body is not
        # compiled in at all. Results for inputs violating the assertion
        # are numerically wrong — "prepass" keeps the embedded guard fed
        # by the fused q/k norm reduction (the pre-round-4 default).
        bparams = dict(kparams, diag_sub=int(dsub), kv_slab=int(slab),
                       with_classic=bound_softmax != "unchecked")
        if bound_softmax == "unchecked":
            # No classic body is compiled, so the risky bits only feed the
            # m-scratch init select (which must be 0 for the zero-shift
            # math): skip the prepass entirely — its q+k reduction is a
            # serial 2-array HBM pass (~0.25 ms at b8/s2048, the largest
            # single overhead of the checked path).
            risky_bits = jnp.zeros(
                batch * num_heads * num_q_blocks, jnp.int32)
        else:
            # ONE fused reduce over each of Q and K yields the per-q-block
            # RISKY bits (can this block's scores leave fp32 exp2 range
            # under the zero shift? — see _bound_risky); the bits ride as
            # scalar prefetch, and risky blocks take the classic body
            # EMBEDDED in the same kernel. No lax.cond: a whole-array cond
            # between two kernels measured ~0.5 ms of operand
            # round-tripping at b8/s2048 (72 -> 87 TFLOP/s without it),
            # while the in-kernel branch costs ~2 TFLOP/s.
            kf32 = k.astype(jnp.float32)
            maxk = jnp.max(jnp.sqrt(jnp.sum(kf32 * kf32, axis=-1)),
                           axis=-1)  # [b, hkv]
            qf32 = q.astype(jnp.float32)
            qn = jnp.sqrt(jnp.sum(qf32 * qf32, axis=-1))  # [b, hq, sq_p]
            qn_blk = jnp.max(
                qn.reshape(batch, num_heads, num_q_blocks, bq), axis=-1)
            risky_bits = _bound_risky(
                qn_blk, jnp.repeat(maxk, group, axis=1)[:, :, None],
                kparams["scale_log2e"],
            ).reshape(-1).astype(jnp.int32)

        outs = _call(
            functools.partial(_bound_bht_kernel, ncells=C,
                              num_q_blocks_pad=num_q_blocks,
                              num_heads=H, **bparams),
            functools.partial(_bound_flat_kernel, ncells=C,
                              num_q_blocks_pad=num_q_blocks, **bparams),
            extra_prefetch=(risky_bits,),
        )
        outs = tuple(outs) if isinstance(outs, (list, tuple)) else (outs,)
    else:
        outs = call_classic()

    if return_lse:
        out, lse = outs
        if flags_debug is not None:
            return out[:, :, :sq], lse[:, :, :sq, 0], flags_debug
        return out[:, :, :sq], lse[:, :, :sq, 0]
    out = outs[0] if isinstance(outs, (list, tuple)) else outs
    if flags_debug is not None:
        return out[:, :, :sq], flags_debug
    return out[:, :, :sq]


def _drop_lse_arg(kernel, n_tail=3):
    """Adapt the kernel signature when no LSE output exists: the lse ref
    sits immediately before the last `n_tail` refs (the 3 scratch refs)."""

    def wrapped(*refs):
        return kernel(*refs[:-n_tail], None, *refs[-n_tail:])

    return wrapped
