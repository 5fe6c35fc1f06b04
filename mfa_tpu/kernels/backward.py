"""Pallas TPU flash-attention backward kernels (dQ, dK, dV).

No reference counterpart — the CUDA reference is forward-only (SURVEY.md
§0) — but a training-grade framework needs a memory-efficient backward.
This is the standard FlashAttention-2 VJP recomputation scheme as two
Pallas kernels (the same split as the public JAX implementation: a dKV
kernel iterating Q blocks per KV block, and a dQ kernel iterating KV
blocks per Q block), never materializing the full score matrix:

  delta = rowsum(dO * O)                      (jnp, one fused pass)
  p     = exp2(scale_log2e * (Q K^T) - LSE_2) (recomputed per tile)
  dV   += P^T dO
  dS    = P * (dO V^T - delta) * scale
  dK   += dS^T Q
  dQ   += dS K

GQA: the dKV kernel's grid carries an explicit group axis per kv head and
accumulates dK/dV across the q-head group in VMEM scratch (the sequential
TPU grid makes this race-free by construction — the analog of the
reference's "correctness by __syncthreads discipline" note, SURVEY.md §5).
Causal/window block skipping mirrors the forward: `pl.when` + clamped
index maps so skipped tiles trigger no DMA.
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
    choose_bwd_config,
    default_interpret,
    round_up,
    softmax_scale_default,
)
from mfa_tpu.kernels.prefill import _kv_block_bounds

_LOG2E = math.log2(math.e)
_MASK = -1e30


def _tile_mask(i, j, block_q, block_k, seqlen_q, seqlen_k, window_left,
               window_right, kv_off=0, col0=0, ncols=None, sinks=0):
    # Skinny [bq,1]/[1,bk] iotas broadcast inside the compares — no full
    # [bq, bk] index planes (the backward inner loop is VPU-bound too).
    # kv_off: q rows sit kv_off positions ahead of the kv columns (ring
    # attention pairs) — shifts the window/causal compares, NOT the
    # seqlen_q row bound (that is the physical array length).
    # col0/ncols: restrict to the kv column slab [col0, col0+ncols).
    # sinks (StreamingLLM): the first `sinks` columns stay visible
    # through a left window (matches the forward's _band_mask).
    ncols = block_k if ncols is None else ncols
    row = jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0) + i * block_q
    col = jax.lax.broadcasted_iota(jnp.int32, (1, ncols), 1) \
        + j * block_k + col0
    mask = jnp.logical_and(row < seqlen_q, col < seqlen_k)
    if window_right >= 0:
        mask = jnp.logical_and(mask, col <= row + kv_off + window_right)
    if window_left >= 0:
        in_window = col >= row + kv_off - window_left
        if sinks > 0:
            in_window = jnp.logical_or(in_window, col < sinks)
        mask = jnp.logical_and(mask, in_window)
    return mask


def _tile_needs_mask(i, j, block_q, block_k, seqlen_q, seqlen_k,
                     window_left, window_right, kv_off=0, sinks=0):
    """True iff tile (i, j) touches a sequence tail or the window edge —
    interior tiles skip the mask entirely (reference prefill.cuh:774-778;
    here it also skips the row-bound check the forward doesn't need).
    Sink-prefix tiles are always masked (partially visible)."""
    needs = jnp.logical_or((i + 1) * block_q > seqlen_q,
                           (j + 1) * block_k > seqlen_k)
    if window_right >= 0:
        needs = jnp.logical_or(
            needs,
            (j + 1) * block_k - 1 > i * block_q + kv_off + window_right)
    if window_left >= 0:
        needs = jnp.logical_or(
            needs,
            j * block_k < (i + 1) * block_q + kv_off - 1 - window_left)
    if sinks > 0:
        needs = jnp.logical_or(needs, j * block_k < sinks)
    return needs


def _recompute_p(q, k, lse, mask, scale_log2e, softcap=0.0,
                 softcap_mul=0.0, bias=None):
    """P tile from saved LSE. lse: [bq, 1] natural-log.

    Returns (p, dcap) where dcap is the softcap chain factor
    (1 - tanh^2) to fold into dS, or None when no softcap is active
    (Gemma2: capped = cap*tanh(raw*scale/cap), so
    d(capped)/d(raw) = scale*(1 - tanh^2)).

    bias: optional additive raw-score-domain bias tile (ALiBi; its
    gradient w.r.t. q/k/v is zero, so only P recomputation changes)."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if bias is not None:
        s = s + bias
    if softcap:
        t = jnp.tanh(s * softcap_mul)
        s2 = (t * softcap) * _LOG2E - lse * _LOG2E
        dcap = 1.0 - t * t
    else:
        s2 = s * scale_log2e - lse * _LOG2E  # log2 domain
        dcap = None
    p = jnp.exp2(s2)
    # rows the forward fully masked carry lse = -inf; their probabilities
    # (and hence their gradients) are zero, not exp2(s*c + inf) = inf
    p = jnp.where(jnp.isfinite(lse), p, 0.0)
    if mask is not None:
        p = jnp.where(mask, p, 0.0)
    return p, dcap


def _alibi_bias(i, j, block_q, block_k, slopes_ref):
    """Raw-domain ALiBi bias tile: -slope * |row - col|, top-left-aligned
    (matches the forward, prefill.py:_scores; slopes arrive pre-divided
    by the softmax scale)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0) + i * block_q
    col = jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1) + j * block_k
    return -slopes_ref[0, 0, 0] * jnp.abs(row - col).astype(jnp.float32)


def _q_block_bounds(j, block_q, block_k, num_q_blocks, window_left,
                    window_right, kv_off=0):
    """Q blocks that see kv block j (transpose of _kv_block_bounds).
    kv_off: q absolute positions lead the kv columns by kv_off (ring
    pairs) — visible rows sit kv_off EARLIER, shifting both bounds.

    first clamps to last: with seqlen_q < seqlen_k under causal/window,
    kv blocks past the last q row have an empty raw range (first >
    num_q_blocks - 1); unclamped, the cell table would enumerate
    out-of-range q blocks and the store (i == last) would never fire,
    leaving those dk/dv output blocks unwritten garbage. Clamped, one
    in-range fully-masked cell runs and stores the correct zeros."""
    if window_left >= 0:
        last = jnp.maximum(0, jnp.minimum(
            num_q_blocks - 1,
            ((j + 1) * block_k - 1 - kv_off + window_left) // block_q))
    else:
        last = num_q_blocks - 1
    if window_right >= 0:
        first = jnp.minimum(
            jnp.maximum(0, (j * block_k - kv_off - window_right) // block_q),
            last)
    else:
        first = 0
    return first, last


def _fused_bwd_kernel(
    gmap_ref, imap_ref, jmap_ref,
    *refs,
    scale: float,
    block_q: int,
    block_k: int,
    seqlen_q: int,
    seqlen_k: int,
    num_kv_blocks: int,
    ncells: int,
    group: int,
    window_left: int,
    window_right: int,
    softcap: float = 0.0,
    softcap_mul: float = 0.0,
    alibi: bool = False,
    kv_off: int = 0,
    diag_sub: int = 0,
    kv_slab: int = 0,
    sinks: int = 0,
):
    """Single-pass backward: dQ, dK and dV in ONE kernel.

    The classic two-kernel split (dKV iterating q blocks per kv block, dQ
    iterating kv blocks per q block — the public-JAX/FA2 shape) exists
    because GPU thread-blocks cannot share accumulators. On a TPU the grid
    is one sequential pipeline, so dK/dV can live as FULL-SEQUENCE fp32
    VMEM accumulators (sk_p x d fits VMEM for any serving-relevant length)
    while dQ accumulates per q block — one sweep over the (g, i, j) band
    computes all three gradients. This drops 2 of the 9 two-kernel matmuls
    (the second S recompute and the second dO V^T) and streams q/k/v/do
    once instead of twice.

    Grid: one flat 'arbitrary' dimension over batch x kv_heads x cells,
    cells ordered g-major / i / j-inner (tables gmap/imap/jmap). dk/dv
    outputs are (1, 1, sk_p, d) blocks whose index depends only on
    (b, kv_head): Pallas keeps them VMEM-resident across all cells of a
    (b, kv_head) and flushes once at the boundary; the kernel writes them
    on the last cell.

    Causal diagonal cells (i == j, square tiles, no tail) are
    column-subtiled like the forward's bound path (_step_diag there):
    every update here is additive (P comes from the saved LSE — no online
    max), so kv column slab [c0, c0+diag_sub) pairs with just the rows
    >= c0 that can see it and the dead upper triangle is never computed.
    """
    t = pl.program_id(0)
    c = t % ncells
    g = gmap_ref[c]
    i = imap_ref[c]
    j = jmap_ref[c]
    if alibi:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, slopes_ref,
         dq_ref, dk_ref, dv_ref, dq_acc, dk_acc, dv_acc) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dq_ref, dk_ref, dv_ref, dq_acc, dk_acc, dv_acc) = refs
        slopes_ref = None
    first_j, last_j = _kv_block_bounds(
        i, block_q, block_k, num_kv_blocks, window_left, window_right,
        kv_off)
    # with sinks, each q block's first enumerated cell is SINK block 0
    # (listed ahead of the window band, like the forward cell table)
    init_j = 0 if sinks > 0 else first_j
    # lse/delta are (1, 1, bq, 1) fp32 blocks, fetched once per q ROW (the
    # index map depends on (g, i) only, so the j-inner sweep reuses the
    # resident block). A lane-packed [8, 256] stripe would be a denser
    # DMA, but Mosaic cannot lower the (S, 128) -> (bq, 1) shape cast
    # ("infer-vector-layout: unsupported shape cast" on v5e).
    lse_all = lse_ref[0, 0]
    delta_all = delta_ref[0, 0]

    @pl.when(c == 0)
    def _init_kv():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    @pl.when(j == init_j)
    def _init_q():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    needs_tail = (j + 1) * block_k > seqlen_k
    needs_mask = _tile_needs_mask(i, j, block_q, block_k, seqlen_q,
                                  seqlen_k, window_left, window_right,
                                  kv_off, sinks)

    def _accum(p, dcap, qs, dos, vs, ksl_lo, qsl, k_or_slab, delta):
        """Shared additive update: dv/dk rows [ksl_lo, ksl_lo+w) and dq
        rows qsl, from probability slab p."""
        w = p.shape[1]
        dv_acc[pl.ds(ksl_lo, w)] += jax.lax.dot_general(
            p.astype(dos.dtype), dos, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            dos.astype(vs.dtype), vs, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * scale
        if dcap is not None:
            ds = ds * dcap
        ds = ds.astype(qs.dtype)
        dk_acc[pl.ds(ksl_lo, w)] += jax.lax.dot_general(
            ds, qs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_acc[qsl] += jax.lax.dot_general(
            ds, k_or_slab, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def _step(masked: bool):
        q = q_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        width = kv_slab if (kv_slab and not alibi) else block_k
        for cs in range(block_k // width):
            c0 = cs * width
            k = k_ref[0, 0, c0:c0 + width]
            v = v_ref[0, 0, c0:c0 + width]
            mask = (_tile_mask(i, j, block_q, block_k, seqlen_q, seqlen_k,
                               window_left, window_right, kv_off,
                               col0=c0, ncols=width, sinks=sinks)
                    if masked else None)
            bias = (_alibi_bias(i, j, block_q, block_k, slopes_ref)
                    if alibi else None)
            p, dcap = _recompute_p(q, k, lse_all, mask, scale * _LOG2E,
                                   softcap, softcap_mul, bias)
            _accum(p, dcap, q, do, v, j * block_k + c0, slice(None), k,
                   delta_all)

    def _step_diag():
        for cs in range(block_k // diag_sub):
            c0 = cs * diag_sub
            qsl = slice(c0, block_q)
            q = q_ref[0, 0, qsl]
            kk = k_ref[0, 0, c0:c0 + diag_sub]
            vv = v_ref[0, 0, c0:c0 + diag_sub]
            do = do_ref[0, 0, qsl].astype(jnp.float32)
            rowa = jax.lax.broadcasted_iota(
                jnp.int32, (block_q - c0, 1), 0)
            cola = jax.lax.broadcasted_iota(
                jnp.int32, (1, diag_sub), 1)
            p, dcap = _recompute_p(q, kk, lse_all[qsl],
                                   cola <= rowa, scale * _LOG2E,
                                   softcap, softcap_mul, None)
            _accum(p, dcap, q, do, vv, j * block_k + c0, qsl, kk,
                   delta_all[qsl])

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
    def _store_dq():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)

    @pl.when(c == ncells - 1)
    def _store_dkv():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _dkv_body(
    j, g, i, run, first_i, last_i,
    *refs,
    scale: float,
    block_q: int,
    block_k: int,
    seqlen_q: int,
    seqlen_k: int,
    num_q_blocks: int,
    group: int,
    window_left: int,
    window_right: int,
    softcap: float = 0.0,
    softcap_mul: float = 0.0,
    alibi: bool = False,
    kv_off: int = 0,
):
    if alibi:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, slopes_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs
        slopes_ref = None
    @pl.when(jnp.logical_and(g == 0, i == first_i))
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    needs_mask = _tile_needs_mask(i, j, block_q, block_k, seqlen_q,
                                  seqlen_k, window_left, window_right,
                                  kv_off)

    def _step(masked: bool):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0]  # [bq, 1]
        delta = delta_ref[0, 0]  # [bq, 1]
        mask = (_tile_mask(i, j, block_q, block_k, seqlen_q, seqlen_k,
                           window_left, window_right, kv_off)
                if masked else None)
        bias = (_alibi_bias(i, j, block_q, block_k, slopes_ref)
                if alibi else None)
        p, dcap = _recompute_p(q, k, lse, mask, scale * _LOG2E,
                               softcap, softcap_mul, bias)

        # dV += P^T dO
        dv_acc[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dS = P * (dO V^T - delta) * scale
        dp = jax.lax.dot_general(
            do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * scale
        if dcap is not None:
            ds = ds * dcap
        # dK += dS^T Q
        dk_acc[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if run is None:  # triangular grid: every enumerated cell is live
        pl.when(needs_mask)(lambda: _step(True))
        pl.when(jnp.logical_not(needs_mask))(lambda: _step(False))
    else:
        pl.when(jnp.logical_and(run, needs_mask))(lambda: _step(True))
        pl.when(jnp.logical_and(run, jnp.logical_not(needs_mask)))(
            lambda: _step(False))

    @pl.when(jnp.logical_and(g == group - 1, i == last_i))
    def _store():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _dkv_kernel(*refs, **params):
    """Rectangular grid (b, hkv, j, g, i): out-of-band (j, i) cells idle."""
    j = pl.program_id(2)
    g = pl.program_id(3)
    i = pl.program_id(4)
    first_i, last_i = _q_block_bounds(
        j, params["block_q"], params["block_k"], params["num_q_blocks"],
        params["window_left"], params["window_right"],
        params.get("kv_off", 0),
    )
    run = jnp.logical_and(i >= first_i, i <= last_i)
    _dkv_body(j, g, i, run, first_i, last_i, *refs, **params)


def _dkv_tri_kernel(jmap_ref, gmap_ref, imap_ref, *refs, **params):
    """Triangular grid (b, hkv, t): only live band cells, enumerated
    j-major / g / i-inner via the scalar-prefetched tables (same pruning
    as the forward; see prefill.py:_prefill_tri_kernel)."""
    t = pl.program_id(2)
    j = jmap_ref[t]
    g = gmap_ref[t]
    i = imap_ref[t]
    first_i, last_i = _q_block_bounds(
        j, params["block_q"], params["block_k"], params["num_q_blocks"],
        params["window_left"], params["window_right"],
        params.get("kv_off", 0),
    )
    _dkv_body(j, g, i, None, first_i, last_i, *refs, **params)


def _dq_body(
    i, j, run, first_j, last_j,
    *refs,
    scale: float,
    block_q: int,
    block_k: int,
    seqlen_q: int,
    seqlen_k: int,
    num_kv_blocks: int,
    window_left: int,
    window_right: int,
    softcap: float = 0.0,
    softcap_mul: float = 0.0,
    alibi: bool = False,
    kv_off: int = 0,
):
    if alibi:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, slopes_ref,
         dq_ref, dq_acc) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dq_ref, dq_acc) = refs
        slopes_ref = None
    @pl.when(j == first_j)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    needs_mask = _tile_needs_mask(i, j, block_q, block_k, seqlen_q,
                                  seqlen_k, window_left, window_right,
                                  kv_off)

    def _step(masked: bool):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]
        mask = (_tile_mask(i, j, block_q, block_k, seqlen_q, seqlen_k,
                           window_left, window_right, kv_off)
                if masked else None)
        bias = (_alibi_bias(i, j, block_q, block_k, slopes_ref)
                if alibi else None)
        p, dcap = _recompute_p(q, k, lse, mask, scale * _LOG2E,
                               softcap, softcap_mul, bias)
        dp = jax.lax.dot_general(
            do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * scale
        if dcap is not None:
            ds = ds * dcap
        dq_acc[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if run is None:  # triangular grid
        pl.when(needs_mask)(lambda: _step(True))
        pl.when(jnp.logical_not(needs_mask))(lambda: _step(False))
    else:
        pl.when(jnp.logical_and(run, needs_mask))(lambda: _step(True))
        pl.when(jnp.logical_and(run, jnp.logical_not(needs_mask)))(
            lambda: _step(False))

    @pl.when(j == last_j)
    def _store():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


def _dq_kernel(*refs, **params):
    i = pl.program_id(2)  # q block
    j = pl.program_id(3)  # kv block
    first_j, last_j = _kv_block_bounds(
        i, params["block_q"], params["block_k"], params["num_kv_blocks"],
        params["window_left"], params["window_right"],
        params.get("kv_off", 0),
    )
    run = jnp.logical_and(j >= first_j, j <= last_j)
    _dq_body(i, j, run, first_j, last_j, *refs, **params)


def _dq_tri_kernel(imap_ref, jmap_ref, *refs, **params):
    t = pl.program_id(2)
    i = imap_ref[t]
    j = jmap_ref[t]
    first_j, last_j = _kv_block_bounds(
        i, params["block_q"], params["block_k"], params["num_kv_blocks"],
        params["window_left"], params["window_right"],
        params.get("kv_off", 0),
    )
    _dq_body(i, j, None, first_j, last_j, *refs, **params)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "softmax_scale", "window_size", "block_q",
                     "block_k", "interpret", "logit_softcap",
                     "kv_position_offset", "fused", "kv_slab",
                     "sink_tokens"),
)
def flash_attention_bwd(
    q: jax.Array,  # [b, hq, sq, d]
    k: jax.Array,  # [b, hkv, sk, d]
    v: jax.Array,
    out: jax.Array,  # forward output
    lse: jax.Array,  # [b, hq, sq] natural-log LSE from forward
    do: jax.Array,
    *,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    window_size: tuple[int, int] = (-1, -1),
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
    logit_softcap: float = 0.0,
    alibi_slopes: Optional[jax.Array] = None,
    kv_position_offset: int = 0,
    fused: Optional[bool] = None,
    kv_slab: int = 0,
    sink_tokens: int = 0,
):
    """-> (dq, dk, dv) on the [b, h, s, d] layout.

    sink_tokens (StreamingLLM): with a left window, the first
    `sink_tokens` kv columns stay visible to every row — fine-tune with
    the same attention the model serves. Fused-kernel path only (the
    full-KV fp32 accumulators make sink-column gradients free; the
    two-kernel split would need its own sink cell tables).

    kv_position_offset (static, >= 0): q row r sits at absolute position
    r + offset relative to the kv columns — the backward of the ring
    attention pair (see prefill_attention's kv_position_offset).

    fused: None = auto — use the single-pass kernel (_fused_bwd_kernel)
    whenever the full-length dK/dV fp32 accumulators fit VMEM; True/False
    force the choice (False keeps the classic two-kernel split, retained
    for very long sequences and as an A/B reference)."""
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
    kv_off = int(kv_position_offset)
    if kv_off < 0:
        raise ValueError("kv_position_offset must be >= 0 (q leads kv)")
    if sink_tokens and window_left < 0:
        sink_tokens = 0  # no left window: sinks are a no-op (forward too)
    if sink_tokens and kv_off:
        raise NotImplementedError(
            "kv_position_offset with attention sinks is not supported "
            "(the ring path handles sink blocks on the owning shard)")

    alibi = alibi_slopes is not None
    if alibi:
        if logit_softcap:
            raise ValueError("alibi_slopes and logit_softcap are exclusive")
        # raw score domain, like the forward (prefill.py)
        slopes_in = jnp.broadcast_to(
            (jnp.asarray(alibi_slopes, jnp.float32)
             / float(softmax_scale))[:, None, None],
            (num_heads, 8, 128),
        )

    cfg_bq, cfg_bk = choose_bwd_config(sq, sk, head_dim, q.dtype.itemsize)
    bq = min(block_q or cfg_bq, round_up(sq, 8))
    bk = min(block_k or cfg_bk, round_up(sk, 128))
    sq_p = round_up(sq, bq)
    sk_p = round_up(sk, bk)

    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # [b, hq, sq]

    def pad_s(x, target, axis=2):
        padw = [(0, 0)] * x.ndim
        padw[axis] = (0, target - x.shape[axis])
        return jnp.pad(x, padw) if target != x.shape[axis] else x

    qp = pad_s(q, sq_p)
    dop = pad_s(do, sq_p)
    kp = pad_s(k, sk_p)
    vp = pad_s(v, sk_p)
    lsep = pad_s(lse[..., None], sq_p)  # [b, hq, sq_p, 1]
    deltap = pad_s(delta[..., None], sq_p)

    num_q_blocks = sq_p // bq
    num_kv_blocks = sk_p // bk

    # ---------------- fused single-pass kernel ----------------
    # Auto-select whenever the two full-length fp32 dK/dV accumulators fit
    # comfortably in VMEM (16MB leaves room for the [bq, bk] fp32
    # intermediates and double-buffered tiles at 1024x1024).
    use_fused = (fused if fused is not None
                 else sk_p * head_dim * 8 <= 16 * 1024 * 1024)
    if sink_tokens and not use_fused:
        raise NotImplementedError(
            "attention-sink backward requires the fused single-pass "
            "kernel (sequence too long for its VMEM dK/dV accumulators, "
            "or fused=False was forced)")
    if use_fused:
        # cell table, g-major / i / j-inner (python mirror of
        # _kv_block_bounds, first clamped to last so every q block runs at
        # least one in-range cell and stores its dq — zeros when dead)
        sink_blocks = (-(-int(sink_tokens) // bk)) if sink_tokens else 0
        f_g, f_i, f_j = [], [], []
        for g_ in range(group):
            for bi in range(num_q_blocks):
                lj = (num_kv_blocks - 1 if window_right < 0 else
                      max(0, min(num_kv_blocks - 1,
                                 ((bi + 1) * bq + kv_off - 1 + window_right)
                                 // bk)))
                fj = (0 if window_left < 0
                      else min(max(0, (bi * bq + kv_off - window_left) // bk),
                               lj))
                # sink-prefix cells ahead of the band (forward parity:
                # prefill.py cell table; _fused_bwd_kernel inits dq_acc
                # at j == 0 when sinks are active)
                for bj in range(min(sink_blocks, fj)):
                    f_g.append(g_)
                    f_i.append(bi)
                    f_j.append(bj)
                for bj in range(fj, lj + 1):
                    f_g.append(g_)
                    f_i.append(bi)
                    f_j.append(bj)
        ncells = len(f_i)
        HKV = num_kv_heads
        # Diagonal column-subtiling (additive updates make it free — see
        # _fused_bwd_kernel): pure top-left causal with square tiles only.
        dsub = (bq // 2 if (window_left < 0 and window_right == 0
                            and kv_off == 0 and bq == bk and not alibi
                            and bq // 2 >= 128)
                else 0)

        def qh_map(t, gm, im, jm):
            return (t // (HKV * ncells),
                    ((t // ncells) % HKV) * group + gm[t % ncells],
                    im[t % ncells], 0)

        def kv_map(t, gm, im, jm):
            return (t // (HKV * ncells), (t // ncells) % HKV,
                    jm[t % ncells], 0)

        def dkv_map(t, gm, im, jm):
            return (t // (HKV * ncells), (t // ncells) % HKV, 0, 0)

        in_specs = [
            pl.BlockSpec((1, 1, bq, head_dim), qh_map),
            pl.BlockSpec((1, 1, bk, head_dim), kv_map),
            pl.BlockSpec((1, 1, bk, head_dim), kv_map),
            pl.BlockSpec((1, 1, bq, head_dim), qh_map),
            pl.BlockSpec((1, 1, bq, 1), qh_map),
            pl.BlockSpec((1, 1, bq, 1), qh_map),
        ]
        inputs = [qp, kp, vp, dop, lsep, deltap]
        if alibi:
            in_specs.append(pl.BlockSpec(
                (1, 8, 128),
                lambda t, gm, im, jm:
                (((t // ncells) % HKV) * group + gm[t % ncells], 0, 0)))
            inputs.append(slopes_in)
        fparams = dict(
            scale=float(softmax_scale),
            softcap=float(logit_softcap),
            softcap_mul=(float(softmax_scale) / float(logit_softcap)
                         if logit_softcap else 0.0),
            block_q=bq, block_k=bk,
            seqlen_q=sq, seqlen_k=sk,
            num_kv_blocks=num_kv_blocks,
            ncells=ncells,
            group=group,
            window_left=window_left, window_right=window_right,
            alibi=alibi,
            kv_off=kv_off,
            diag_sub=dsub,
            kv_slab=int(kv_slab),
            sinks=int(sink_tokens),
        )
        dq, dk, dv = pl.pallas_call(
            functools.partial(_fused_bwd_kernel, **fparams),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(batch * HKV * ncells,),
                in_specs=in_specs,
                out_specs=[
                    pl.BlockSpec((1, 1, bq, head_dim), qh_map),
                    pl.BlockSpec((1, 1, sk_p, head_dim), dkv_map),
                    pl.BlockSpec((1, 1, sk_p, head_dim), dkv_map),
                ],
                scratch_shapes=[
                    pltpu.VMEM((bq, head_dim), jnp.float32),
                    pltpu.VMEM((sk_p, head_dim), jnp.float32),
                    pltpu.VMEM((sk_p, head_dim), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((batch, num_heads, sq_p, head_dim),
                                     q.dtype),
                jax.ShapeDtypeStruct((batch, num_kv_heads, sk_p, head_dim),
                                     k.dtype),
                jax.ShapeDtypeStruct((batch, num_kv_heads, sk_p, head_dim),
                                     v.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(
            jnp.asarray(f_g, jnp.int32),
            jnp.asarray(f_i, jnp.int32),
            jnp.asarray(f_j, jnp.int32),
            *inputs,
        )
        return dq[:, :, :sq], dk[:, :, :sk], dv[:, :, :sk]

    # Live band cells (python mirrors of _q_block_bounds/_kv_block_bounds);
    # when the window prunes anything, both kernels run on a flattened
    # triangular grid so dead cells are never enumerated (see prefill.py).
    banded = window_left >= 0 or window_right >= 0
    dkv_cells = []  # (j, g, i), j-major, g mid, i inner
    dq_cells = []  # (i, j), i-major, j inner
    if banded:
        # first clamps to last in both tables (mirrors _q_block_bounds /
        # _kv_block_bounds): an empty raw band still enumerates one
        # in-range masked cell so its output block is stored (as zeros)
        for bj in range(num_kv_blocks):
            li = (num_q_blocks - 1 if window_left < 0 else
                  max(0, min(num_q_blocks - 1,
                             ((bj + 1) * bk - 1 - kv_off + window_left)
                             // bq)))
            fi = (0 if window_right < 0
                  else min(max(0, (bj * bk - kv_off - window_right) // bq),
                           li))
            for g_ in range(group):
                for bi in range(fi, li + 1):
                    dkv_cells.append((bj, g_, bi))
        for bi in range(num_q_blocks):
            lj = (num_kv_blocks - 1 if window_right < 0 else
                  max(0, min(num_kv_blocks - 1,
                             ((bi + 1) * bq + kv_off - 1 + window_right)
                             // bk)))
            fj = (0 if window_left < 0
                  else min(max(0, (bi * bq + kv_off - window_left) // bk),
                           lj))
            for bj in range(fj, lj + 1):
                dq_cells.append((bi, bj))
    use_tri_dkv = banded and len(dkv_cells) < (num_kv_blocks * group
                                               * num_q_blocks)
    use_tri_dq = banded and len(dq_cells) < num_q_blocks * num_kv_blocks

    dkv_params = dict(
        scale=float(softmax_scale),
        softcap=float(logit_softcap),
        softcap_mul=(float(softmax_scale) / float(logit_softcap)
                     if logit_softcap else 0.0),
        block_q=bq, block_k=bk,
        seqlen_q=sq, seqlen_k=sk,
        num_q_blocks=num_q_blocks,
        group=group,
        window_left=window_left, window_right=window_right,
        alibi=alibi,
        kv_off=kv_off,
    )
    dkv_out_shape = [
        jax.ShapeDtypeStruct((batch, num_kv_heads, sk_p, head_dim), k.dtype),
        jax.ShapeDtypeStruct((batch, num_kv_heads, sk_p, head_dim), v.dtype),
    ]
    dkv_scratch = [
        pltpu.VMEM((bk, head_dim), jnp.float32),
        pltpu.VMEM((bk, head_dim), jnp.float32),
    ]

    # ---------------- dKV ----------------
    if use_tri_dkv:
        def q_idx_tri(b, h, t, jm, gm, im):
            return (b, h * group + gm[t], im[t], 0)

        def kv_idx_tri(b, h, t, jm, gm, im):
            return (b, h, jm[t], 0)

        tri_in_specs = [
            pl.BlockSpec((1, 1, bq, head_dim), q_idx_tri),
            pl.BlockSpec((1, 1, bk, head_dim), kv_idx_tri),
            pl.BlockSpec((1, 1, bk, head_dim), kv_idx_tri),
            pl.BlockSpec((1, 1, bq, head_dim), q_idx_tri),
            pl.BlockSpec((1, 1, bq, 1), q_idx_tri),
            pl.BlockSpec((1, 1, bq, 1), q_idx_tri),
        ]
        tri_inputs = [qp, kp, vp, dop, lsep, deltap]
        if alibi:
            tri_in_specs.append(pl.BlockSpec(
                (1, 8, 128),
                lambda b, h, t, jm, gm, im: (h * group + gm[t], 0, 0)))
            tri_inputs.append(slopes_in)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(batch, num_kv_heads, len(dkv_cells)),
            in_specs=tri_in_specs,
            out_specs=[
                pl.BlockSpec((1, 1, bk, head_dim), kv_idx_tri),
                pl.BlockSpec((1, 1, bk, head_dim), kv_idx_tri),
            ],
            scratch_shapes=dkv_scratch,
        )
        dk, dv = pl.pallas_call(
            functools.partial(_dkv_tri_kernel, **dkv_params),
            grid_spec=grid_spec,
            out_shape=dkv_out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(
            jnp.asarray([c[0] for c in dkv_cells], jnp.int32),
            jnp.asarray([c[1] for c in dkv_cells], jnp.int32),
            jnp.asarray([c[2] for c in dkv_cells], jnp.int32),
            *tri_inputs,
        )
    else:
        def q_idx_dkv(b, h, j, g, i):
            first, last = _q_block_bounds(j, bq, bk, num_q_blocks,
                                          window_left, window_right, kv_off)
            return (b, h * group + g, jnp.clip(i, first, last), 0)

        rect_in_specs = [
            pl.BlockSpec((1, 1, bq, head_dim), q_idx_dkv),
            pl.BlockSpec((1, 1, bk, head_dim),
                         lambda b, h, j, g, i: (b, h, j, 0)),
            pl.BlockSpec((1, 1, bk, head_dim),
                         lambda b, h, j, g, i: (b, h, j, 0)),
            pl.BlockSpec((1, 1, bq, head_dim), q_idx_dkv),
            pl.BlockSpec((1, 1, bq, 1), q_idx_dkv),
            pl.BlockSpec((1, 1, bq, 1), q_idx_dkv),
        ]
        rect_inputs = [qp, kp, vp, dop, lsep, deltap]
        if alibi:
            rect_in_specs.append(pl.BlockSpec(
                (1, 8, 128),
                lambda b, h, j, g, i: (h * group + g, 0, 0)))
            rect_inputs.append(slopes_in)
        dk, dv = pl.pallas_call(
            functools.partial(_dkv_kernel, **dkv_params),
            grid=(batch, num_kv_heads, num_kv_blocks, group, num_q_blocks),
            in_specs=rect_in_specs,
            out_specs=[
                pl.BlockSpec((1, 1, bk, head_dim),
                             lambda b, h, j, g, i: (b, h, j, 0)),
                pl.BlockSpec((1, 1, bk, head_dim),
                             lambda b, h, j, g, i: (b, h, j, 0)),
            ],
            out_shape=dkv_out_shape,
            scratch_shapes=dkv_scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*rect_inputs)

    # ---------------- dQ ----------------
    dq_params = dict(
        scale=float(softmax_scale),
        softcap=float(logit_softcap),
        softcap_mul=(float(softmax_scale) / float(logit_softcap)
                     if logit_softcap else 0.0),
        block_q=bq, block_k=bk,
        seqlen_q=sq, seqlen_k=sk,
        num_kv_blocks=num_kv_blocks,
        window_left=window_left, window_right=window_right,
        alibi=alibi,
        kv_off=kv_off,
    )
    dq_out_shape = jax.ShapeDtypeStruct(
        (batch, num_heads, sq_p, head_dim), q.dtype
    )
    if use_tri_dq:
        def q_idx_tri2(b, h, t, im, jm):
            return (b, h, im[t], 0)

        def kv_idx_tri2(b, h, t, im, jm):
            return (b, h // group, jm[t], 0)

        tri2_in_specs = [
            pl.BlockSpec((1, 1, bq, head_dim), q_idx_tri2),
            pl.BlockSpec((1, 1, bk, head_dim), kv_idx_tri2),
            pl.BlockSpec((1, 1, bk, head_dim), kv_idx_tri2),
            pl.BlockSpec((1, 1, bq, head_dim), q_idx_tri2),
            pl.BlockSpec((1, 1, bq, 1), q_idx_tri2),
            pl.BlockSpec((1, 1, bq, 1), q_idx_tri2),
        ]
        tri2_inputs = [qp, kp, vp, dop, lsep, deltap]
        if alibi:
            tri2_in_specs.append(pl.BlockSpec(
                (1, 8, 128), lambda b, h, t, im, jm: (h, 0, 0)))
            tri2_inputs.append(slopes_in)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(batch, num_heads, len(dq_cells)),
            in_specs=tri2_in_specs,
            out_specs=pl.BlockSpec((1, 1, bq, head_dim), q_idx_tri2),
            scratch_shapes=[pltpu.VMEM((bq, head_dim), jnp.float32)],
        )
        dq = pl.pallas_call(
            functools.partial(_dq_tri_kernel, **dq_params),
            grid_spec=grid_spec,
            out_shape=dq_out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(
            jnp.asarray([c[0] for c in dq_cells], jnp.int32),
            jnp.asarray([c[1] for c in dq_cells], jnp.int32),
            *tri2_inputs,
        )
    else:
        def kv_idx_dq(b, h, i, j):
            first, last = _kv_block_bounds(i, bq, bk, num_kv_blocks,
                                           window_left, window_right,
                                           kv_off)
            return (b, h // group, jnp.clip(j, first, last), 0)

        rect2_in_specs = [
            pl.BlockSpec((1, 1, bq, head_dim),
                         lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bk, head_dim), kv_idx_dq),
            pl.BlockSpec((1, 1, bk, head_dim), kv_idx_dq),
            pl.BlockSpec((1, 1, bq, head_dim),
                         lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, i, j: (b, h, i, 0)),
        ]
        rect2_inputs = [qp, kp, vp, dop, lsep, deltap]
        if alibi:
            rect2_in_specs.append(pl.BlockSpec(
                (1, 8, 128), lambda b, h, i, j: (h, 0, 0)))
            rect2_inputs.append(slopes_in)
        dq = pl.pallas_call(
            functools.partial(_dq_kernel, **dq_params),
            grid=(batch, num_heads, num_q_blocks, num_kv_blocks),
            in_specs=rect2_in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, bq, head_dim), lambda b, h, i, j: (b, h, i, 0)
            ),
            out_shape=dq_out_shape,
            scratch_shapes=[pltpu.VMEM((bq, head_dim), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*rect2_inputs)

    return dq[:, :, :sq], dk[:, :, :sk], dv[:, :, :sk]


# --------------------------------------------------------------------------
# Varlen (packed / cu_seqlens) backward
#
# Same recomputation scheme as the dense kernels above, on the packed
# [total_tokens, heads, head_dim] layout of kernels/varlen.py: sequence
# membership is a segment-id mask (seg_q == seg_k) and causal/windows act
# on segment-relative positions, so one kernel invocation covers the whole
# ragged batch (the TPU inversion of the reference's per-CTA base-pointer
# arithmetic, csrc/mfa/prefill.cuh:19-33 — which has no backward at all).
# Per-block live ranges are scalar-prefetched exactly like the varlen
# forward, so out-of-segment tiles cost no DMA and no FLOPs.
# --------------------------------------------------------------------------


def _vl_tile_mask(seg_q, pos_q, seg_k, pos_k, causal, window_left,
                  window_right):
    """[bq, bk] mask from blocked segment/position refs ([bq,1] q side,
    [1,bk] k side — skinny, broadcast in the compares)."""
    mask = seg_q == seg_k
    if causal or window_right == 0:
        mask = jnp.logical_and(mask, pos_k <= pos_q)
    elif window_right > 0:
        mask = jnp.logical_and(mask, pos_k <= pos_q + window_right)
    if window_left >= 0:
        mask = jnp.logical_and(mask, pos_k >= pos_q - window_left)
    return mask


def _vl_tile_needs_mask(seg_q_ref, pos_q_ref, seg_k_ref, pos_k_ref,
                        block_q, block_k, causal, window_left, window_right):
    """Scalar interior test: a tile whose q and kv blocks sit inside ONE
    common segment and fully inside the causal/window band needs no mask
    (the varlen analog of _tile_needs_mask; padded tails have sentinel
    segment ids so they always fail the same-segment test)."""
    interior = jnp.logical_and(
        seg_q_ref[0, 0] == seg_q_ref[block_q - 1, 0],
        jnp.logical_and(seg_q_ref[0, 0] == seg_k_ref[0, 0],
                        seg_k_ref[0, 0] == seg_k_ref[0, block_k - 1]),
    )
    if causal or window_right >= 0:
        wr = 0 if causal else window_right
        interior = jnp.logical_and(
            interior, pos_k_ref[0, block_k - 1] <= pos_q_ref[0, 0] + wr)
    if window_left >= 0:
        interior = jnp.logical_and(
            interior,
            pos_k_ref[0, 0] >= pos_q_ref[block_q - 1, 0] - window_left)
    return jnp.logical_not(interior)


def _vl_dkv_kernel(
    qf_ref, ql_ref,  # scalar prefetch: first/last q block per kv block
    *refs,
    scale: float,
    block_q: int,
    block_k: int,
    group: int,
    causal: bool,
    window_left: int,
    window_right: int,
    softcap: float = 0.0,
    softcap_mul: float = 0.0,
    alibi: bool = False,
    kv_off: int = 0,
):
    j = pl.program_id(1)
    g = pl.program_id(2)
    i = pl.program_id(3)
    if alibi:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         seg_q_ref, pos_q_ref, seg_k_ref, pos_k_ref, slopes_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         seg_q_ref, pos_q_ref, seg_k_ref, pos_k_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs
        slopes_ref = None
    first_i = qf_ref[j]
    last_i = ql_ref[j]

    @pl.when(jnp.logical_and(g == 0, i == first_i))
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    run = jnp.logical_and(i >= first_i, i <= last_i)
    needs_mask = _vl_tile_needs_mask(
        seg_q_ref, pos_q_ref, seg_k_ref, pos_k_ref, block_q, block_k,
        causal, window_left, window_right)

    def _step(masked: bool):
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0]  # [bq, 1]
        delta = delta_ref[0]
        mask = (_vl_tile_mask(seg_q_ref[...], pos_q_ref[...],
                              seg_k_ref[...], pos_k_ref[...],
                              causal, window_left, window_right)
                if masked else None)
        bias = (-slopes_ref[0, 0, 0] * jnp.abs(
            pos_q_ref[...] - pos_k_ref[...]).astype(jnp.float32)
            if alibi else None)
        p, dcap = _recompute_p(q, k, lse, mask, scale * _LOG2E,
                               softcap, softcap_mul, bias)
        dv_acc[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * scale
        if dcap is not None:
            ds = ds * dcap
        dk_acc[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    pl.when(jnp.logical_and(run, needs_mask))(lambda: _step(True))
    pl.when(jnp.logical_and(run, jnp.logical_not(needs_mask)))(
        lambda: _step(False))

    @pl.when(jnp.logical_and(g == group - 1, i == last_i))
    def _store():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _vl_dq_kernel(
    kvf_ref, kvl_ref,  # scalar prefetch: first/last kv block per q block
    *refs,
    scale: float,
    block_q: int,
    block_k: int,
    causal: bool,
    window_left: int,
    window_right: int,
    softcap: float = 0.0,
    softcap_mul: float = 0.0,
    alibi: bool = False,
    kv_off: int = 0,
):
    i = pl.program_id(1)
    j = pl.program_id(2)
    if alibi:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         seg_q_ref, pos_q_ref, seg_k_ref, pos_k_ref, slopes_ref,
         dq_ref, dq_acc) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         seg_q_ref, pos_q_ref, seg_k_ref, pos_k_ref,
         dq_ref, dq_acc) = refs
        slopes_ref = None
    first_j = kvf_ref[i]
    last_j = kvl_ref[i]

    @pl.when(j == first_j)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    run = jnp.logical_and(j >= first_j, j <= last_j)
    needs_mask = _vl_tile_needs_mask(
        seg_q_ref, pos_q_ref, seg_k_ref, pos_k_ref, block_q, block_k,
        causal, window_left, window_right)

    def _step(masked: bool):
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0]
        delta = delta_ref[0]
        mask = (_vl_tile_mask(seg_q_ref[...], pos_q_ref[...],
                              seg_k_ref[...], pos_k_ref[...],
                              causal, window_left, window_right)
                if masked else None)
        bias = (-slopes_ref[0, 0, 0] * jnp.abs(
            pos_q_ref[...] - pos_k_ref[...]).astype(jnp.float32)
            if alibi else None)
        p, dcap = _recompute_p(q, k, lse, mask, scale * _LOG2E,
                               softcap, softcap_mul, bias)
        dp = jax.lax.dot_general(
            do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * scale
        if dcap is not None:
            ds = ds * dcap
        dq_acc[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    pl.when(jnp.logical_and(run, needs_mask))(lambda: _step(True))
    pl.when(jnp.logical_and(run, jnp.logical_not(needs_mask)))(
        lambda: _step(False))

    @pl.when(j == last_j)
    def _store():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "softmax_scale", "window_size", "block_q",
                     "block_k", "interpret", "logit_softcap"),
)
def varlen_attention_bwd(
    q: jax.Array,  # [total_q, hq, d]
    k: jax.Array,  # [total_k, hkv, d]
    v: jax.Array,
    out: jax.Array,  # forward output [total_q, hq, d]
    lse: jax.Array,  # [hq, total_q] natural-log LSE (varlen return_lse)
    do: jax.Array,
    cu_seqlens_q: jax.Array,  # [batch+1] int32
    cu_seqlens_k: jax.Array,
    *,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    window_size: tuple[int, int] = (-1, -1),
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
    logit_softcap: float = 0.0,
    alibi_slopes: Optional[jax.Array] = None,
):
    """-> (dq, dk, dv) on the packed [total, h, d] layout."""
    from mfa_tpu.kernels.varlen import _segments_from_cu

    total_q, num_heads, head_dim = q.shape
    total_k, num_kv_heads, _ = k.shape
    group = num_heads // num_kv_heads
    batch = cu_seqlens_q.shape[0] - 1
    if softmax_scale is None:
        softmax_scale = softmax_scale_default(head_dim)
    if interpret is None:
        interpret = default_interpret()
    window_left, window_right = window_size

    alibi = alibi_slopes is not None
    if alibi:
        if logit_softcap:
            raise ValueError("alibi_slopes and logit_softcap are exclusive")
        slopes_in = jnp.broadcast_to(
            (jnp.asarray(alibi_slopes, jnp.float32)
             / float(softmax_scale))[:, None, None],
            (num_heads, 8, 128),
        )

    cfg_bq, cfg_bk = choose_bwd_config(total_q, total_k, head_dim,
                                       q.dtype.itemsize)
    bq = min(block_q or cfg_bq, round_up(total_q, 8))
    bk = min(block_k or cfg_bk, round_up(total_k, 128))
    tq_p = round_up(total_q, bq)
    tk_p = round_up(total_k, bk)
    n_q_blocks = tq_p // bq
    n_kv_blocks = tk_p // bk

    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)  # [total_q, hq]

    def pad_t(x, target, axis=1):
        padw = [(0, 0)] * x.ndim
        padw[axis] = (0, target - x.shape[axis])
        return jnp.pad(x, padw) if target != x.shape[axis] else x

    qt = pad_t(jnp.swapaxes(q, 0, 1), tq_p)  # [hq, tq_p, d]
    dot = pad_t(jnp.swapaxes(do, 0, 1), tq_p)
    kt = pad_t(jnp.swapaxes(k, 0, 1), tk_p)
    vt = pad_t(jnp.swapaxes(v, 0, 1), tk_p)
    # fully-masked rows carry -inf LSE; the recompute masks their P to 0,
    # but sanitize so padded tails never produce inf-inf on the VPU
    lse_c = jnp.where(jnp.isfinite(lse), lse, 0.0)
    lsep = pad_t(lse_c[..., None], tq_p)  # [hq, tq_p, 1]
    deltap = pad_t(jnp.swapaxes(delta, 0, 1)[..., None], tq_p)

    cu_q = jnp.asarray(cu_seqlens_q, jnp.int32)
    cu_k = jnp.asarray(cu_seqlens_k, jnp.int32)
    lens_q = cu_q[1:] - cu_q[:-1]
    lens_k = cu_k[1:] - cu_k[:-1]
    q_start = cu_q[:-1]
    k_start = cu_k[:-1]
    seg_q, pos_q = _segments_from_cu(cu_q, total_q, tq_p, fill=-1)
    seg_k, pos_k = _segments_from_cu(cu_k, total_k, tk_p, fill=-2)

    # ---- per-q-block kv block bounds (for dQ; same derivation as the
    # varlen forward, minus sinks) ----
    qb_start = jnp.arange(n_q_blocks, dtype=jnp.int32) * bq
    qb_end = jnp.minimum(qb_start + bq - 1, max(total_q - 1, 0))
    segf = seg_q[qb_start].clip(0, batch - 1)
    segl = seg_q[qb_end].clip(0, batch - 1)
    kv_first_tok = k_start[segf]
    if window_left >= 0:
        kv_first_tok = jnp.minimum(
            kv_first_tok + jnp.maximum(0, pos_q[qb_start] - window_left),
            k_start[segf] + jnp.maximum(lens_k[segf] - 1, 0))
    if causal or window_right >= 0:
        last_pos = pos_q[qb_end] + max(window_right, 0)
        kv_last_tok = k_start[segl] + jnp.minimum(
            last_pos, lens_k[segl] - 1)
    else:
        kv_last_tok = k_start[segl] + lens_k[segl] - 1
    kv_first = kv_first_tok // bk
    kv_last = jnp.clip(kv_last_tok, 0, max(total_k - 1, 0)) // bk
    kv_last = jnp.maximum(kv_last, kv_first)

    # ---- per-kv-block q block bounds (for dKV; the transpose) ----
    jb_start = jnp.arange(n_kv_blocks, dtype=jnp.int32) * bk
    jb_end = jnp.minimum(jb_start + bk - 1, max(total_k - 1, 0))
    ksegf = seg_k[jb_start].clip(0, batch - 1)
    ksegl = seg_k[jb_end].clip(0, batch - 1)
    q_first_tok = q_start[ksegf]
    if causal or window_right >= 0:
        wr = 0 if causal else window_right
        q_first_tok = jnp.minimum(
            q_first_tok + jnp.maximum(0, pos_k[jb_start] - wr),
            q_start[ksegf] + jnp.maximum(lens_q[ksegf] - 1, 0))
    if window_left >= 0:
        q_last_tok = q_start[ksegl] + jnp.minimum(
            pos_k[jb_end] + window_left, lens_q[ksegl] - 1)
    else:
        q_last_tok = q_start[ksegl] + lens_q[ksegl] - 1
    q_first = q_first_tok // bq
    q_last = jnp.clip(q_last_tok, 0, max(total_q - 1, 0)) // bq
    q_last = jnp.maximum(q_last, q_first)

    seg_q_col = seg_q[:, None]
    pos_q_col = pos_q[:, None]
    seg_k_row = seg_k[None, :]
    pos_k_row = pos_k[None, :]

    common = dict(
        scale=float(softmax_scale),
        softcap=float(logit_softcap),
        softcap_mul=(float(softmax_scale) / float(logit_softcap)
                     if logit_softcap else 0.0),
        block_q=bq, block_k=bk,
        causal=causal,
        window_left=window_left, window_right=window_right,
        alibi=alibi,
    )

    # ---------------- dKV ----------------
    def q_idx_dkv(h, j, g, i, qf, ql):
        return (h * group + g, jnp.clip(i, qf[j], ql[j]), 0)

    def k_idx_dkv(h, j, g, i, qf, ql):
        return (h, j, 0)

    def segq_idx_dkv(h, j, g, i, qf, ql):
        return (jnp.clip(i, qf[j], ql[j]), 0)

    dkv_in_specs = [
        pl.BlockSpec((1, bq, head_dim), q_idx_dkv),
        pl.BlockSpec((1, bk, head_dim), k_idx_dkv),
        pl.BlockSpec((1, bk, head_dim), k_idx_dkv),
        pl.BlockSpec((1, bq, head_dim), q_idx_dkv),
        pl.BlockSpec((1, bq, 1), q_idx_dkv),
        pl.BlockSpec((1, bq, 1), q_idx_dkv),
        pl.BlockSpec((bq, 1), segq_idx_dkv),
        pl.BlockSpec((bq, 1), segq_idx_dkv),
        pl.BlockSpec((1, bk), lambda h, j, g, i, qf, ql: (0, j)),
        pl.BlockSpec((1, bk), lambda h, j, g, i, qf, ql: (0, j)),
    ]
    dkv_inputs = [qt, kt, vt, dot, lsep, deltap,
                  seg_q_col, pos_q_col, seg_k_row, pos_k_row]
    if alibi:
        dkv_in_specs.append(pl.BlockSpec(
            (1, 8, 128),
            lambda h, j, g, i, qf, ql: (h * group + g, 0, 0)))
        dkv_inputs.append(slopes_in)
    dk, dv = pl.pallas_call(
        functools.partial(_vl_dkv_kernel, group=group, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_kv_heads, n_kv_blocks, group, n_q_blocks),
            in_specs=dkv_in_specs,
            out_specs=[
                pl.BlockSpec((1, bk, head_dim), k_idx_dkv),
                pl.BlockSpec((1, bk, head_dim), k_idx_dkv),
            ],
            scratch_shapes=[
                pltpu.VMEM((bk, head_dim), jnp.float32),
                pltpu.VMEM((bk, head_dim), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((num_kv_heads, tk_p, head_dim), k.dtype),
            jax.ShapeDtypeStruct((num_kv_heads, tk_p, head_dim), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q_first.astype(jnp.int32), q_last.astype(jnp.int32), *dkv_inputs)

    # ---------------- dQ ----------------
    def q_idx_dq(h, i, j, f, l):
        return (h, i, 0)

    def k_idx_dq(h, i, j, f, l):
        return (h // group, jnp.clip(j, f[i], l[i]), 0)

    dq_in_specs = [
        pl.BlockSpec((1, bq, head_dim), q_idx_dq),
        pl.BlockSpec((1, bk, head_dim), k_idx_dq),
        pl.BlockSpec((1, bk, head_dim), k_idx_dq),
        pl.BlockSpec((1, bq, head_dim), q_idx_dq),
        pl.BlockSpec((1, bq, 1), q_idx_dq),
        pl.BlockSpec((1, bq, 1), q_idx_dq),
        pl.BlockSpec((bq, 1), lambda h, i, j, f, l: (i, 0)),
        pl.BlockSpec((bq, 1), lambda h, i, j, f, l: (i, 0)),
        pl.BlockSpec((1, bk), lambda h, i, j, f, l: (0, jnp.clip(j, f[i], l[i]))),
        pl.BlockSpec((1, bk), lambda h, i, j, f, l: (0, jnp.clip(j, f[i], l[i]))),
    ]
    dq_inputs = [qt, kt, vt, dot, lsep, deltap,
                 seg_q_col, pos_q_col, seg_k_row, pos_k_row]
    if alibi:
        dq_in_specs.append(pl.BlockSpec(
            (1, 8, 128), lambda h, i, j, f, l: (h, 0, 0)))
        dq_inputs.append(slopes_in)
    dq = pl.pallas_call(
        functools.partial(_vl_dq_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_heads, n_q_blocks, n_kv_blocks),
            in_specs=dq_in_specs,
            out_specs=pl.BlockSpec((1, bq, head_dim), q_idx_dq),
            scratch_shapes=[pltpu.VMEM((bq, head_dim), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((num_heads, tq_p, head_dim), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kv_first.astype(jnp.int32), kv_last.astype(jnp.int32), *dq_inputs)

    return (jnp.swapaxes(dq[:, :total_q], 0, 1),
            jnp.swapaxes(dk[:, :total_k], 0, 1),
            jnp.swapaxes(dv[:, :total_k], 0, 1))
