"""Differentiable flash attention (custom VJP).

The reference is inference-only — no backward pass exists anywhere
(SURVEY.md §0). The TPU framework still needs gradients so the flagship
model has a real training step (and so users can fine-tune with the same
attention op they serve with). Forward is the Pallas prefill kernel with
LSE residuals; backward is the tiled Pallas dKV/dQ recomputation kernels
(mfa_tpu/kernels/backward.py) — O(seq) memory, flash-style. A dense jnp
backward (`_bwd_jnp_reference`) is kept as the numerical oracle for tests.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

from mfa_tpu.dispatch.config import softmax_scale_default
from mfa_tpu.kernels.prefill import prefill_attention

_MASK = -1e30


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7)
)
def flash_attention_grad(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    window_size: tuple[int, int] = (-1, -1),
    logit_softcap: float = 0.0,
    sink_tokens: int = 0,
    alibi_slopes: Optional[jax.Array] = None,
) -> jax.Array:
    """Differentiable attention on [batch, heads, seq, head_dim] layout.
    sink_tokens (StreamingLLM): fully differentiable — models fine-tune
    with the same sinked-window attention they serve (fused backward
    kernel with sink-prefix cell tables, kernels/backward.py).
    alibi_slopes: [h] per-head slopes (position-only bias: its own
    gradient is zero)."""
    return prefill_attention(
        q, k, v, causal=causal, softmax_scale=softmax_scale,
        window_size=window_size, logit_softcap=logit_softcap,
        sink_tokens=sink_tokens, alibi_slopes=alibi_slopes,
    )


def _fwd(q, k, v, causal, softmax_scale, window_size, logit_softcap,
         sink_tokens, alibi_slopes=None):
    out, lse = prefill_attention(
        q, k, v, causal=causal, softmax_scale=softmax_scale,
        window_size=window_size, return_lse=True,
        logit_softcap=logit_softcap, sink_tokens=sink_tokens,
        alibi_slopes=alibi_slopes,
    )
    return out, (q, k, v, out, lse, alibi_slopes)


def _bwd(causal, softmax_scale, window_size, logit_softcap, sink_tokens,
         res, do):
    from mfa_tpu.kernels.backward import flash_attention_bwd

    q, k, v, out, lse, alibi_slopes = res
    dq, dk, dv = flash_attention_bwd(
        q, k, v, out, lse, do,
        causal=causal, softmax_scale=softmax_scale, window_size=window_size,
        logit_softcap=logit_softcap, alibi_slopes=alibi_slopes,
        sink_tokens=sink_tokens,
    )
    # ALiBi slopes are position-only constants: zero cotangent.
    dslopes = (None if alibi_slopes is None
               else jnp.zeros_like(alibi_slopes))
    return dq, dk, dv, dslopes


def _mask(sq, sk, causal, window_size):
    row = jnp.arange(sq)[:, None]
    col = jnp.arange(sk)[None, :]
    m = jnp.ones((sq, sk), bool)
    wl, wr = window_size
    if causal:
        wr = 0
    if wr >= 0:
        m = m & (col <= row + wr)
    if wl >= 0:
        m = m & (col >= row - wl)
    return m


def _bwd_jnp_reference(causal, softmax_scale, window_size, res, do):
    """O(seq^2)-memory jnp backward — kept as the numerical reference for
    tests of the Pallas backward (mfa_tpu/kernels/backward.py)."""
    q, k, v, out = res
    b, hq, sq, d = q.shape
    hkv = k.shape[1]
    group = hq // hkv
    scale = softmax_scale or softmax_scale_default(d)

    qf = q.astype(jnp.float32)
    kf = jnp.repeat(k.astype(jnp.float32), group, axis=1)
    vf = jnp.repeat(v.astype(jnp.float32), group, axis=1)
    dof = do.astype(jnp.float32)
    of = out.astype(jnp.float32)

    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
    mask = _mask(sq, k.shape[2], causal, window_size)
    s = jnp.where(mask, s, _MASK)
    p = jax.nn.softmax(s, axis=-1)
    # fully-masked rows (window past a shorter kv) produce ZERO output in
    # the forward and therefore zero gradients — not the uniform p the
    # finite _MASK would leave
    p = jnp.where(jnp.any(mask, axis=-1, keepdims=True), p, 0.0)

    dv = jnp.einsum("bhqk,bhqd->bhkd", p, dof)
    dp = jnp.einsum("bhqd,bhkd->bhqk", dof, vf)
    delta = jnp.sum(dof * of, axis=-1, keepdims=True)  # [b,h,q,1]
    ds = p * (dp - delta)
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kf) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf) * scale
    # Fold GQA: sum grads over the q-head group back onto kv heads.
    dk = dk.reshape(b, hkv, group, *dk.shape[2:]).sum(axis=2)
    dv = dv.reshape(b, hkv, group, *dv.shape[2:]).sum(axis=2)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention_grad.defvjp(_fwd, _bwd)


# ---------------- varlen (packed / cu_seqlens) autodiff ----------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def _varlen_grad_p(
    q, k, v, cu_seqlens_q, cu_seqlens_k, alibi_slopes,
    max_seqlen_q, max_seqlen_k, causal, softmax_scale, window_size,
    logit_softcap,
):
    from mfa_tpu.kernels.varlen import varlen_attention

    return varlen_attention(
        q, k, v, cu_seqlens_q, cu_seqlens_k, max_seqlen_q, max_seqlen_k,
        causal=causal, softmax_scale=softmax_scale, window_size=window_size,
        logit_softcap=logit_softcap, alibi_slopes=alibi_slopes,
    )


def _varlen_fwd(q, k, v, cu_q, cu_k, alibi_slopes, max_seqlen_q,
                max_seqlen_k, causal, softmax_scale, window_size,
                logit_softcap):
    from mfa_tpu.kernels.varlen import varlen_attention

    out, lse = varlen_attention(
        q, k, v, cu_q, cu_k, max_seqlen_q, max_seqlen_k,
        causal=causal, softmax_scale=softmax_scale, window_size=window_size,
        logit_softcap=logit_softcap, alibi_slopes=alibi_slopes,
        return_lse=True,
    )
    return out, (q, k, v, cu_q, cu_k, alibi_slopes, out, lse)


def _varlen_bwd(max_seqlen_q, max_seqlen_k, causal, softmax_scale,
                window_size, logit_softcap, res, do):
    import numpy as np

    from mfa_tpu.kernels.backward import varlen_attention_bwd

    q, k, v, cu_q, cu_k, alibi_slopes, out, lse = res
    dq, dk, dv = varlen_attention_bwd(
        q, k, v, out, lse, do, cu_q, cu_k,
        causal=causal, softmax_scale=softmax_scale, window_size=window_size,
        logit_softcap=logit_softcap, alibi_slopes=alibi_slopes,
    )
    # integer cu_seqlens carry symbolic-zero (float0) cotangents
    f0 = jax.dtypes.float0
    dcu_q = np.zeros(cu_q.shape, f0)
    dcu_k = np.zeros(cu_k.shape, f0)
    dslopes = (None if alibi_slopes is None
               else jnp.zeros_like(alibi_slopes))
    return dq, dk, dv, dcu_q, dcu_k, dslopes


_varlen_grad_p.defvjp(_varlen_fwd, _varlen_bwd)


def flash_attn_varlen_func_grad(
    q: jax.Array,  # [total_q, num_heads, head_dim]
    k: jax.Array,  # [total_k, num_kv_heads, head_dim]
    v: jax.Array,
    cu_seqlens_q: jax.Array,
    cu_seqlens_k: jax.Array,
    max_seqlen_q: int,
    max_seqlen_k: int,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    window_size: tuple[int, int] = (-1, -1),
    logit_softcap: float = 0.0,
    alibi_slopes: Optional[jax.Array] = None,
) -> jax.Array:
    """Differentiable flash_attn_varlen_func on the packed layout (the
    training-side complement of interface.flash_attn_varlen_func; the
    reference is inference-only, SURVEY.md §0). Sequence boundaries come
    from cu_seqlens; the backward runs the segment-masked Pallas dKV/dQ
    kernels (kernels/backward.py:varlen_attention_bwd). Attention sinks
    are serving-only and not offered here; the paged (block_table) route
    is inference-only too."""
    return _varlen_grad_p(
        q, k, v, cu_seqlens_q, cu_seqlens_k, alibi_slopes,
        int(max_seqlen_q), int(max_seqlen_k), causal, softmax_scale,
        tuple(window_size), float(logit_softcap),
    )


def flash_attn_func_grad(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    window_size: tuple[int, int] = (-1, -1),
    alibi_slopes: Optional[jax.Array] = None,
) -> jax.Array:
    """Differentiable flash_attn_func on the public [b, s, h, d] layout."""
    out = flash_attention_grad(
        jnp.swapaxes(q, 1, 2),
        jnp.swapaxes(k, 1, 2),
        jnp.swapaxes(v, 1, 2),
        causal,
        softmax_scale,
        tuple(window_size),
        0.0,
        0,
        alibi_slopes,
    )
    return jnp.swapaxes(out, 1, 2)
