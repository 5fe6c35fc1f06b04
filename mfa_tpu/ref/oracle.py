"""Pure-jnp reference ("oracle") attention implementations.

These are the numerical ground truth for the Pallas kernels, playing the role
the PyTorch-SDPA / official-flash_attn oracles play in the reference test
suite (reference: tests/test_mha.py:75-81, tests/test_gqa.py:119-128).

Everything here runs on CPU, upcasts to float32 internally, and uses plain
jnp ops only — no Pallas, no sharding. Semantics mirror the CUDA reference:

- GQA/MQA: q-head ``h`` attends to kv-head ``h // (num_heads // num_kv_heads)``
  (reference: csrc/mfa/api.cpp:84, csrc/mfa/prefill.cuh:49).
- Causal masking is top-left aligned: position ``col > row`` is masked
  (reference: csrc/mfa/prefill.cuh:393-421).
- Softmax scale defaults to ``1/sqrt(head_dim)`` (reference: csrc/mfa/api.cpp:99).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = [
    "attention_ref",
    "varlen_attention_ref",
    "decode_ref",
    "paged_decode_ref",
]

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _expand_kv_heads(k: jax.Array, num_heads: int, head_axis: int) -> jax.Array:
    """Repeat kv heads so kv head count matches q head count (GQA oracle).

    Mirrors the test oracle's ``repeat_interleave`` expansion
    (reference: tests/test_gqa.py:119-120).
    """
    num_kv_heads = k.shape[head_axis]
    if num_kv_heads == num_heads:
        return k
    assert num_heads % num_kv_heads == 0
    return jnp.repeat(k, num_heads // num_kv_heads, axis=head_axis)


def attention_ref(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    window_size: tuple[int, int] = (-1, -1),
    q_offset: int | jax.Array = 0,
    seqlen_k: Optional[jax.Array] = None,
) -> jax.Array:
    """Dense attention oracle.

    Args:
      q: [batch, seqlen_q, num_heads, head_dim]
      k: [batch, seqlen_k, num_kv_heads, head_dim]
      v: [batch, seqlen_k, num_kv_heads, head_dim]
      causal: top-left aligned causal mask (col > row masked).
      softmax_scale: defaults to 1/sqrt(head_dim).
      window_size: (left, right) sliding window; -1 = unbounded. causal=True is
        equivalent to window (-1, 0).
      q_offset: position offset of q row 0 (used for decode: q row is at
        absolute position `q_offset`). Scalar or [batch] array.
      seqlen_k: optional [batch] int32 of valid kv lengths (cols >= len masked).

    Returns:
      [batch, seqlen_q, num_heads, head_dim] in q.dtype.
    """
    orig_dtype = q.dtype
    batch, sq, num_heads, head_dim = q.shape
    sk = k.shape[1]
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(head_dim)

    qf = q.astype(jnp.float32)
    kf = _expand_kv_heads(k.astype(jnp.float32), num_heads, 2)
    vf = _expand_kv_heads(v.astype(jnp.float32), num_heads, 2)

    # [b, h, sq, sk]
    scores = jnp.einsum("bqhd,bkhd->bhqk", qf, kf) * softmax_scale

    row = jnp.arange(sq)[:, None]  # [sq, 1]
    col = jnp.arange(sk)[None, :]  # [1, sk]
    q_offset = jnp.asarray(q_offset)
    if q_offset.ndim == 0:
        abs_row = (row + q_offset)[None]  # [1, sq, 1]
    else:
        abs_row = row[None] + q_offset[:, None, None]  # [b, sq, 1]
    mask = jnp.ones((1, sq, sk), dtype=bool) & jnp.ones_like(abs_row, dtype=bool)
    if causal:
        mask = mask & (col[None] <= abs_row)
    wl, wr = window_size
    if wl >= 0:
        mask = mask & (col[None] >= abs_row - wl)
    if wr >= 0 and not causal:
        mask = mask & (col[None] <= abs_row + wr)
    if seqlen_k is not None:
        mask = mask & (col[None] < jnp.asarray(seqlen_k)[:, None, None])

    scores = jnp.where(mask[:, None], scores, _MASK_VALUE)
    # Guard fully-masked rows (all -inf): softmax would be NaN; reference
    # outputs zeros via its expsum==0 guard (csrc/mfa/prefill.cuh:599-612).
    probs = jax.nn.softmax(scores, axis=-1)
    row_any = jnp.any(mask, axis=-1)[:, None, :, None]  # [b,1,sq,1]
    probs = jnp.where(row_any, probs, 0.0)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vf)
    return out.astype(orig_dtype)


def varlen_attention_ref(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    cu_seqlens_q: Sequence[int],
    cu_seqlens_k: Sequence[int],
    causal: bool = False,
    softmax_scale: Optional[float] = None,
) -> jax.Array:
    """Varlen (packed) attention oracle.

    q: [total_q, num_heads, head_dim]; k/v: [total_k, num_kv_heads, head_dim].
    cu_seqlens must be concrete (host) ints — this is a test oracle.

    Causal semantics within each sequence are top-left aligned on the
    *per-sequence* positions, matching the reference which recomputes row/col
    from per-sequence offsets (csrc/mfa/prefill.cuh:19-33, 393-421).
    """
    cu_q = [int(x) for x in cu_seqlens_q]
    cu_k = [int(x) for x in cu_seqlens_k]
    outs = []
    for b in range(len(cu_q) - 1):
        qb = q[cu_q[b] : cu_q[b + 1]][None]  # [1, sq, h, d]
        kb = k[cu_k[b] : cu_k[b + 1]][None]
        vb = v[cu_k[b] : cu_k[b + 1]][None]
        outs.append(
            attention_ref(qb, kb, vb, causal=causal, softmax_scale=softmax_scale)[0]
        )
    return jnp.concatenate(outs, axis=0)


def decode_ref(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    cache_seqlens: jax.Array,
    softmax_scale: Optional[float] = None,
    window_left: int = -1,
) -> jax.Array:
    """Decode (seqlen_q == 1) oracle against a contiguous KV cache.

    q: [batch, 1, num_heads, head_dim]
    k_cache/v_cache: [batch, max_seqlen_k, num_kv_heads, head_dim]
    cache_seqlens: [batch] int32 valid lengths.

    Matches flash_attn_with_kvcache semantics: non-causal (the single query
    is the last token; masking is purely by cache length)
    (reference: mini_flash_attention/interface.py:118-124).
    """
    if window_left < 0:
        return attention_ref(
            q,
            k_cache,
            v_cache,
            causal=False,
            softmax_scale=softmax_scale,
            seqlen_k=cache_seqlens,
        )
    # Sliding window: the single query sits at position length-1, so only
    # columns in [length-1-window_left, length) are visible.
    batch, s_k, num_kv_heads, head_dim = k_cache.shape
    num_heads = q.shape[2]
    if softmax_scale is None:
        softmax_scale = head_dim ** -0.5
    qf = q.astype(jnp.float32)[:, 0]  # [b, h, d]
    kf = _expand_kv_heads(k_cache.astype(jnp.float32), num_heads, 2)
    vf = _expand_kv_heads(v_cache.astype(jnp.float32), num_heads, 2)
    scores = jnp.einsum("bhd,bshd->bhs", qf, kf) * softmax_scale
    lens = jnp.asarray(cache_seqlens, jnp.int32)[:, None, None]
    col = jnp.arange(s_k, dtype=jnp.int32)[None, None, :]
    start = jnp.maximum(0, lens - 1 - window_left)
    visible = jnp.logical_and(col < lens, col >= start)
    scores = jnp.where(visible, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(jnp.isnan(probs), 0.0, probs)
    out = jnp.einsum("bhs,bshd->bhd", probs, vf)
    return out[:, None].astype(q.dtype)


def paged_decode_ref(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    cache_seqlens: jax.Array,
    block_table: jax.Array,
    softmax_scale: Optional[float] = None,
    window_left: int = -1,
) -> jax.Array:
    """Paged decode oracle.

    q: [batch, 1, num_heads, head_dim]
    k_pages/v_pages: [num_pages, page_size, num_kv_heads, head_dim]
    block_table: [batch, max_pages_per_seq] int32 physical page ids.
    cache_seqlens: [batch] int32 valid lengths.

    Gathers each sequence's pages into a contiguous cache then runs decode_ref
    (reference paged addressing: csrc/mfa/prefill.cuh:52-57, decode.cuh:47-77).
    """
    num_pages, page_size, num_kv_heads, head_dim = k_pages.shape
    batch, max_pages = block_table.shape
    # [batch, max_pages, page, kvh, d] -> [batch, max_pages*page, kvh, d]
    k_gather = k_pages[block_table].reshape(batch, max_pages * page_size, num_kv_heads, head_dim)
    v_gather = v_pages[block_table].reshape(batch, max_pages * page_size, num_kv_heads, head_dim)
    return decode_ref(q, k_gather, v_gather, cache_seqlens,
                      softmax_scale=softmax_scale, window_left=window_left)
