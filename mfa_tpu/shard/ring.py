"""Ring attention: context-parallel prefill over the ICI ring.

No reference counterpart (the reference has zero distributed code,
SURVEY.md §2.8); this is the long-context prefill scaling path the split-KV
LSE algebra doesn't cover: Q *and* KV are sharded along the sequence across
chips, KV shards rotate around the ring with `jax.lax.ppermute`
(point-to-point, neighbor-only — saturates ICI links), and each chip folds
every visiting KV shard into its local (O, LSE) running pair. Communication
is overlapped with the Pallas attention on the current shard by XLA's
latency-hiding scheduler (the permute for step t+1 has no data dependency
on step t's compute).

Causal handling per visiting shard (source chip `src`, mine `my`):
  src <  my : fully visible -> non-causal kernel
  src == my : the diagonal  -> causal kernel
  src >  my : fully masked  -> skipped (no kernel, LSE = -inf)
selected with `lax.switch`; partial pairs merge with the same
max-normalized LSE rule as split-KV decode (decode.cuh:718-747 lifted
across chips).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mfa_tpu.kernels.prefill import prefill_attention
from mfa_tpu.shard.mesh import CTX_AXIS

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _merge(o1, lse1, o2, lse2):
    """Merge two normalized partial attention results (fp32)."""
    m = jnp.maximum(lse1, lse2)
    m_safe = jnp.where(jnp.isinf(m) & (m < 0), 0.0, m)
    w1 = jnp.where(jnp.isinf(lse1) & (lse1 < 0), 0.0, jnp.exp(lse1 - m_safe))
    w2 = jnp.where(jnp.isinf(lse2) & (lse2 < 0), 0.0, jnp.exp(lse2 - m_safe))
    denom = w1 + w2
    denom_safe = jnp.where(denom == 0.0, 1.0, denom)
    o = (o1 * w1[..., None] + o2 * w2[..., None]) / denom_safe[..., None]
    lse = jnp.where(denom == 0.0, -jnp.inf, m_safe + jnp.log(denom_safe))
    return o, lse


def ring_attention_prefill(
    mesh: Mesh,
    causal: bool = True,
    softmax_scale: Optional[float] = None,
    ctx_axis: str = CTX_AXIS,
):
    """Build f(q, k, v) on [batch, heads, seq, head_dim] with `seq` sharded
    on `ctx_axis` for q, k and v. Returns the same sharding."""
    n_ring = mesh.shape[ctx_axis]
    spec = P(None, None, ctx_axis, None)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec, spec), out_specs=spec, check_vma=False,
    )
    def _fn(q, k, v):
        my = jax.lax.axis_index(ctx_axis)
        perm = [(i, (i + 1) % n_ring) for i in range(n_ring)]

        def partial_attn(kv_pair, src):
            k_blk, v_blk = kv_pair

            def full(_):
                o, lse = prefill_attention(
                    q, k_blk, v_blk, causal=False,
                    softmax_scale=softmax_scale, return_lse=True,
                )
                return o.astype(jnp.float32), lse

            def diag(_):
                o, lse = prefill_attention(
                    q, k_blk, v_blk, causal=True,
                    softmax_scale=softmax_scale, return_lse=True,
                )
                return o.astype(jnp.float32), lse

            def masked(_):
                return (
                    jnp.zeros(q.shape, jnp.float32),
                    jnp.full(q.shape[:-1], -jnp.inf, jnp.float32),
                )

            if not causal:
                return full(None)
            case = jnp.where(src < my, 0, jnp.where(src == my, 1, 2))
            return jax.lax.switch(case, [full, diag, masked], None)

        kv = (k, v)
        o_acc, lse_acc = partial_attn(kv, my)
        for step in range(1, n_ring):
            # Rotate KV to the next chip; XLA overlaps this permute with
            # the attention below (no data dependency until next step).
            kv = jax.tree.map(
                lambda x: jax.lax.ppermute(x, ctx_axis, perm), kv
            )
            src = (my - step) % n_ring
            o_i, lse_i = partial_attn(kv, src)
            o_acc, lse_acc = _merge(o_acc, lse_acc, o_i, lse_i)

        return o_acc.astype(q.dtype)

    return jax.jit(_fn)
