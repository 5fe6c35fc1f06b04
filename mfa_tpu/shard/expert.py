"""Expert parallelism (EP) for MoE layers.

The reference has no distributed code at all (SURVEY.md §2.8); this is the
TPU-native scaling layer for the expert bank. Design:

- The expert weight bank [E, d, f] is sharded on the "expert" mesh axis
  (optionally composed with "model"-axis tensor parallelism on the ffn
  dim, matching mfa_tpu.models.llama.param_shardings).
- The router is replicated and every shard computes the SAME global top-k
  routing (top_k/argsort are deterministic), so there is no routing
  traffic at all.
- Each shard runs the grouped matmuls (lax.ragged_dot) for the token
  assignments that landed on its LOCAL experts only: assignments are
  stable-sorted with non-local rows keyed last, the local group_sizes
  cover exactly the local prefix, and the uncovered tail never
  contributes (its scatter target is dropped). Compute and expert-weight
  HBM traffic both scale 1/ep, token-dropless.
- Combine is one psum of the [T, d] output over the expert (and model)
  axes, riding ICI; for top-k routing this trades a k/ep-sized all_to_all
  for a simpler full-width reduce — the right call at serving batch sizes
  where the MoE layer is weight-bandwidth-bound, not activation-bound.

Activations enter replicated (in_specs P()); under a data-parallel
training mesh XLA inserts the gather, which is correct but leaves DP
overlap on the table — EP is aimed at the serving path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mfa_tpu.shard.mesh import EXPERT_AXIS, MODEL_AXIS

try:  # jax>=0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def use_expert_parallel(mesh) -> bool:
    return (mesh is not None and EXPERT_AXIS in mesh.axis_names
            and mesh.shape[EXPERT_AXIS] > 1)


def expert_parallel_moe(mesh: Mesh, cfg):
    """Returns f(t, w_router, we_gate, we_up, we_down) -> [T, d] routed
    expert output (no shared expert, no residual), sharded per the module
    docstring. cfg: LlamaConfig (n_active_experts / norm_topk /
    hidden_act)."""
    has_tp = MODEL_AXIS in mesh.axis_names and mesh.shape[MODEL_AXIS] > 1
    tp = MODEL_AXIS if has_tp else None
    wspec_gu = P(EXPERT_AXIS, None, tp)  # [E, d, f]
    wspec_d = P(EXPERT_AXIS, tp, None)  # [E, f, d]
    red = (EXPERT_AXIS,) + ((MODEL_AXIS,) if has_tp else ())
    k = cfg.n_active_experts

    def fn(t, w_router, weg, weu, wed):
        # routing convention (fp32 router, norm_topk semantics) is defined
        # ONCE in llama._moe_route; every shard computes the same global
        # routing from the replicated router (no routing traffic)
        from mfa_tpu.models.llama import _act, _moe_route

        T = t.shape[0]
        e_local = weg.shape[0]
        w_top, idx = _moe_route(t, w_router, k, cfg.norm_topk)

        e0 = jax.lax.axis_index(EXPERT_AXIS) * e_local
        flat_e = idx.reshape(-1)  # [T*k] global expert ids
        loc = flat_e - e0
        valid = jnp.logical_and(loc >= 0, loc < e_local)
        # Stable sort; non-local assignments keyed past the local experts
        # so the local groups form an exact prefix.
        order = jnp.argsort(jnp.where(valid, loc, e_local))
        tok_of = (jnp.arange(T * k, dtype=jnp.int32) // k)[order]
        valid_sorted = valid[order]
        gathered = t[tok_of]  # [T*k, d]
        gs = jnp.zeros((e_local,), jnp.int32).at[
            jnp.where(valid, loc, 0)].add(valid.astype(jnp.int32))

        # group_sizes sum to the local-prefix length only: ragged_dot
        # touches just those rows; the uncovered tail is unspecified and
        # its scatter targets are dropped below.
        gate = _act(jax.lax.ragged_dot(gathered, weg, gs), cfg.hidden_act)
        up = jax.lax.ragged_dot(gathered, weu, gs)
        down = jax.lax.ragged_dot(gate * up, wed, gs)  # [T*k, d]

        wflat = w_top.reshape(-1)[order].astype(down.dtype)
        tgt = jnp.where(valid_sorted, tok_of, T)  # T = out-of-range
        out = jnp.zeros((T, t.shape[-1]), down.dtype).at[tgt].add(
            down * wflat[:, None], mode="drop")
        return jax.lax.psum(out, red)

    return shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P(), wspec_gu, wspec_gu, wspec_d),
        out_specs=P(),
    )
