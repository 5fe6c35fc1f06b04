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
overlap on the table — `expert_parallel_moe` is aimed at the serving
path, where the MoE layer is weight-bandwidth-bound.

For TRAINING-scale token counts, `expert_parallel_moe_a2a` implements
the standard dispatch/combine design instead: tokens are sharded on the
expert axis, each shard routes its local tokens, ships them to the
owning expert shard with `lax.all_to_all` (capacity-bounded buffers, the
TPU-native fixed-shape form of the a2a — XLA lowers it to ICI
all-to-all), grouped-matmuls locally, and a second all_to_all returns
results for the local weighted combine. Activation traffic is
O(T*k/ep * d) per hop instead of the serving path's O(T * d) psum, and
every op in the pipeline (sort/gather/scatter-add/ragged_dot/all_to_all)
is differentiable, so this is the path a training step takes.
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


def expert_parallel_moe_a2a(mesh: Mesh, cfg, capacity_factor: float = 2.0):
    """Training-shaped EP: all_to_all dispatch/combine over the expert
    axis (see module docstring).

    Returns f(t, w_router, we_gate, we_up, we_down) -> [T, d] with t
    SHARDED on the expert axis (T must divide by ep). Each shard holds
    Tl = T/ep tokens and cap = ceil(Tl*k/ep * capacity_factor) slots per
    peer; assignments beyond a peer's capacity are dropped (standard
    capacity-factor semantics — the default 2.0 makes drops rare for
    near-uniform routing; the dropless serving path is
    expert_parallel_moe)."""
    has_tp = MODEL_AXIS in mesh.axis_names and mesh.shape[MODEL_AXIS] > 1
    tp = MODEL_AXIS if has_tp else None
    wspec_gu = P(EXPERT_AXIS, None, tp)
    wspec_d = P(EXPERT_AXIS, tp, None)
    k = cfg.n_active_experts
    ep = mesh.shape[EXPERT_AXIS]

    def fn(t, w_router, weg, weu, wed):
        from mfa_tpu.models.llama import _act, _moe_route

        import math

        Tl, d = t.shape
        e_local = weg.shape[0]
        A = Tl * k
        cap = max(1, int(math.ceil(A / ep * capacity_factor)))
        w_top, idx = _moe_route(t, w_router, k, cfg.norm_topk)

        flat_e = idx.reshape(-1)          # [A] global expert ids
        dest = flat_e // e_local          # owning shard
        le = flat_e % e_local             # local expert on that shard
        tok = jnp.arange(A, dtype=jnp.int32) // k
        order = jnp.argsort(dest)         # stable: dest-major send layout
        dest_s = dest[order]
        le_s = le[order]
        tok_s = tok[order]
        # slot within destination = rank - first rank of that dest
        first = jnp.searchsorted(dest_s, jnp.arange(ep, dtype=dest_s.dtype))
        slot = jnp.arange(A, dtype=jnp.int32) - first[dest_s]
        keep = slot < cap
        tgt = jnp.where(keep, dest_s * cap + slot, ep * cap)  # drop row

        send_x = jnp.zeros((ep * cap + 1, d), t.dtype).at[tgt].set(
            t[tok_s], mode="drop")[:-1].reshape(ep, cap, d)
        send_le = jnp.full((ep * cap + 1,), e_local, jnp.int32).at[tgt].set(
            le_s, mode="drop")[:-1].reshape(ep, cap)

        rx = jax.lax.all_to_all(send_x, EXPERT_AXIS, 0, 0)
        rle = jax.lax.all_to_all(send_le, EXPERT_AXIS, 0, 0)

        xa = rx.reshape(ep * cap, d)
        lea = rle.reshape(-1)
        valid = lea < e_local            # unfilled capacity slots excluded
        order2 = jnp.argsort(jnp.where(valid, lea, e_local))
        xs = xa[order2]
        gs = jnp.zeros((e_local,), jnp.int32).at[
            jnp.where(valid, lea, 0)].add(valid.astype(jnp.int32))
        gate = _act(jax.lax.ragged_dot(xs, weg, gs), cfg.hidden_act)
        up = jax.lax.ragged_dot(xs, weu, gs)
        down = jax.lax.ragged_dot(gate * up, wed, gs)
        if has_tp:  # ffn dim is TP-sharded: partial sums over the f axis
            down = jax.lax.psum(down, MODEL_AXIS)
        ya = jnp.zeros((ep * cap, d), down.dtype).at[order2].set(down)

        back = jax.lax.all_to_all(
            ya.reshape(ep, cap, d), EXPERT_AXIS, 0, 0).reshape(ep * cap, d)
        # every kept assignment's result sits at its send slot; dropped
        # assignments contribute zero
        contrib = back[jnp.clip(tgt, 0, ep * cap - 1)]
        contrib = jnp.where(keep[:, None], contrib, 0.0)
        w_s = w_top.reshape(-1)[order].astype(contrib.dtype)
        return jnp.zeros((Tl, d), contrib.dtype).at[tok_s].add(
            contrib * w_s[:, None])

    return shard_map(
        fn, mesh=mesh,
        in_specs=(P(EXPERT_AXIS), P(), wspec_gu, wspec_gu, wspec_d),
        out_specs=P(EXPERT_AXIS),
    )
