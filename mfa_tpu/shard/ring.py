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


def _ring_live_steps(n_ring: int, chunk: int, window_left: int) -> int:
    """Number of ring steps (incl. the diagonal step 0) whose KV pair can
    contain ANY visible column under a causal left window: pair t is live
    iff t*chunk <= window_left + chunk - 1. Unbounded window -> n_ring."""
    if window_left < 0:
        return n_ring
    return min(n_ring, (window_left + chunk - 1) // chunk + 1)


def _band_hops(n_ring: int, chunk: int, w: int) -> int:
    """Ring hops in ONE direction whose visiting chunk can contain a
    visible column under band half-width w: hop t's nearest column is
    (t-1)*chunk + 1 positions away, so t is live iff (t-1)*chunk < w.
    Unbounded (w < 0) -> all n_ring - 1 other chunks."""
    if w < 0:
        return n_ring - 1
    return min(n_ring - 1, (w - 1) // chunk + 1)


def _ring_forward_banded(q, k, v, n_ring: int, ctx_axis: str,
                         softmax_scale, window_left: int,
                         window_right: int):
    """NON-CAUSAL bidirectional band (window_left, window_right) across
    the ring (local attention, either side -1 = unbounded). Behind chunks
    rotate in the causal direction; ahead chunks ride a SECOND stream
    rotating the other way, so a band spanning a chunks ahead / b behind
    costs max(a, b) neighbor hops — with one stream the ahead chunks
    would arrive LAST (n_ring - 1 hops for the nearest one). An ahead
    pair is the mirror of a behind pair: flipping q rows and kv columns
    and swapping the window sides maps "kv h hops ahead" onto the
    positive-kv_position_offset geometry the kernel already handles
    (col - pos = d becomes -d under the flip), so both directions use
    the same kernel with a static offset."""
    my = jax.lax.axis_index(ctx_axis)
    chunk = q.shape[2]
    fwd_perm = [(i, (i + 1) % n_ring) for i in range(n_ring)]
    rev_perm = [(i, (i - 1) % n_ring) for i in range(n_ring)]
    q_rev = q[:, :, ::-1]

    def masked(_):
        return (jnp.zeros(q.shape, jnp.float32),
                jnp.full(q.shape[:-1], -jnp.inf, jnp.float32))

    def behind(kv, t):
        def pair(_):
            o, lse = prefill_attention(
                q, kv[0], kv[1], causal=False,
                window_size=(window_left, window_right),
                kv_position_offset=t * chunk,
                softmax_scale=softmax_scale, return_lse=True)
            return o.astype(jnp.float32), lse

        if t == 0:
            return pair(None)
        # wrapped sources (my - t < 0) are out of the linear sequence
        return jax.lax.cond(my >= t, pair, masked, None)

    def ahead(kv, h):
        def pair(_):
            o, lse = prefill_attention(
                q_rev, kv[0][:, :, ::-1], kv[1][:, :, ::-1],
                causal=False,
                window_size=(window_right, window_left),
                kv_position_offset=h * chunk,
                softmax_scale=softmax_scale, return_lse=True)
            return o[:, :, ::-1].astype(jnp.float32), lse[:, :, ::-1]

        return jax.lax.cond(my + h < n_ring, pair, masked, None)

    back_hops = _band_hops(n_ring, chunk, window_left)
    fwd_hops = _band_hops(n_ring, chunk, window_right)
    o_acc, lse_acc = behind((k, v), 0)
    kv_b = (k, v)
    kv_f = (k, v)
    for t in range(1, max(back_hops, fwd_hops) + 1):
        if t <= back_hops:
            kv_b = jax.tree.map(
                lambda x: jax.lax.ppermute(x, ctx_axis, fwd_perm), kv_b)
            o_acc, lse_acc = _merge(o_acc, lse_acc, *behind(kv_b, t))
        if t <= fwd_hops:
            kv_f = jax.tree.map(
                lambda x: jax.lax.ppermute(x, ctx_axis, rev_perm), kv_f)
            o_acc, lse_acc = _merge(o_acc, lse_acc, *ahead(kv_f, t))
    return o_acc.astype(q.dtype), lse_acc


def _ring_forward(q, k, v, n_ring: int, ctx_axis: str, causal: bool,
                  softmax_scale: Optional[float], window_left: int = -1,
                  window_right: int = -1):
    """Rotating-KV forward on LOCAL [b, h, s/n, d] blocks (must run inside
    a shard_map over `ctx_axis`): each chip folds every visiting KV shard
    into its running (O fp32, global LSE) pair. Shared by the inference
    wrapper (ring_attention_prefill) and the custom-VJP training path
    (_ring_grad_local). The permute for step t+1 has no data dependency on
    step t's compute, so XLA overlaps it with the attention kernel.

    window_left >= 0 (causal only) slides a window across the chips: step
    t's pair is the plain kernel with kv_position_offset = t*chunk (the q
    chunk leads the visiting kv chunk by t hops), and the rotation STOPS
    after the last step whose pair can still contain a visible column —
    a window spanning w chunks costs w rotations, not n_ring. Non-causal
    windows (bidirectional local attention) take the two-stream banded
    schedule (_ring_forward_banded)."""
    if not causal and (window_left >= 0 or window_right >= 0):
        return _ring_forward_banded(q, k, v, n_ring, ctx_axis,
                                    softmax_scale, window_left,
                                    window_right)
    my = jax.lax.axis_index(ctx_axis)
    perm = [(i, (i + 1) % n_ring) for i in range(n_ring)]
    chunk = q.shape[2]

    def partial_attn(kv_pair, src, step):
        k_blk, v_blk = kv_pair

        def pair(_):
            # step 0 == the causal diagonal (offset 0); steps >= 1 attend
            # a visiting chunk `step` hops back (static offset)
            o, lse = prefill_attention(
                q, k_blk, v_blk, causal=True,
                window_size=(window_left, -1),
                kv_position_offset=step * chunk,
                softmax_scale=softmax_scale, return_lse=True,
            )
            return o.astype(jnp.float32), lse

        def full(_):
            o, lse = prefill_attention(
                q, k_blk, v_blk, causal=False,
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
        if step == 0:
            return pair(None)
        # wrapped sources (src > my) are entirely in the future -> masked
        return jax.lax.cond(src < my, pair, masked, None)

    kv = (k, v)
    o_acc, lse_acc = partial_attn(kv, my, 0)
    for step in range(1, _ring_live_steps(n_ring, chunk, window_left)):
        kv = jax.tree.map(
            lambda x: jax.lax.ppermute(x, ctx_axis, perm), kv)
        src = (my - step) % n_ring
        o_i, lse_i = partial_attn(kv, src, step)
        o_acc, lse_acc = _merge(o_acc, lse_acc, o_i, lse_i)
    return o_acc.astype(q.dtype), lse_acc


def ring_attention_prefill(
    mesh: Mesh,
    causal: bool = True,
    softmax_scale: Optional[float] = None,
    ctx_axis: str = CTX_AXIS,
    window_left: int = -1,
    window_right: int = -1,
):
    """Build f(q, k, v) on [batch, heads, seq, head_dim] with `seq` sharded
    on `ctx_axis` for q, k and v. Returns the same sharding. window_left
    (causal) slides a window across the ring — rotation stops after the
    window's last reachable chunk (see _ring_forward). With causal=False
    a (window_left, window_right) band gives bidirectional local
    attention over the ring (two-stream schedule, either side -1 =
    unbounded); causal ignores window_right (== the right-0 band)."""
    n_ring = mesh.shape[ctx_axis]
    spec = P(None, None, ctx_axis, None)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec, spec), out_specs=spec, check_vma=False,
    )
    def _fn(q, k, v):
        return _ring_forward(q, k, v, n_ring, ctx_axis, causal,
                             softmax_scale, window_left, window_right)[0]

    return jax.jit(_fn)


@functools.lru_cache(maxsize=None)
def _ring_grad_local(n_ring: int, ctx_axis: str, causal: bool,
                     softmax_scale: Optional[float], window_left: int = -1):
    """Per-shard differentiable ring attention on LOCAL [b, h, s/n, d]
    blocks (must be called inside a shard_map over `ctx_axis`).

    Forward is the rotating-KV schedule of ring_attention_prefill keeping
    the merged global LSE as a residual. The backward exploits the
    blockwise decomposition of the flash gradient: with the GLOBAL row
    LSE (and delta = rowsum(dO*O), which has no KV dependence), each
    visiting KV shard's (dQ_partial, dK_blk, dV_blk) is exactly the dense
    backward kernel evaluated on that block — one more ring pass, with
    dK/dV accumulators riding along their KV shards; after a full
    revolution every accumulator is home. dQ accumulates locally in fp32.
    No cross-chip softmax state beyond the forward's LSE.

    Cached per (ring size, axis, causal, scale) so the same custom-VJP
    function object serves both the standalone wrapper below and model
    integrations (sequence_parallel_loss_fn) without re-tracing.
    """
    from mfa_tpu.kernels.backward import flash_attention_bwd

    if not causal and window_left >= 0:
        raise NotImplementedError(
            "non-causal windowed ring attention is inference-only "
            "(ring_attention_prefill); the VJP ring schedule is causal")

    perm = [(i, (i + 1) % n_ring) for i in range(n_ring)]

    def _fwd_lse(q, k, v):
        return _ring_forward(q, k, v, n_ring, ctx_axis, causal,
                             softmax_scale, window_left)

    @jax.custom_vjp
    def f(q, k, v):
        return _fwd_lse(q, k, v)[0]

    def f_fwd(q, k, v):
        out, lse = _fwd_lse(q, k, v)
        return out, (q, k, v, out, lse)

    def f_bwd(res, do):
        q, k, v, out, lse = res
        my = jax.lax.axis_index(ctx_axis)
        lse_safe = jnp.where(jnp.isfinite(lse), lse, 0.0)
        chunk = q.shape[2]

        def partial_bwd(k_blk, v_blk, src, step):
            def pair(_):
                return flash_attention_bwd(
                    q, k_blk, v_blk, out, lse_safe, do, causal=True,
                    window_size=(window_left, -1),
                    kv_position_offset=step * chunk,
                    softmax_scale=softmax_scale)

            def full(_):
                return flash_attention_bwd(
                    q, k_blk, v_blk, out, lse_safe, do, causal=False,
                    softmax_scale=softmax_scale)

            def masked(_):
                return (jnp.zeros_like(q), jnp.zeros_like(k_blk),
                        jnp.zeros_like(v_blk))

            if not causal:
                return full(None)
            if step == 0:
                return pair(None)
            return jax.lax.cond(src < my, pair, masked, None)

        # dK/dV accumulate in fp32 while riding the ring (bf16 += would
        # lose low bits across n_ring partial sums)
        state = (k, v, jnp.zeros(k.shape, jnp.float32),
                 jnp.zeros(v.shape, jnp.float32))
        dq_acc = jnp.zeros(q.shape, jnp.float32)
        live = _ring_live_steps(n_ring, chunk, window_left)
        for step in range(live):
            if step:
                state = jax.tree.map(
                    lambda x: jax.lax.ppermute(x, ctx_axis, perm), state)
            k_blk, v_blk, dk_t, dv_t = state
            src = (my - step) % n_ring
            dq_i, dk_i, dv_i = partial_bwd(k_blk, v_blk, src, step)
            dq_acc = dq_acc + dq_i.astype(jnp.float32)
            state = (k_blk, v_blk, dk_t + dk_i.astype(jnp.float32),
                     dv_t + dv_i.astype(jnp.float32))
        # bring every accumulator home: after live-1 rotations shard `my`
        # holds the accumulator for shard my-(live-1); ONE permute by the
        # remaining live-1 hops (windowed early stop) — for a full
        # revolution this is the usual single closing hop.
        home = [(i, (i - (live - 1)) % n_ring) for i in range(n_ring)]
        state = jax.tree.map(
            lambda x: jax.lax.ppermute(x, ctx_axis, home), state)
        return (dq_acc.astype(q.dtype), state[2].astype(k.dtype),
                state[3].astype(v.dtype))

    f.defvjp(f_fwd, f_bwd)
    return f


def ring_attention_grad(
    mesh: Mesh,
    causal: bool = True,
    softmax_scale: Optional[float] = None,
    ctx_axis: str = CTX_AXIS,
    window_left: int = -1,
):
    """Differentiable ring attention on [batch, heads, seq, head_dim] with
    `seq` sharded on `ctx_axis` (context/sequence-parallel TRAINING) —
    the standalone shard_map wrapper over _ring_grad_local. window_left
    (causal only): sliding window across the ring, with rotation stopping
    at the window edge in BOTH passes."""
    inner = _ring_grad_local(mesh.shape[ctx_axis], ctx_axis, causal,
                             softmax_scale, window_left)
    spec = P(None, None, ctx_axis, None)
    return jax.jit(shard_map(
        inner, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    ))


def sequence_parallel_loss_fn(params, tokens, cfg, mesh: Mesh,
                              ctx_axis: str = CTX_AXIS):
    """Next-token cross entropy with ACTIVATIONS sequence-sharded on
    `ctx_axis` and attention running the differentiable ring schedule —
    long-context training where one chip cannot hold the sequence.

    Tokens arrive replicated (O(s) int32 — negligible); each shard embeds
    its own slice, runs every layer on [b, s/n, d] local activations
    (norms/MLP are pointwise over seq so they shard freely; RoPE gets
    absolute positions from the shard offset), and attention is the
    rotating-KV custom VJP (_ring_grad_local, GQA handled natively by the
    kernels). The next-token shift crosses shard boundaries, so targets
    slice the replicated tokens at offset+1 — no activation communication
    beyond the ring. Uniform layer stacks only (like the pipeline axis).
    Numerically equal to llama.loss_fn; jax.grad flows through the ring.
    """
    from mfa_tpu.models import llama

    n_ctx = mesh.shape[ctx_axis]
    batch, seq = tokens.shape
    # the model consumes tokens[:, :-1]; that length must shard evenly
    if (seq - 1) % n_ctx != 0:
        raise ValueError(f"seq-1 ({seq - 1}) must divide over {n_ctx} "
                         "context shards")
    if cfg.layer_pattern is not None or cfg.moe_hetero:
        raise ValueError("sequence-parallel training needs a uniform "
                         "layer stack")
    if cfg.attn_softcap or cfg.attn_sinks:
        # softcap/sinks are not wired through the ring VJP (sliding
        # windows ARE: each ring pair runs the kernel with a static
        # kv_position_offset, and rotation stops at the window edge)
        raise ValueError("sequence-parallel training supports causal "
                         "attention with an optional sliding window only "
                         "(no softcap / sinks)")
    chunk = (seq - 1) // n_ctx
    rope = (cfg.rope_theta, cfg.rope_scale, cfg.rope_scaling)
    ring = _ring_grad_local(n_ctx, ctx_axis, True, cfg.attn_scale,
                            cfg.window_left)

    def run(params, tokens):
        my = jax.lax.axis_index(ctx_axis)
        start = my * chunk
        inp = jax.lax.dynamic_slice(tokens, (0, start), (batch, chunk))
        tgt = jax.lax.dynamic_slice(tokens, (0, start + 1), (batch, chunk))
        x = llama._embed(params, inp, cfg)
        positions = start + jnp.arange(chunk, dtype=jnp.int32)[None]

        def layer(x, lp):
            h = llama._rms_norm(x, lp["attn_norm"], cfg)
            q, k, v = llama._qkv(h, lp, cfg, batch, chunk)
            q = llama._rope(q, positions, *rope)
            k = llama._rope(k, positions, *rope)
            attn = jnp.swapaxes(
                ring(jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                     jnp.swapaxes(v, 1, 2)), 1, 2)
            x = llama._attn_residual(
                x, attn.reshape(batch, chunk, cfg.n_heads * cfg.head_dim),
                lp, cfg)
            x = llama._mlp(x, lp, cfg)
            return x, ()

        x, _ = jax.lax.scan(layer, x, params["layers"])
        x = llama._rms_norm(x, params["final_norm"], cfg)
        logits = llama._unembed(params, x, cfg)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)
        total = jax.lax.psum(nll.sum(), ctx_axis)
        return total / (batch * (seq - 1))

    fn = shard_map(run, mesh=mesh, in_specs=(P(), P()), out_specs=P(),
                   check_vma=False)
    return fn(params, tokens)
