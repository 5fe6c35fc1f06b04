"""Multi-device sharding tests on the 8-device virtual CPU mesh.

The reference has no distributed layer (SURVEY.md §2.8); these validate the
TPU-native scaling story: TP over heads, DP over batch, CP over KV length
with the cross-chip LSE combine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.kernels.quant import quantize_rows
from mfa_tpu.ref.oracle import attention_ref, decode_ref, paged_decode_ref
from mfa_tpu.shard.attention import (
    context_parallel_decode,
    sharded_flash_attn,
    sharded_paged_decode,
)
from mfa_tpu.shard.mesh import make_mesh
from tests.utils import assert_close


def test_mesh_construction():
    mesh = make_mesh({"data": 2, "model": 4})
    assert mesh.shape == {"data": 2, "model": 4}


def test_sharded_prefill_tp_dp():
    mesh = make_mesh({"data": 2, "model": 4})
    f = sharded_flash_attn(mesh, causal=True)
    key = jax.random.key(0)
    q = jax.random.normal(key, (4, 256, 8, 64))  # batch 4 over data=2, heads 8 over model=4
    k = jax.random.normal(jax.random.key(1), (4, 256, 4, 64))  # 4 kv heads over model=4
    v = jax.random.normal(jax.random.key(2), (4, 256, 4, 64))
    out = f(q, k, v)
    ref = attention_ref(q, k, v, causal=True)
    assert_close(out, ref, msg="sharded prefill")


def test_sharded_paged_decode_tp():
    mesh = make_mesh({"data": 2, "model": 4})
    f = sharded_paged_decode(mesh)
    batch, heads, kvh, d, page, pps = 4, 8, 4, 64, 16, 4
    key = jax.random.key(3)
    num_pages = batch * pps + 2
    q = jax.random.normal(key, (batch, heads, d))
    kp = jax.random.normal(jax.random.key(4), (kvh, num_pages, page, d))
    vp = jax.random.normal(jax.random.key(5), (kvh, num_pages, page, d))
    table = jax.random.permutation(jax.random.key(6), num_pages)[
        : batch * pps
    ].reshape(batch, pps).astype(jnp.int32)
    lens = jnp.asarray([64, 30, 17, 50], jnp.int32)
    out = f(q, kp, vp, lens, table)
    ref = paged_decode_ref(
        q[:, None], jnp.transpose(kp, (1, 2, 0, 3)), jnp.transpose(vp, (1, 2, 0, 3)),
        lens, table,
    )[:, 0]
    assert_close(out, ref, msg="sharded paged decode")


def test_sharded_paged_decode_quantized():
    mesh = make_mesh({"data": 1, "model": 2})
    f = sharded_paged_decode(mesh, quantized=True)
    batch, heads, kvh, d, page, pps = 2, 4, 2, 64, 16, 2
    q = jax.random.normal(jax.random.key(7), (batch, heads, d), jnp.bfloat16)
    kp = jax.random.normal(jax.random.key(8), (kvh, 8, page, d))
    vp = jax.random.normal(jax.random.key(9), (kvh, 8, page, d))
    kq, ks = quantize_rows(kp, "int8")
    vq, vs = quantize_rows(vp, "int8")
    table = jnp.arange(batch * pps, dtype=jnp.int32).reshape(batch, pps)
    lens = jnp.asarray([32, 20], jnp.int32)
    out = f(q, kq, vq, lens, table, ks, vs)
    ref = paged_decode_ref(
        q[:, None].astype(jnp.float32),
        jnp.transpose(kp, (1, 2, 0, 3)), jnp.transpose(vp, (1, 2, 0, 3)),
        lens, table,
    )[:, 0]
    assert_close(out, ref, tol=0.06, msg="sharded quant paged decode")


@pytest.mark.parametrize("ctx", [2, 8])
def test_context_parallel_decode(ctx):
    mesh = make_mesh({"ctx": ctx})
    f = context_parallel_decode(mesh)
    batch, heads, kvh, d, max_s = 2, 4, 2, 64, 512
    q = jax.random.normal(jax.random.key(10), (batch, heads, d))
    k = jax.random.normal(jax.random.key(11), (batch, kvh, max_s, d))
    v = jax.random.normal(jax.random.key(12), (batch, kvh, max_s, d))
    lens = jnp.asarray([512, 100], jnp.int32)  # seq 2 lives entirely on shard 0/1
    out = f(q, k, v, lens)
    ref = decode_ref(
        q[:, None], jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2), lens
    )[:, 0]
    assert_close(out, ref, tol=1e-4, msg=f"cp decode ctx={ctx}")


def test_context_parallel_matches_single_device():
    # CP result must equal the single-chip kernel bit-for-bit-ish
    from mfa_tpu.kernels.decode import decode_attention

    mesh = make_mesh({"ctx": 4})
    f = context_parallel_decode(mesh)
    q = jax.random.normal(jax.random.key(13), (1, 2, 64))
    k = jax.random.normal(jax.random.key(14), (1, 2, 256, 64))
    v = jax.random.normal(jax.random.key(15), (1, 2, 256, 64))
    lens = jnp.asarray([256], jnp.int32)
    out_cp = f(q, k, v, lens)
    out_1 = decode_attention(q, k, v, lens)
    np.testing.assert_allclose(
        np.asarray(out_cp), np.asarray(out_1), atol=2e-5, rtol=0
    )


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_prefill(causal):
    from mfa_tpu.shard.ring import ring_attention_prefill

    mesh = make_mesh({"ctx": 4})
    f = ring_attention_prefill(mesh, causal=causal)
    b, h, s, d = 1, 2, 512, 64  # s sharded 4-way -> 128 per chip
    q = jax.random.normal(jax.random.key(20), (b, h, s, d))
    k = jax.random.normal(jax.random.key(21), (b, h, s, d))
    v = jax.random.normal(jax.random.key(22), (b, h, s, d))
    out = f(q, k, v)
    ref = attention_ref(
        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
        causal=causal,
    )
    assert_close(out, jnp.swapaxes(ref, 1, 2), tol=1e-4,
                 msg=f"ring causal={causal}")


def test_context_parallel_paged_decode_matches_single_pool():
    """Page pool sharded over the ctx axis: per-shard paged decode + LSE
    combine must equal decode over one merged pool — the 'KV cache larger
    than one chip' serving path."""
    from mfa_tpu.kernels.paged import paged_attention
    from mfa_tpu.shard.attention import context_parallel_paged_decode
    from mfa_tpu.shard.mesh import make_mesh

    n_shards, batch, hkv, group, d = 4, 2, 2, 2, 64
    heads = hkv * group
    page, pps_shard = 64, 2  # each shard holds up to 2 pages per sequence
    pool_per_shard = batch * pps_shard + 1

    key = jax.random.key(0)
    q = jax.random.normal(key, (batch, heads, d), jnp.float32)
    # independent pool per shard (sharded leading pool axis)
    k_pages = jax.random.normal(
        jax.random.key(1), (hkv, n_shards * pool_per_shard, page, d))
    v_pages = jax.random.normal(
        jax.random.key(2), (hkv, n_shards * pool_per_shard, page, d))
    # each sequence: shard s holds tokens [s*128, s*128+local_len_s)
    local_lens = np.zeros((n_shards, batch), np.int32)
    local_tables = np.zeros((n_shards, batch, pps_shard), np.int32)
    for s in range(n_shards):
        for b in range(batch):
            local_lens[s, b] = [128, 100][b] if s < 3 else [64, 0][b]
            for pi in range(pps_shard):
                # shard-local page ids (1-based within the shard's pool)
                local_tables[s, b, pi] = 1 + b * pps_shard + pi

    mesh = make_mesh({"ctx": n_shards}, jax.devices()[:n_shards])
    f = context_parallel_paged_decode(mesh)
    out = f(q, k_pages, v_pages, jnp.asarray(local_lens),
            jnp.asarray(local_tables))

    # oracle: merge every shard's valid tokens into one contiguous cache
    ref_k = np.zeros((batch, 1024, hkv, d), np.float32)
    ref_v = np.zeros((batch, 1024, hkv, d), np.float32)
    total = np.zeros((batch,), np.int32)
    kp_np = np.asarray(k_pages)
    vp_np = np.asarray(v_pages)
    for b in range(batch):
        for s in range(n_shards):
            ln = int(local_lens[s, b])
            off = 0
            while off < ln:
                pg = int(local_tables[s, b, off // page])
                take = min(page, ln - off)
                src = s * pool_per_shard + pg
                ref_k[b, total[b]:total[b] + take] = np.transpose(
                    kp_np[:, src, :take], (1, 0, 2))
                ref_v[b, total[b]:total[b] + take] = np.transpose(
                    vp_np[:, src, :take], (1, 0, 2))
                total[b] += take
                off += take
    from mfa_tpu.ref.oracle import decode_ref

    ref = decode_ref(q[:, None], jnp.asarray(ref_k), jnp.asarray(ref_v),
                     jnp.asarray(total))[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_grad(causal):
    """Differentiable ring attention: jax.grad through the rotating-KV
    custom VJP == dense flash grads (the global-LSE blockwise backward
    decomposition, with dK/dV accumulators riding the ring home)."""
    from mfa_tpu.kernels.autodiff import flash_attention_grad
    from mfa_tpu.shard.ring import ring_attention_grad

    mesh = make_mesh({"ctx": 4})
    f = ring_attention_grad(mesh, causal=causal)
    b, h, s, d = 1, 2, 256, 64  # s sharded 4-way -> 64 per chip
    q = jax.random.normal(jax.random.key(30), (b, h, s, d))
    k = jax.random.normal(jax.random.key(31), (b, h, s, d))
    v = jax.random.normal(jax.random.key(32), (b, h, s, d))
    w = jax.random.normal(jax.random.key(33), (b, h, s, d))

    g_ring = jax.grad(lambda q, k, v: (f(q, k, v) * w).sum(),
                      argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(
        lambda q, k, v: (flash_attention_grad(q, k, v, causal) * w).sum(),
        argnums=(0, 1, 2))(q, k, v)
    for a, r, name in zip(g_ring, g_ref, ["dq", "dk", "dv"]):
        diff = np.abs(np.asarray(a) - np.asarray(r)).max()
        assert diff < 2e-3, f"{name} diff {diff} (causal={causal})"


def test_sequence_parallel_loss_and_grads():
    """Model-level SP training: sequence-sharded activations + ring
    attention per layer == unsharded loss_fn, value and grads."""
    from mfa_tpu.models import llama
    from mfa_tpu.shard.ring import sequence_parallel_loss_fn

    cfg = llama.LlamaConfig.tiny(vocab=64, dim=64, layers=2, heads=4,
                                 kv_heads=2, ffn=128, dtype=jnp.float32)
    params = llama.init_params(jax.random.key(0), cfg)
    tokens = jax.random.randint(jax.random.key(1), (2, 33), 0,
                                cfg.vocab_size)  # 32 positions / 4 shards
    mesh = make_mesh({"ctx": 4})

    want = llama.loss_fn(params, tokens, cfg)
    got = sequence_parallel_loss_fn(params, tokens, cfg, mesh)
    assert abs(float(got) - float(want)) < 1e-5, (got, want)

    g_want = jax.grad(llama.loss_fn)(params, tokens, cfg)
    g_got = jax.grad(sequence_parallel_loss_fn)(params, tokens, cfg, mesh)
    for a, b in zip(jax.tree.leaves(g_got), jax.tree.leaves(g_want)):
        diff = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert diff < 5e-5, diff


def test_sequence_parallel_rejects_unsupported_attention():
    """Softcap/sink configs must be refused loudly, not silently trained
    without them (sliding windows ARE supported — see the windowed tests)."""
    import pytest

    from mfa_tpu.models import llama
    from mfa_tpu.shard.ring import sequence_parallel_loss_fn

    mesh = make_mesh({"ctx": 4})
    tokens = jnp.zeros((1, 33), jnp.int32)
    for kw in ({"attn_softcap": 30.0}, {"attn_sinks": 4}):
        cfg = llama.LlamaConfig.tiny(vocab=64, dim=64, layers=2, heads=4,
                                     kv_heads=2, ffn=128,
                                     dtype=jnp.float32, **kw)
        params = llama.init_params(jax.random.key(0), cfg)
        with pytest.raises(ValueError, match="causal"):
            sequence_parallel_loss_fn(params, tokens, cfg, mesh)


@pytest.mark.parametrize("wl", [10, 40, 100])
def test_ring_prefill_sliding_window(wl):
    """Windowed ring attention: each pair runs the kernel with a static
    kv_position_offset and rotation stops at the window edge — must equal
    dense windowed causal attention."""
    from mfa_tpu.kernels.autodiff import flash_attention_grad
    from mfa_tpu.shard.ring import ring_attention_prefill

    mesh = make_mesh({"ctx": 4})
    b, h, s, d = 1, 2, 128, 64  # chunk 32
    q = jax.random.normal(jax.random.key(0), (b, h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (b, h, s, d), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (b, h, s, d), jnp.float32)
    got = ring_attention_prefill(mesh, causal=True, window_left=wl)(q, k, v)
    want = flash_attention_grad(q, k, v, True, window_size=(wl, -1))
    diff = np.abs(np.asarray(got) - np.asarray(want)).max()
    assert diff < 2e-5, f"wl={wl}: {diff}"


@pytest.mark.parametrize("wl,wr", [
    (10, 20),     # narrow band inside one chunk hop each way
    (40, 10),     # asymmetric, left spans 2 hops
    (-1, 20),     # unbounded left, bounded right
    (40, -1),     # bounded left, unbounded right
    (100, 100),   # band spans the whole ring both ways
])
def test_ring_prefill_noncausal_band(wl, wr):
    """Non-causal bidirectional local attention over the ring: the
    two-stream banded schedule (behind chunks rotate forward, ahead
    chunks rotate backward, ahead pairs computed mirrored) must equal the
    single-device non-causal windowed kernel."""
    from mfa_tpu.kernels.prefill import prefill_attention
    from mfa_tpu.shard.ring import ring_attention_prefill

    mesh = make_mesh({"ctx": 4})
    b, h, s, d = 1, 2, 128, 64  # chunk 32
    q = jax.random.normal(jax.random.key(7), (b, h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.key(8), (b, h, s, d), jnp.float32)
    v = jax.random.normal(jax.random.key(9), (b, h, s, d), jnp.float32)
    got = ring_attention_prefill(mesh, causal=False, window_left=wl,
                                 window_right=wr)(q, k, v)
    want = prefill_attention(q, k, v, causal=False, window_size=(wl, wr))
    diff = np.abs(np.asarray(got) - np.asarray(want)).max()
    assert diff < 2e-5, f"wl={wl} wr={wr}: {diff}"


def test_ring_grad_sliding_window():
    """Windowed ring VJP (early-stopped rotation + direct homing permute)
    == dense flash VJP grads."""
    from mfa_tpu.kernels.autodiff import flash_attention_grad
    from mfa_tpu.shard.ring import ring_attention_grad

    mesh = make_mesh({"ctx": 4})
    b, h, s, d, wl = 1, 2, 128, 64, 40
    q = jax.random.normal(jax.random.key(3), (b, h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.key(4), (b, h, s, d), jnp.float32)
    v = jax.random.normal(jax.random.key(5), (b, h, s, d), jnp.float32)
    w = jax.random.normal(jax.random.key(6), (b, h, s, d), jnp.float32)
    ring = ring_attention_grad(mesh, causal=True, window_left=wl)
    g_ring = jax.grad(lambda q, k, v: (ring(q, k, v) * w).sum(),
                      argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(
        lambda q, k, v: (flash_attention_grad(
            q, k, v, True, window_size=(wl, -1)) * w).sum(),
        argnums=(0, 1, 2))(q, k, v)
    for a, r, name in zip(g_ring, g_ref, ["dq", "dk", "dv"]):
        diff = np.abs(np.asarray(a) - np.asarray(r)).max()
        assert diff < 2e-3, f"{name} diff {diff}"


def test_sequence_parallel_sliding_window_model():
    """SP training of a Mistral-style sliding-window model == unsharded
    loss_fn, value and grads."""
    from mfa_tpu.models import llama
    from mfa_tpu.shard.ring import sequence_parallel_loss_fn

    cfg = llama.LlamaConfig.tiny(vocab=64, dim=64, layers=2, heads=4,
                                 kv_heads=2, ffn=128, dtype=jnp.float32,
                                 sliding_window=12)
    params = llama.init_params(jax.random.key(7), cfg)
    tokens = jax.random.randint(jax.random.key(8), (2, 33), 0,
                                cfg.vocab_size)
    mesh = make_mesh({"ctx": 4})
    want = llama.loss_fn(params, tokens, cfg)
    got = sequence_parallel_loss_fn(params, tokens, cfg, mesh)
    assert abs(float(got) - float(want)) < 1e-5, (got, want)
    g_want = jax.grad(llama.loss_fn)(params, tokens, cfg)
    g_got = jax.grad(sequence_parallel_loss_fn)(params, tokens, cfg, mesh)
    for a, b in zip(jax.tree.leaves(g_got), jax.tree.leaves(g_want)):
        diff = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert diff < 5e-5, diff
