"""Image-block (bidirectional-run) flash prefill vs dense oracle.

The kernel under test (kernels/blockmask.py) serves Gemma3 multimodal
prompts: visible = (causal AND window) OR same-image-run — the
transformers token_type_ids or-mask, previously handled only by the dense
O(s^2) path (llama._attention_dense_masked)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.kernels.blockmask import image_block_prefill, image_run_bounds


def _oracle(q, k, v, bids, wl, scale):
    b, h, s, d = q.shape
    g = h // k.shape[1]
    kf = jnp.repeat(k.astype(jnp.float32), g, 1)
    vf = jnp.repeat(v.astype(jnp.float32), g, 1)
    sc = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), kf) * scale
    row = jnp.arange(s)[:, None]
    col = jnp.arange(s)[None, :]
    vis = col <= row
    if wl >= 0:
        vis = vis & (col >= row - wl)
    same = (bids[:, :, None] == bids[:, None, :]) & (bids[:, :, None] >= 0)
    vis = vis[None] | same
    sc = jnp.where(vis[:, None], sc, -jnp.inf)
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(sc, -1), vf)


def _bids(b, s, runs, shift_batch1=True):
    out = -np.ones((b, s), np.int32)
    for gi, (a, z) in enumerate(runs):
        out[0, a:z + 1] = gi
        if b > 1 and shift_batch1 and gi == 0:
            out[1, a + 2:max(z - 1, a + 2)] = gi  # different layout per row
    return jnp.asarray(out)


@pytest.mark.parametrize(
    "s,runs,wl",
    [
        (40, [(5, 9), (20, 27)], -1),  # runs inside one tile
        (300, [(10, 80), (150, 280)], -1),  # run crossing tile boundary
        (300, [(10, 80), (150, 280)], 32),  # + sliding window
        (129, [(0, 3)], 16),  # run at position 0, ragged tail
        (64, [], -1),  # no images = pure causal
        (520, [(100, 355)], 64),  # long run spanning 3 kv tiles
    ],
)
def test_image_block_prefill_matches_oracle(s, runs, wl):
    b, h, hk, d = 2, 4, 2, 64
    q = jax.random.normal(jax.random.key(1), (b, h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.key(2), (b, hk, s, d), jnp.float32)
    v = jax.random.normal(jax.random.key(3), (b, hk, s, d), jnp.float32)
    bids = _bids(b, s, runs)
    out = image_block_prefill(q, k, v, bids, window_left=wl,
                              block_q=128, block_k=128)
    ref = _oracle(q, k, v, bids, wl, d ** -0.5)
    diff = float(jnp.max(jnp.abs(out - ref)))
    assert diff < 2e-5, f"s={s} runs={runs} wl={wl}: {diff}"


def test_image_block_prefill_bf16():
    b, h, s, d = 1, 2, 256, 128
    q = jax.random.normal(jax.random.key(4), (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(5), (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(6), (b, h, s, d), jnp.bfloat16)
    bids = _bids(b, s, [(30, 120)])
    out = image_block_prefill(q, k, v, bids, block_q=128, block_k=128)
    ref = _oracle(q, k, v, bids, -1, d ** -0.5)
    diff = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    assert diff < 2e-2, diff


def test_image_run_bounds():
    bids = jnp.asarray([[-1, -1, 0, 0, 0, -1, 1, 1, -1, -1]])
    rs, re = image_run_bounds(bids)
    np.testing.assert_array_equal(
        np.asarray(rs)[0], [0, 1, 2, 2, 2, 5, 6, 6, 8, 9])
    np.testing.assert_array_equal(
        np.asarray(re)[0], [0, 1, 4, 4, 4, 5, 7, 7, 8, 9])


def test_model_blockmask_matches_dense_path():
    """The model-level flash route (llama._attention_blockmask) must equal
    the retained dense reference (llama._attention_dense_masked) given the
    same tokens — pins the production path to the documented oracle."""
    from mfa_tpu.models import llama
    from mfa_tpu.models.vision import (
        image_bidir_mask,
        image_block_ids_from_tokens,
    )

    cfg = llama.LlamaConfig.tiny(dim=64, heads=4, kv_heads=2)
    b, s, d = 2, 40, 16  # head_dim = 64/4
    IMG = 7
    toks = np.full((b, s), 3, np.int32)
    toks[0, 5:13] = IMG
    toks[1, 20:28] = IMG
    toks = jnp.asarray(toks)
    q = jax.random.normal(jax.random.key(0), (b, s, 4, d), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (b, s, 2, d), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (b, s, 2, d), jnp.float32)
    bids = image_block_ids_from_tokens(toks, IMG)
    mask = image_bidir_mask(toks, IMG)
    got = llama._attention_blockmask(q, k, v, cfg, -1, bids)
    want = llama._attention_dense_masked(q, k, v, cfg, -1, mask)
    diff = float(jnp.max(jnp.abs(got - want)))
    assert diff < 2e-5, diff


def test_model_blockmask_tp_sharded_matches_unsharded():
    """The TP branch (shard_map over heads, replicated ids) must equal the
    single-device path."""
    from mfa_tpu.models import llama
    from mfa_tpu.shard.mesh import make_mesh

    cfg = llama.LlamaConfig.tiny(dim=256, heads=4, kv_heads=2)
    b, s, d = 2, 40, 64
    toks = np.full((b, s), 3, np.int32)
    toks[0, 5:13] = 7
    toks[1, 20:28] = 7
    from mfa_tpu.models.vision import image_block_ids_from_tokens

    bids = image_block_ids_from_tokens(jnp.asarray(toks), 7)
    q = jax.random.normal(jax.random.key(0), (b, s, 4, d), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (b, s, 2, d), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (b, s, 2, d), jnp.float32)
    mesh = make_mesh({"model": 2})
    got = llama._attention_blockmask(q, k, v, cfg, -1, bids, mesh)
    want = llama._attention_blockmask(q, k, v, cfg, -1, bids)
    diff = float(jnp.max(jnp.abs(got - want)))
    assert diff < 2e-5, diff


def test_image_block_prefill_prunes_above_run():
    """KV blocks above every row's run_end must never be touched: poison
    the upper-triangle far region with NaN K/V and check the output is
    still finite (the scalar-prefetched kv_last bound prunes them)."""
    b, h, s, d = 1, 2, 512, 64
    q = jax.random.normal(jax.random.key(7), (b, h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.key(8), (b, h, s, d), jnp.float32)
    v = jax.random.normal(jax.random.key(9), (b, h, s, d), jnp.float32)
    # image run 100..140 (inside block 1); rows < 256 never need block 3
    k = k.at[:, :, 384:].set(jnp.nan)
    v = v.at[:, :, 384:].set(jnp.nan)
    bids = _bids(b, s, [(100, 140)], shift_batch1=False)
    out = image_block_prefill(q, k, v, bids, block_q=128, block_k=128)
    assert bool(jnp.isfinite(out[:, :, :256]).all())
