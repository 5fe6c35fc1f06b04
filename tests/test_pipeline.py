"""Pipeline parallelism (GPipe over the "pipe" axis) vs unsharded oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.models import llama
from mfa_tpu.shard.mesh import make_mesh
from mfa_tpu.shard.pipeline import (
    PIPE_AXIS,
    pipeline_loss_fn,
    pipeline_train_step,
)

CFG = llama.LlamaConfig.tiny(vocab=64, dim=64, layers=4, heads=4,
                             kv_heads=2, ffn=128, dtype=jnp.float32)


@pytest.fixture(scope="module")
def setup():
    params = llama.init_params(jax.random.key(0), CFG)
    tokens = jax.random.randint(jax.random.key(1), (8, 24), 0, CFG.vocab_size)
    return params, tokens


def test_pipeline_loss_matches_unsharded(setup):
    params, tokens = setup
    mesh = make_mesh({PIPE_AXIS: 4})
    want = llama.loss_fn(params, tokens, CFG)
    got = pipeline_loss_fn(params, tokens, CFG, mesh, n_micro=4)
    assert abs(float(got) - float(want)) < 1e-5, (got, want)
    # more microbatches than stages (deeper schedule, same value)
    got8 = pipeline_loss_fn(params, tokens, CFG, mesh, n_micro=8)
    assert abs(float(got8) - float(want)) < 1e-5


def test_pipeline_sliding_window_matches_unsharded():
    """Regression: uniform sliding-window models (Mistral-style) must carry
    the window through the pipeline stages, not silently run full causal."""
    cfg = llama.LlamaConfig.tiny(vocab=64, dim=64, layers=4, heads=4,
                                 kv_heads=2, ffn=128, dtype=jnp.float32,
                                 sliding_window=8)
    params = llama.init_params(jax.random.key(2), cfg)
    tokens = jax.random.randint(jax.random.key(3), (4, 24), 0, cfg.vocab_size)
    mesh = make_mesh({PIPE_AXIS: 4})
    want = llama.loss_fn(params, tokens, cfg)
    got = pipeline_loss_fn(params, tokens, cfg, mesh, n_micro=4)
    assert abs(float(got) - float(want)) < 1e-5, (got, want)


def test_pipeline_grads_match_unsharded(setup):
    """jax.grad through the scan+ppermute schedule == dense grads: the
    backward pipeline (reverse-flowing ppermute transpose) is exact."""
    params, tokens = setup
    mesh = make_mesh({PIPE_AXIS: 4})
    g_want = jax.grad(llama.loss_fn)(params, tokens, CFG)
    g_got = jax.grad(pipeline_loss_fn)(params, tokens, CFG, mesh, 4)
    flat_w, _ = jax.tree.flatten(g_want)
    flat_g, _ = jax.tree.flatten(g_got)
    for a, b in zip(flat_g, flat_w):
        diff = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert diff < 2e-5, diff


def test_pipeline_train_step(setup):
    params, tokens = setup
    mesh = make_mesh({PIPE_AXIS: 2})
    p1, loss = pipeline_train_step(params, tokens, CFG, mesh, 4)
    assert np.isfinite(float(loss))
    # params actually moved
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        p1, params)
    assert max(jax.tree.leaves(moved)) > 0


def test_pipeline_rejects_bad_shapes(setup):
    params, tokens = setup
    mesh = make_mesh({PIPE_AXIS: 3})
    with pytest.raises(ValueError):
        pipeline_loss_fn(params, tokens, CFG, mesh, 4)  # 4 layers / 3 stages
    mesh4 = make_mesh({PIPE_AXIS: 4})
    with pytest.raises(ValueError):
        pipeline_loss_fn(params, tokens, CFG, mesh4, 3)  # 8 % 3 != 0
