"""Expert-parallel MoE (shard_map over the 'expert' axis) vs dense oracle.

Runs on the 8-device virtual CPU mesh (tests/conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.models import llama
from mfa_tpu.shard.expert import expert_parallel_moe
from mfa_tpu.shard.mesh import make_mesh


def _dense_oracle(t, w_router, weg, weu, wed, k, norm_topk, act):
    """Per-token dense evaluation of the top-k routed expert MLP."""
    logits = t.astype(jnp.float32) @ w_router
    w_top, idx = jax.lax.top_k(logits, k)
    if norm_topk:
        w_top = jax.nn.softmax(w_top, axis=-1)
    else:
        full = jax.nn.softmax(logits, axis=-1)
        w_top = jnp.take_along_axis(full, idx, axis=-1)
    outs = []
    for ti in range(t.shape[0]):
        acc = jnp.zeros((t.shape[1],), jnp.float32)
        for kk in range(k):
            e = int(idx[ti, kk])
            g = t[ti] @ weg[e]
            g = (jax.nn.gelu(g, approximate=True) if act == "gelu_tanh"
                 else jax.nn.silu(g))
            o = (g * (t[ti] @ weu[e])) @ wed[e]
            acc = acc + w_top[ti, kk] * o.astype(jnp.float32)
        outs.append(acc)
    return jnp.stack(outs)


@pytest.mark.parametrize("axes,norm_topk", [
    ({"expert": 4}, True),
    ({"expert": 8}, False),
    ({"expert": 4, "model": 2}, True),
])
def test_expert_parallel_matches_dense(axes, norm_topk):
    E, d, f, T, k = 8, 64, 96, 24, 2
    ks = jax.random.split(jax.random.key(0), 5)
    t = jax.random.normal(ks[0], (T, d), jnp.float32)
    w_router = jax.random.normal(ks[1], (d, E), jnp.float32) * 0.2
    weg = jax.random.normal(ks[2], (E, d, f), jnp.float32) * 0.1
    weu = jax.random.normal(ks[3], (E, d, f), jnp.float32) * 0.1
    wed = jax.random.normal(ks[4], (E, f, d), jnp.float32) * 0.1

    cfg = llama.LlamaConfig.tiny()
    cfg = type(cfg)(**{**cfg.__dict__, "n_experts": E,
                       "n_active_experts": k, "norm_topk": norm_topk})

    mesh = make_mesh(axes)
    got = jax.jit(expert_parallel_moe(mesh, cfg))(
        t, w_router, weg, weu, wed)
    want = _dense_oracle(t, w_router, weg, weu, wed, k, norm_topk,
                         cfg.hidden_act)
    diff = np.abs(np.asarray(got, jnp.float32) - np.asarray(want)).max()
    assert diff < 1e-4, f"EP {axes} diff {diff}"


def test_expert_parallel_matches_unsharded_moe():
    """EP through the model layer (_moe with mesh) == unsharded _moe."""
    E, d, f, T = 4, 64, 80, 12
    cfg = llama.LlamaConfig.tiny(dim=d, layers=1)
    cfg = type(cfg)(**{**cfg.__dict__, "n_experts": E, "n_active_experts": 2,
                       "moe_ffn_dim": f})
    params = llama.init_params(jax.random.key(1), cfg)
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    x = jax.random.normal(jax.random.key(2), (2, T // 2, d), cfg.dtype)

    want = llama._moe(x, lp, cfg)
    mesh = make_mesh({"expert": 4})
    got = llama._moe(x, lp, cfg, mesh=mesh)
    diff = np.abs(np.asarray(got, jnp.float32)
                  - np.asarray(want, jnp.float32)).max()
    assert diff < 2e-2, f"EP model-layer diff {diff}"  # bf16 params


@pytest.mark.parametrize("axes,norm_topk", [
    ({"expert": 4}, True),
    ({"expert": 8}, False),
    ({"expert": 4, "model": 2}, True),
])
def test_expert_parallel_a2a_matches_dense(axes, norm_topk):
    """Training-shaped EP (all_to_all dispatch/combine, tokens sharded on
    the expert axis) must match the dense oracle with ample capacity."""
    from mfa_tpu.shard.expert import expert_parallel_moe_a2a

    E, d, f, T, k = 8, 64, 96, 32, 2
    ks = jax.random.split(jax.random.key(3), 5)
    t = jax.random.normal(ks[0], (T, d), jnp.float32)
    w_router = jax.random.normal(ks[1], (d, E), jnp.float32) * 0.2
    weg = jax.random.normal(ks[2], (E, d, f), jnp.float32) * 0.1
    weu = jax.random.normal(ks[3], (E, d, f), jnp.float32) * 0.1
    wed = jax.random.normal(ks[4], (E, f, d), jnp.float32) * 0.1

    cfg = llama.LlamaConfig.tiny()
    cfg = type(cfg)(**{**cfg.__dict__, "n_experts": E,
                       "n_active_experts": k, "norm_topk": norm_topk})
    mesh = make_mesh(axes)
    # worst-case-skew capacity: all local assignments to one shard
    got = jax.jit(expert_parallel_moe_a2a(mesh, cfg,
                                          capacity_factor=float(axes["expert"])))(
        t, w_router, weg, weu, wed)
    want = _dense_oracle(t, w_router, weg, weu, wed, k, norm_topk,
                         cfg.hidden_act)
    diff = np.abs(np.asarray(got, jnp.float32) - np.asarray(want)).max()
    assert diff < 1e-4, f"EP a2a {axes} diff {diff}"


def test_expert_parallel_a2a_differentiable():
    """The a2a path is the training path: grads must flow through
    dispatch, grouped matmuls, and combine, and match the dense oracle's
    grads (ample capacity, fp32)."""
    from mfa_tpu.shard.expert import expert_parallel_moe_a2a

    E, d, f, T, k = 4, 32, 48, 16, 2
    ks = jax.random.split(jax.random.key(9), 5)
    t = jax.random.normal(ks[0], (T, d), jnp.float32)
    w_router = jax.random.normal(ks[1], (d, E), jnp.float32) * 0.2
    weg = jax.random.normal(ks[2], (E, d, f), jnp.float32) * 0.1
    weu = jax.random.normal(ks[3], (E, d, f), jnp.float32) * 0.1
    wed = jax.random.normal(ks[4], (E, f, d), jnp.float32) * 0.1
    cfg = llama.LlamaConfig.tiny()
    cfg = type(cfg)(**{**cfg.__dict__, "n_experts": E,
                       "n_active_experts": k, "norm_topk": True})
    mesh = make_mesh({"expert": 4})
    ep_fn = expert_parallel_moe_a2a(mesh, cfg, capacity_factor=4.0)

    def loss_ep(weg, weu, wed):
        return jnp.sum(ep_fn(t, w_router, weg, weu, wed) ** 2)

    def loss_dense(weg, weu, wed):
        out = _dense_oracle(t, w_router, weg, weu, wed, k, True,
                            cfg.hidden_act)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_ep = jax.grad(loss_ep, argnums=(0, 1, 2))(weg, weu, wed)
    g_dn = jax.grad(loss_dense, argnums=(0, 1, 2))(weg, weu, wed)
    for a, b, name in zip(g_ep, g_dn, ("we_gate", "we_up", "we_down")):
        diff = np.abs(np.asarray(a) - np.asarray(b)).max()
        scale = max(1e-3, float(np.abs(np.asarray(b)).max()))
        assert diff / scale < 1e-4, f"a2a grad {name} rel diff {diff/scale}"
