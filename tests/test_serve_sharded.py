"""Tensor-parallel serving: sharded engine matches unsharded token-for-token.

The reference has no distributed layer (SURVEY.md §2.8); this is the
TPU-native scale-out path — params TP-sharded (llama.param_shardings),
paged KV caches sharded by kv head (llama.cache_shardings), decode
attention in a zero-communication shard_map. Runs on the 8-device virtual
CPU mesh from conftest.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.models import llama
from mfa_tpu.serve.engine import Engine
from mfa_tpu.shard.mesh import MODEL_AXIS, make_mesh

PROMPTS = [[1, 2, 3, 4, 5], [9, 8, 7], [11] * 12]


def _cfg(dtype=jnp.float32):
    return llama.LlamaConfig.tiny(
        vocab=128, dim=64, layers=2, heads=8, kv_heads=4, ffn=96, dtype=dtype
    )


def _run(params, cfg, mesh=None, quant=None):
    eng = Engine(
        params, cfg, num_pages=48, page_size=16, max_seqs=4,
        pages_per_seq=8, quant_dtype=quant, mesh=mesh,
    )
    reqs = [eng.submit(p, 4) for p in PROMPTS]
    eng.run()
    return [r.generated for r in reqs], eng


def test_sharded_engine_matches_unsharded():
    cfg = _cfg()
    params = llama.init_params(jax.random.key(0), cfg)
    gen_ref, _ = _run(params, cfg, mesh=None)
    mesh = make_mesh({MODEL_AXIS: 4}, jax.devices()[:4])
    gen_tp, eng = _run(params, cfg, mesh=mesh)
    assert gen_tp == gen_ref, f"TP generations diverge: {gen_tp} vs {gen_ref}"
    # cache actually lives sharded on the mesh (kv heads lead the
    # merged [hkv, layers*pages, ...] pool)
    shard = eng.cache.k_pages.sharding
    assert shard.spec[0] == MODEL_AXIS


def test_sharded_engine_quantized_runs():
    cfg = _cfg(jnp.float32)
    params = llama.init_params(jax.random.key(1), cfg)
    mesh = make_mesh({MODEL_AXIS: 2}, jax.devices()[:2])
    gen, eng = _run(params, cfg, mesh=mesh, quant="int8")
    assert all(len(g) == 4 for g in gen)
    assert eng.cache.k_scales.sharding.spec[0] == MODEL_AXIS


def test_cache_shardings_validates_divisibility():
    from mfa_tpu.cache.paged_cache import cache_shardings, create_cache

    mesh = make_mesh({MODEL_AXIS: 4}, jax.devices()[:4])
    cache = create_cache(
        num_pages=8, page_size=16, num_kv_heads=3, head_dim=32,
        max_seqs=2, pages_per_seq=4,
    )
    with pytest.raises(ValueError, match="divide"):
        cache_shardings(cache, mesh, MODEL_AXIS)


def test_decode_step_sharded_matches_dense():
    """decode_step with a mesh == decode_step without, same cache state."""
    cfg = _cfg()
    params = llama.init_params(jax.random.key(2), cfg)
    cache = llama.build_kv_caches(cfg, 16, 16, 2, 4)
    # map one page for slot 0 and write a tiny prompt
    cache, _ = llama.prefill_step(
        params, cfg, cache, 0, [1], jnp.asarray([3, 1, 4], jnp.int32)
    )
    slots = jnp.asarray([0], jnp.int32)
    toks = jnp.asarray([5], jnp.int32)
    c_ref, logits_ref = llama.decode_step(params, cfg, cache, slots, toks)

    mesh = make_mesh({MODEL_AXIS: 4}, jax.devices()[:4])
    params_s = jax.device_put(params, llama.param_shardings(cfg, mesh))
    cache_s = jax.device_put(cache, llama.cache_shardings(cfg, cache, mesh))
    c_tp, logits_tp = llama.decode_step(
        params_s, cfg, cache_s, slots, toks, mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(logits_tp), np.asarray(logits_ref), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(c_tp.lengths), np.asarray(c_ref.lengths)
    )


def test_sharded_gemma2_style_matches_unsharded():
    """The family knobs (paired alt-window scan, post-norms, softcaps,
    qkv bias) must survive TP sharding unchanged."""
    import dataclasses

    cfg = dataclasses.replace(
        _cfg(), sliding_window=16, alt_window=True, post_norms=True,
        norm_offset=True, embed_scale=True, hidden_act="gelu_tanh",
        attn_softcap=50.0, logit_softcap=30.0, qkv_bias=True,
    )
    params = llama.init_params(jax.random.key(2), cfg)
    # break the zero-init symmetry of biases/norms so the test is sharp
    params["layers"]["bq"] = (
        jax.random.normal(jax.random.key(3),
                          params["layers"]["bq"].shape) * 0.1
    ).astype(cfg.dtype)
    params["layers"]["post_attn_norm"] = (
        jax.random.normal(jax.random.key(4),
                          params["layers"]["post_attn_norm"].shape) * 0.1
    )
    gen_ref, _ = _run(params, cfg, mesh=None)
    mesh = make_mesh({MODEL_AXIS: 4}, jax.devices()[:4])
    gen_tp, _ = _run(params, cfg, mesh=mesh)
    assert gen_tp == gen_ref, (gen_tp, gen_ref)


def test_sharded_moe_matches_unsharded():
    """Mixtral-style MoE under TP: expert banks sharded on the ffn dim
    (GSPMD partitions the grouped matmuls); generations must match the
    unsharded engine token-for-token."""
    import dataclasses

    cfg = dataclasses.replace(_cfg(), n_experts=4, n_active_experts=2)
    params = llama.init_params(jax.random.key(5), cfg)
    gen_ref, _ = _run(params, cfg, mesh=None)
    mesh = make_mesh({MODEL_AXIS: 4}, jax.devices()[:4])
    gen_tp, eng = _run(params, cfg, mesh=mesh)
    assert gen_tp == gen_ref, (gen_tp, gen_ref)
    assert eng.params["layers"]["we_gate"].sharding.spec[3] == MODEL_AXIS
