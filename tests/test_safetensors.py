"""On-disk sharded-safetensors loading (VERDICT r2 missing #4).

Builds a tiny HF-layout checkpoint directory — two hand-written
.safetensors shards + shard index + config.json, bf16 payloads — and
checks that models/convert.from_safetensors streams it into the exact
same params pytree as the in-memory from_hf path, without torch or the
safetensors package anywhere in the loop.
"""

import json
import types

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pytest

from mfa_tpu.models import llama
from mfa_tpu.models.convert import from_hf, from_safetensors
from mfa_tpu.models.safetensors_io import (
    read_safetensors,
    write_safetensors,
)

HF_CFG = dict(
    model_type="llama", vocab_size=96, hidden_size=64,
    intermediate_size=112, num_hidden_layers=2, num_attention_heads=4,
    num_key_value_heads=2, rms_norm_eps=1e-5, rope_theta=10000.0,
    max_position_embeddings=256, tie_word_embeddings=False,
)


def _tiny_state_dict(seed=0):
    rng = np.random.default_rng(seed)
    d, ffn, kv_d = 64, 112, 32  # kv_d = kv_heads * head_dim = 2 * 16
    sd = {
        "model.embed_tokens.weight": rng.standard_normal((96, d)),
        "model.norm.weight": rng.standard_normal((d,)),
        "lm_head.weight": rng.standard_normal((96, d)),
    }
    for i in range(2):
        p = f"model.layers.{i}."
        sd.update({
            p + "self_attn.q_proj.weight": rng.standard_normal((d, d)),
            p + "self_attn.k_proj.weight": rng.standard_normal((kv_d, d)),
            p + "self_attn.v_proj.weight": rng.standard_normal((kv_d, d)),
            p + "self_attn.o_proj.weight": rng.standard_normal((d, d)),
            p + "mlp.gate_proj.weight": rng.standard_normal((ffn, d)),
            p + "mlp.up_proj.weight": rng.standard_normal((ffn, d)),
            p + "mlp.down_proj.weight": rng.standard_normal((d, ffn)),
            p + "input_layernorm.weight": rng.standard_normal((d,)),
            p + "post_attention_layernorm.weight":
                rng.standard_normal((d,)),
        })
    return {k: (v * 0.05).astype(np.float32) for k, v in sd.items()}


@pytest.fixture()
def checkpoint_dir(tmp_path):
    sd = _tiny_state_dict()
    names = sorted(sd)
    half = len(names) // 2
    shards = {
        "model-00001-of-00002.safetensors": names[:half],
        "model-00002-of-00002.safetensors": names[half:],
    }
    weight_map = {}
    for fname, keys in shards.items():
        write_safetensors(
            str(tmp_path / fname),
            {k: sd[k].astype(ml_dtypes.bfloat16) for k in keys})
        weight_map.update({k: fname for k in keys})
    with open(tmp_path / "model.safetensors.index.json", "w") as f:
        json.dump({"weight_map": weight_map}, f)
    with open(tmp_path / "config.json", "w") as f:
        json.dump(HF_CFG, f)
    return tmp_path, sd


def test_roundtrip_single_file(tmp_path):
    arrs = {
        "a": np.arange(24, dtype=np.float32).reshape(4, 6),
        "b": (np.arange(8) - 3).astype(np.int8),
        "c": np.linspace(-2, 2, 16).astype(ml_dtypes.bfloat16),
    }
    path = str(tmp_path / "one.safetensors")
    write_safetensors(path, arrs)
    back = read_safetensors(path)
    assert set(back) == set(arrs)
    for k in arrs:
        got = back[k]
        assert got.dtype == arrs[k].dtype and got.shape == arrs[k].shape
        np.testing.assert_array_equal(np.asarray(got), arrs[k])


def test_sharded_checkpoint_matches_from_hf(checkpoint_dir):
    path, sd = checkpoint_dir
    hf_config = types.SimpleNamespace(**HF_CFG)
    # reference: the in-memory conversion of the SAME (bf16-rounded)
    # tensors — from_safetensors must agree exactly
    sd_bf16 = {k: v.astype(ml_dtypes.bfloat16).astype(np.float32)
               for k, v in sd.items()}
    ref_params, ref_cfg = from_hf(sd_bf16, hf_config, dtype=jnp.float32)
    params, cfg = from_safetensors(str(path), dtype=jnp.float32)
    assert cfg == ref_cfg
    ref_leaves = jax.tree.leaves_with_path(ref_params)
    got = dict(jax.tree.leaves_with_path(params))
    assert len(got) == len(ref_leaves)
    for key, leaf in ref_leaves:
        np.testing.assert_array_equal(np.asarray(got[key]),
                                      np.asarray(leaf), err_msg=str(key))

    # and the loaded model actually runs
    toks = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
    logits = llama.forward(params, toks, cfg)
    assert logits.shape == (1, 4, 96)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_lazy_reader_is_lazy(checkpoint_dir):
    path, sd = checkpoint_dir
    lazy = read_safetensors(str(path))
    # full key inventory without reading any payload
    assert set(lazy) == set(sd)
    one = "model.layers.0.self_attn.q_proj.weight"
    got = lazy[one]
    np.testing.assert_array_equal(
        np.asarray(got, np.float32),
        sd[one].astype(ml_dtypes.bfloat16).astype(np.float32))
