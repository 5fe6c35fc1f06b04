"""HF checkpoint conversion: our forward must match transformers' forward.

Builds a tiny randomly-initialized transformers LlamaForCausalLM (no
network), converts it with models/convert.py, and compares logits — this
pins mfa_tpu's RoPE (rotate-half), RMSNorm, GQA fold, and SwiGLU
conventions to the reference implementation's numerics, and proves real
checkpoints can serve through the engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mfa_tpu.models import llama
from mfa_tpu.models.convert import from_hf


def _tiny_hf():
    cfg = transformers.LlamaConfig(
        vocab_size=96, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    return model


def test_converted_forward_matches_transformers():
    hf = _tiny_hf()
    params, cfg = from_hf(hf, dtype=jnp.float32)
    assert cfg.n_heads == 4 and cfg.n_kv_heads == 2 and cfg.head_dim == 16

    tokens = np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 21))
    with torch.no_grad():
        ref = hf(torch.tensor(tokens)).logits.float().numpy()
    ours = np.asarray(llama.forward(params, jnp.asarray(tokens), cfg))
    diff = np.abs(ours - ref).max()
    assert diff < 2e-3, f"logits diverge from transformers: {diff}"


def test_converted_model_serves():
    hf = _tiny_hf()
    params, cfg = from_hf(hf, dtype=jnp.float32)
    from mfa_tpu.serve.engine import Engine

    eng = Engine(params, cfg, num_pages=32, page_size=8, max_seqs=2,
                 pages_per_seq=8)
    req = eng.submit([1, 2, 3, 4, 5], 6)
    eng.run(burst=3)
    assert len(req.generated) == 6

    # greedy continuation must match transformers' greedy generate
    with torch.no_grad():
        out = hf.generate(
            torch.tensor([[1, 2, 3, 4, 5]]), max_new_tokens=6,
            do_sample=False, num_beams=1,
            pad_token_id=0,
        )
    hf_toks = out[0, 5:].tolist()
    assert req.generated == hf_toks, (req.generated, hf_toks)
