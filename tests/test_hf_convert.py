"""HF checkpoint conversion: our forward must match transformers' forward.

A SUBPROCESS builds a tiny randomly-initialized transformers causal LM
(no network) for each supported family — Llama, Qwen2 (q/k/v bias), and
Gemma (head_dim override, gelu-tanh MLP, (1+w) RMSNorm, sqrt(dim)-scaled
embeddings, tied lm_head) — saves its state dict, config, reference
logits, and greedy generation; this process (which must stay torch-free —
loading torch's OpenMP runtime next to XLA's CPU backend segfaults the
suite) converts the weights with models/convert.py and compares. This pins
mfa_tpu's RoPE (rotate-half), RMSNorm, GQA fold, and gated-MLP conventions
to the reference implementation's numerics, and proves real checkpoints
serve through the engine.
"""

import json
import subprocess
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.models import llama
from mfa_tpu.models.convert import from_hf

_GEN_SCRIPT = r'''
import json, sys
import numpy as np
import torch, transformers

out, family = sys.argv[1], sys.argv[2]
common = dict(
    vocab_size=96, hidden_size=64, intermediate_size=112,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=256, rope_theta=10000.0,
)
if family == "llama":
    cfg = transformers.LlamaConfig(
        rms_norm_eps=1e-5, attention_bias=False,
        tie_word_embeddings=False, **common)
    cls = transformers.LlamaForCausalLM
elif family == "llama31":
    # Llama-3.1-style rope_scaling: low orig ctx so the low/high frequency
    # bands split inside the tiny head_dim
    cfg = transformers.LlamaConfig(
        rms_norm_eps=1e-5, attention_bias=False,
        tie_word_embeddings=False,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 32},
        **common)
    cls = transformers.LlamaForCausalLM
elif family == "qwen2_yarn":
    # Qwen long-context YaRN (NTK-by-parts + mscale on cos/sin)
    cfg = transformers.Qwen2Config(
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        rope_scaling={"rope_type": "yarn", "factor": 4.0,
                      "original_max_position_embeddings": 32},
        **common)
    cls = transformers.Qwen2ForCausalLM
elif family == "qwen2":
    cfg = transformers.Qwen2Config(
        rms_norm_eps=1e-6, tie_word_embeddings=False, **common)
    cls = transformers.Qwen2ForCausalLM
elif family == "gemma":
    cfg = transformers.GemmaConfig(
        rms_norm_eps=1e-6, head_dim=32,
        hidden_activation="gelu_pytorch_tanh",
        tie_word_embeddings=True, **common)
    cls = transformers.GemmaForCausalLM
elif family == "qwen3":
    cfg = transformers.Qwen3Config(
        rms_norm_eps=1e-6, head_dim=32,
        tie_word_embeddings=False, **common)
    cls = transformers.Qwen3ForCausalLM
elif family == "mixtral":
    cfg = transformers.MixtralConfig(
        rms_norm_eps=1e-5, tie_word_embeddings=False,
        num_local_experts=4, num_experts_per_tok=2,
        sliding_window=None, **common)
    cls = transformers.MixtralForCausalLM
elif family == "qwen3_moe":
    cfg = transformers.Qwen3MoeConfig(
        rms_norm_eps=1e-6, head_dim=32, tie_word_embeddings=False,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=48,
        mlp_only_layers=[], decoder_sparse_step=1, **common)
    cls = transformers.Qwen3MoeForCausalLM
elif family == "qwen3_moe_hetero":
    # dense/sparse interleave: layer 0 dense (mlp_only_layers), layer 1 MoE
    cfg = transformers.Qwen3MoeConfig(
        rms_norm_eps=1e-6, head_dim=32, tie_word_embeddings=False,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=48,
        mlp_only_layers=[0], decoder_sparse_step=1, **common)
    cls = transformers.Qwen3MoeForCausalLM
elif family == "qwen2_moe":
    # shared expert (sigmoid-gated) + unnormalized top-k + qkv bias
    cfg = transformers.Qwen2MoeConfig(
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=48,
        shared_expert_intermediate_size=80, norm_topk_prob=False,
        mlp_only_layers=[], decoder_sparse_step=1, **common)
    cls = transformers.Qwen2MoeForCausalLM
elif family == "gemma3":
    common["num_hidden_layers"] = 6  # one 5-sliding + 1-global period
    cfg = transformers.Gemma3TextConfig(
        rms_norm_eps=1e-6, head_dim=32, sliding_window=8,
        query_pre_attn_scalar=16, rope_local_base_freq=10000.0,
        rope_scaling={"rope_type": "linear", "factor": 8.0},
        hidden_activation="gelu_pytorch_tanh",
        tie_word_embeddings=True, **common)
    cfg.rope_theta = 1000000.0
    cls = transformers.Gemma3ForCausalLM
elif family == "gemma2":
    common["num_hidden_layers"] = 4  # 2 sliding/global pairs
    cfg = transformers.Gemma2Config(
        rms_norm_eps=1e-6, head_dim=32,
        hidden_activation="gelu_pytorch_tanh",
        tie_word_embeddings=True, sliding_window=8,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        query_pre_attn_scalar=16, **common)
    cls = transformers.Gemma2ForCausalLM
else:
    raise SystemExit(f"unknown family {family}")
cfg._attn_implementation = "eager"  # sdpa has no softcap path
torch.manual_seed(0)
model = cls(cfg)
model.eval()
# transformers' _init_weights zeroes Linear biases, which would make the
# parity test BLIND to dropped-bias conversion bugs (a real Qwen2-MoE
# checkpoint has nonzero q/k/v biases) — randomize them
with torch.no_grad():
    g = torch.Generator().manual_seed(1)
    for name, p in model.named_parameters():
        if name.endswith(".bias"):
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
tokens = np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 21))
with torch.no_grad():
    logits = model(torch.tensor(tokens)).logits.float().numpy()
    gen = model.generate(
        torch.tensor([[1, 2, 3, 4, 5]]), max_new_tokens=6,
        do_sample=False, num_beams=1, pad_token_id=0,
    )[0, 5:].tolist()
sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
np.savez(out, __tokens__=tokens, __logits__=logits,
         __gen__=np.asarray(gen, np.int32),
         __config__=np.array(json.dumps(cfg.to_dict())),
         **sd)
'''

FAMILIES = ("llama", "llama31", "qwen2", "qwen2_yarn", "gemma", "qwen3",
            "gemma2", "gemma3", "mixtral", "qwen3_moe", "qwen3_moe_hetero",
            "qwen2_moe")


@pytest.fixture(scope="module", params=FAMILIES)
def hf_artifacts(request, tmp_path_factory):
    family = request.param
    out = tmp_path_factory.mktemp("hf") / f"{family}.npz"
    proc = subprocess.run(
        [sys.executable, "-c", _GEN_SCRIPT, str(out), family],
        capture_output=True, text=True, timeout=420,
    )
    if proc.returncode != 0:
        pytest.skip(f"transformers reference generation failed ({family}): "
                    f"{proc.stderr[-500:]}")
    data = np.load(out)
    hf_config = types.SimpleNamespace(**json.loads(str(data["__config__"])))
    sd = {k: data[k] for k in data.files if not k.startswith("__")}
    return (family, sd, hf_config, data["__tokens__"], data["__logits__"],
            list(data["__gen__"]))


def test_converted_forward_matches_transformers(hf_artifacts):
    family, sd, hf_config, tokens, ref_logits, _ = hf_artifacts
    params, cfg = from_hf(sd, hf_config, dtype=jnp.float32)
    assert cfg.n_heads == 4 and cfg.n_kv_heads == 2
    if family == "qwen2":
        assert cfg.qkv_bias and "bq" in params["layers"]
        assert cfg.sliding_window is None  # use_sliding_window off
    if family == "llama31":
        assert cfg.rope_scaling is not None
        assert cfg.rope_scaling[0] == "llama3" and cfg.rope_scaling[1] == 8.0
    if family == "qwen2_yarn":
        assert cfg.rope_scaling is not None and cfg.rope_scaling[0] == "yarn"
        assert abs(cfg.rope_scaling[2] - (0.1 * np.log(4.0) + 1.0)) < 1e-6
    if family == "gemma":
        assert cfg.head_dim == 32 and cfg.norm_offset and cfg.embed_scale
        assert cfg.hidden_act == "gelu_tanh"
    if family == "qwen3":
        assert cfg.qk_norm and "q_norm" in params["layers"]
        assert cfg.head_dim == 32  # head_dim override (not dim/heads)
    if family == "mixtral":
        assert cfg.n_experts == 4 and cfg.n_active_experts == 2
        assert "we_gate" in params["layers"]
        assert cfg.norm_topk  # Mixtral renormalizes over the top-k
    if family == "qwen3_moe":
        assert cfg.n_experts == 4 and cfg.qk_norm and not cfg.norm_topk
        assert cfg.moe_ffn_dim == 48
        assert params["layers"]["we_gate"].shape[-1] == 48
    if family == "qwen3_moe_hetero":
        # layer 0 dense (mlp_only_layers=[0]), layer 1 sparse
        assert cfg.moe_layer_pattern == (False, True) and cfg.moe_hetero
        assert "w_gate" in params["layers"]["dense"]
        assert "we_gate" in params["layers"]["moe"]
    if family == "qwen2_moe":
        assert cfg.shared_expert_dim == 80 and cfg.shared_expert_gate
        assert not cfg.norm_topk
        assert "ws_gate" in params["layers"]
        assert params["layers"]["w_shared_gate"].shape[-1] == 1
    if family == "gemma3":
        assert cfg.qk_norm and cfg.post_norms and cfg.norm_offset
        assert cfg.rope_scale == 8.0  # linear scaling on global layers
        assert cfg.layer_pattern == (True,) * 5 + (False,)
        assert cfg.rope_theta_local == 10000.0
        assert cfg.sliding_window == 8
    if family == "gemma2":
        assert cfg.post_norms and cfg.alt_window
        assert cfg.attn_softcap == 50.0 and cfg.logit_softcap == 30.0
        assert abs(cfg.attn_scale - 16 ** -0.5) < 1e-9
        assert cfg.sliding_window == 8
    ours = np.asarray(llama.forward(params, jnp.asarray(tokens), cfg))
    diff = np.abs(ours - ref_logits).max()
    assert diff < 2e-3, f"{family} logits diverge from transformers: {diff}"


def test_converted_model_serves(hf_artifacts):
    family, sd, hf_config, _, _, hf_toks = hf_artifacts
    params, cfg = from_hf(sd, hf_config, dtype=jnp.float32)
    from mfa_tpu.serve.engine import Engine

    eng = Engine(params, cfg, num_pages=32, page_size=8, max_seqs=2,
                 pages_per_seq=8)
    req = eng.submit([1, 2, 3, 4, 5], 6)
    eng.run(burst=3)
    # greedy continuation must match transformers' greedy generate
    assert req.generated == hf_toks, (family, req.generated, hf_toks)


# ---------------- Gemma3 multimodal (SigLIP tower + projector) ----------------

_MM_SCRIPT = r'''
import json, sys
import numpy as np
import torch, transformers

out = sys.argv[1]
vc = transformers.SiglipVisionConfig(
    hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=2, image_size=28, patch_size=7, layer_norm_eps=1e-6)
tc = transformers.Gemma3TextConfig(
    vocab_size=128, hidden_size=64, intermediate_size=112,
    num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=2,
    head_dim=32, rms_norm_eps=1e-6, sliding_window=8,
    query_pre_attn_scalar=16, rope_local_base_freq=10000.0,
    rope_scaling={"rope_type": "linear", "factor": 8.0},
    hidden_activation="gelu_pytorch_tanh", max_position_embeddings=256,
    rope_theta=1000000.0, tie_word_embeddings=True)
cfg = transformers.Gemma3Config(
    text_config=tc, vision_config=vc, mm_tokens_per_image=4,
    image_token_index=100, boi_token_index=98, eoi_token_index=99)
cfg._attn_implementation = "eager"
torch.manual_seed(0)
model = transformers.Gemma3ForConditionalGeneration(cfg)
model.eval()
rng = np.random.RandomState(0)
img = [98] + [100] * 4 + [99]  # boi, image placeholders, eoi
ids = [[2, 5] + img + [7, 11, 13], [2, 9] + img + [17, 19, 23]]
input_ids = torch.tensor(ids)
ttype = (input_ids == 100).long()
pixels = torch.tensor(rng.randn(2, 3, 28, 28), dtype=torch.float32)
with torch.no_grad():
    logits = model(input_ids=input_ids, pixel_values=pixels,
                   token_type_ids=ttype).logits.float().numpy()
    gen = model.generate(
        input_ids=input_ids[:1], pixel_values=pixels[:1],
        token_type_ids=ttype[:1], max_new_tokens=6, do_sample=False,
        num_beams=1, pad_token_id=0)[0, input_ids.shape[1]:].tolist()
sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
np.savez(out, __ids__=np.asarray(ids, np.int32), __pixels__=pixels.numpy(),
         __logits__=logits, __gen__=np.asarray(gen, np.int32),
         __config__=np.array(json.dumps(cfg.to_dict())), **sd)
'''


@pytest.fixture(scope="module")
def mm_artifacts(tmp_path_factory):
    out = tmp_path_factory.mktemp("hf") / "gemma3_mm.npz"
    proc = subprocess.run(
        [sys.executable, "-c", _MM_SCRIPT, str(out)],
        capture_output=True, text=True, timeout=420,
    )
    if proc.returncode != 0:
        pytest.skip("transformers gemma3 multimodal generation failed: "
                    f"{proc.stderr[-500:]}")
    data = np.load(out)
    hf_config = types.SimpleNamespace(**json.loads(str(data["__config__"])))
    sd = {k: data[k] for k in data.files if not k.startswith("__")}
    return (sd, hf_config, data["__ids__"], data["__pixels__"],
            data["__logits__"], list(data["__gen__"]))


def test_gemma3_multimodal_matches_transformers(mm_artifacts):
    """Full conditional-generation forward: SigLIP tower, avg-pool+RMSNorm
    projector, image-feature scatter, bidirectional image-block mask."""
    from mfa_tpu.models.convert import gemma3_multimodal_from_hf
    from mfa_tpu.models.vision import multimodal_forward

    sd, hf_config, ids, pixels, ref_logits, _ = mm_artifacts
    params, cfg, vparams, vcfg, image_tok = gemma3_multimodal_from_hf(
        sd, hf_config, dtype=jnp.float32)
    assert image_tok == 100 and vcfg.mm_tokens_per_image == 4
    assert vcfg.patches_per_side == 4  # 28 / 7
    ours = np.asarray(multimodal_forward(
        params, vparams, jnp.asarray(ids), jnp.asarray(pixels), cfg, vcfg,
        image_tok))
    diff = np.abs(ours - ref_logits).max()
    assert diff < 2e-3, f"gemma3 multimodal logits diverge: {diff}"


def test_gemma3_multimodal_generate(mm_artifacts):
    from mfa_tpu.models.convert import gemma3_multimodal_from_hf
    from mfa_tpu.models.vision import multimodal_generate_greedy

    sd, hf_config, ids, pixels, _, hf_gen = mm_artifacts
    params, cfg, vparams, vcfg, image_tok = gemma3_multimodal_from_hf(
        sd, hf_config, dtype=jnp.float32)
    got = multimodal_generate_greedy(
        params, vparams, jnp.asarray(ids[:1]), jnp.asarray(pixels[:1]),
        cfg, vcfg, image_tok, max_new_tokens=6)
    assert got == hf_gen, (got, hf_gen)


def test_gemma3_multimodal_prefix_cache_isolation(mm_artifacts):
    """With prefix_cache=True, an image request must neither REGISTER its
    pages (identical token ids do NOT imply identical KV — the
    placeholders' KV depends on the pixels) nor MATCH cached text pages.
    A text request with the same token ids after an image request must
    produce exactly its text-only output."""
    from mfa_tpu.models.convert import gemma3_multimodal_from_hf
    from mfa_tpu.serve.engine import Engine

    sd, hf_config, ids, pixels, _, _ = mm_artifacts
    params, cfg, vparams, vcfg, image_tok = gemma3_multimodal_from_hf(
        sd, hf_config, dtype=jnp.float32)
    prompt = [int(t) for t in ids[0]]

    eng0 = Engine(params, cfg, num_pages=32, page_size=8, max_seqs=2,
                  pages_per_seq=8)
    t0 = eng0.submit(prompt, 5)  # text-only ground truth (same token ids)
    eng0.run()

    eng = Engine(params, cfg, num_pages=32, page_size=8, max_seqs=2,
                 pages_per_seq=8, vision=(vparams, vcfg, image_tok),
                 prefix_cache=True)
    rimg = eng.submit(prompt, 5, images=pixels[:1])
    eng.run()
    rtxt = eng.submit(prompt, 5)  # identical ids, no image
    eng.run()
    assert rtxt.generated == t0.generated, (rtxt.generated, t0.generated)
    assert rimg.generated != t0.generated  # sanity: the image mattered


def test_gemma3_multimodal_serves(mm_artifacts):
    """Image prompts through the paged serving engine: multimodal prefill
    (dense image-block mask) + ordinary causal paged decode must equal
    transformers' greedy generate; a text request in the SAME admission
    wave (mixed batch through the vision prefill path) must equal its
    text-only engine run."""
    from mfa_tpu.models.convert import gemma3_multimodal_from_hf
    from mfa_tpu.serve.engine import Engine

    sd, hf_config, ids, pixels, _, hf_gen = mm_artifacts
    params, cfg, vparams, vcfg, image_tok = gemma3_multimodal_from_hf(
        sd, hf_config, dtype=jnp.float32)

    text_prompt = [2, 5, 7, 11, 13]
    eng0 = Engine(params, cfg, num_pages=32, page_size=8, max_seqs=2,
                  pages_per_seq=8)
    t0 = eng0.submit(text_prompt, 5)
    eng0.run()

    eng = Engine(params, cfg, num_pages=32, page_size=8, max_seqs=2,
                 pages_per_seq=8, vision=(vparams, vcfg, image_tok))
    rimg = eng.submit([int(t) for t in ids[0]], 6, images=pixels[:1])
    rtxt = eng.submit(text_prompt, 5)
    eng.run()
    assert rimg.generated == hf_gen, (rimg.generated, hf_gen)
    assert rtxt.generated == t0.generated

    with pytest.raises(ValueError):
        eng0.submit([1, 2], 2, images=pixels[:1])  # no vision= tuple
