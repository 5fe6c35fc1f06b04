"""Chunked prefill: chunk-by-chunk ingestion == whole-prompt prefill.

The scheduler-level mechanism for TTFT fairness: long prompts are prefilled
one page-aligned chunk per engine step (attending to the prefix gathered
from the paged cache with a causal-offset window) while decode for the rest
of the batch keeps stepping. No reference counterpart (no scheduler there,
SURVEY.md §2.8).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mfa_tpu.models import llama

CFG = llama.LlamaConfig.tiny(vocab=64, dim=64, layers=2, heads=4, kv_heads=2,
                             ffn=96, dtype=jnp.float32)


def _params():
    return llama.init_params(jax.random.key(0), CFG)


def test_chunked_equals_whole_prefill():
    params = _params()
    prompt = list(np.random.RandomState(0).randint(0, CFG.vocab_size, 29))
    pages = list(range(1, 9))

    cache_a = llama.build_kv_caches(CFG, 16, 8, 2, 8)
    cache_a, logits_a = llama.prefill_step(params, CFG, cache_a, 0, pages,
                                           jnp.asarray(prompt, jnp.int32))

    cache_b = llama.build_kv_caches(CFG, 16, 8, 2, 8)
    chunk = 16  # 2 pages per chunk
    logits_b = None
    for pos in range(0, len(prompt), chunk):
        cache_b, logits_b = llama.prefill_chunk(
            params, CFG, cache_b, 0, pages, prompt[pos : pos + chunk],
            pos, len(prompt),
        )
    np.testing.assert_allclose(np.asarray(logits_b), np.asarray(logits_a),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cache_b.lengths),
                               np.asarray(cache_a.lengths))
    # the written KV pages must match on all VALID rows (rows past the true
    # prompt length are dead garbage and legitimately differ between the
    # chunked and whole-prompt paths — both pad with different contexts)
    kb = np.asarray(cache_b.k_pages)  # [L, hkv, pages, page, d]
    ka = np.asarray(cache_a.k_pages)
    for tok in range(len(prompt)):
        pg, off = pages[tok // 8], tok % 8
        np.testing.assert_allclose(
            kb[:, :, pg, off], ka[:, :, pg, off], atol=2e-5,
            err_msg=f"KV row for token {tok} differs",
        )


def test_engine_chunked_prefill_matches_unchunked():
    from mfa_tpu.serve.engine import Engine

    params = _params()
    prompts = [
        list(np.random.RandomState(1).randint(0, CFG.vocab_size, 37)),
        [5, 6, 7],   # short prompt takes the batched path
        list(np.random.RandomState(2).randint(0, CFG.vocab_size, 21)),
    ]

    def run(chunk):
        eng = Engine(params, CFG, num_pages=64, page_size=8, max_seqs=4,
                     pages_per_seq=8, prefill_chunk=chunk)
        reqs = [eng.submit(p, 5) for p in prompts]
        eng.run()
        assert eng.sched.allocator.free_pages == 63
        return [r.generated for r in reqs]

    assert run(chunk=16) == run(chunk=None)


def test_engine_chunked_prefill_with_sampling_penalty():
    """Regression: chunked-prefill logits include padded bucket rows, but
    presence/sampling vectors are sized to the real items — sampling used
    to crash on the shape mismatch whenever a penalty/per-request sampling
    config was active with a non-power-of-two chunked wave."""
    from mfa_tpu.serve.engine import Engine
    from mfa_tpu.serve.sampling import SamplingParams

    params = _params()
    prompts = [
        list(np.random.RandomState(4).randint(0, CFG.vocab_size, 37)),
        list(np.random.RandomState(5).randint(0, CFG.vocab_size, 33)),
        list(np.random.RandomState(6).randint(0, CFG.vocab_size, 21)),
    ]

    def run(chunk):
        eng = Engine(params, CFG, num_pages=64, page_size=8, max_seqs=4,
                     pages_per_seq=8, prefill_chunk=chunk,
                     sampling=SamplingParams(repetition_penalty=1.2))
        reqs = [eng.submit(p, 5) for p in prompts]  # 3 items pad to 4
        eng.run()
        return [r.generated for r in reqs]

    assert run(chunk=16) == run(chunk=None)


def test_engine_chunked_prefill_quantized_burst():
    from mfa_tpu.serve.engine import Engine

    params = _params()
    prompt = list(np.random.RandomState(3).randint(0, CFG.vocab_size, 33))

    def run(chunk, burst):
        eng = Engine(params, CFG, num_pages=32, page_size=8, max_seqs=2,
                     pages_per_seq=8, quant_dtype="int8",
                     prefill_chunk=chunk)
        req = eng.submit(prompt, 6)
        eng.run(burst=burst)
        return req.generated

    assert run(16, 4) == run(None, 1)


def test_chunked_equals_whole_prefill_gemma2_style():
    """Chunked ingestion must agree with whole-prompt prefill when layers
    alternate sliding/global windows and carry post-norms + softcaps
    (the chunk kernel sees a different window per scanned sub-layer)."""
    import dataclasses

    cfg = dataclasses.replace(
        CFG, sliding_window=12, alt_window=True, post_norms=True,
        norm_offset=True, embed_scale=True, hidden_act="gelu_tanh",
        attn_softcap=50.0, logit_softcap=30.0, n_layers=2,
    )
    params = llama.init_params(jax.random.key(3), cfg)
    # sharpen: random post-norm weights (zeros-init would hide bugs)
    params["layers"]["post_attn_norm"] = jax.random.normal(
        jax.random.key(4), params["layers"]["post_attn_norm"].shape) * 0.1
    prompt = list(np.random.RandomState(1).randint(0, cfg.vocab_size, 29))
    pages = list(range(1, 9))

    cache_a = llama.build_kv_caches(cfg, 16, 8, 2, 8)
    cache_a, logits_a = llama.prefill_step(params, cfg, cache_a, 0, pages,
                                           jnp.asarray(prompt, jnp.int32))

    cache_b = llama.build_kv_caches(cfg, 16, 8, 2, 8)
    logits_b = None
    for pos in range(0, len(prompt), 16):
        cache_b, logits_b = llama.prefill_chunk(
            params, cfg, cache_b, 0, pages, prompt[pos : pos + 16],
            pos, len(prompt),
        )
    np.testing.assert_allclose(np.asarray(logits_b), np.asarray(logits_a),
                               atol=2e-4, rtol=1e-4)
