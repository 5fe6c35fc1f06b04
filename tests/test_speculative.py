"""Speculative decoding primitives and engine integration.

verify_step scores a span of tokens in one forward; its logits must match
step-by-step decode_step logits exactly (same kernel math, different
batching), and rollback must make rejected tokens invisible.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mfa_tpu.models import llama

CFG = llama.LlamaConfig.tiny(vocab=64, dim=64, layers=2, heads=4, kv_heads=2,
                             ffn=96, dtype=jnp.float32)


def _prefilled(params, prompt):
    cache = llama.build_kv_caches(CFG, 16, 8, 2, 8)
    cache, logits = llama.prefill_step(params, CFG, cache, 0,
                                       list(range(1, 9)),
                                       jnp.asarray(prompt, jnp.int32))
    return cache, logits


def test_verify_step_matches_sequential_decode():
    params = llama.init_params(jax.random.key(0), CFG)
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    toks = [7, 8, 9, 10]  # the span to score
    slots = jnp.asarray([0], jnp.int32)

    cache_a, _ = _prefilled(params, prompt)
    seq_logits = []
    for t in toks:
        cache_a, lg = llama.decode_step(
            params, CFG, cache_a, slots, jnp.asarray([t], jnp.int32))
        seq_logits.append(np.asarray(lg[0]))

    cache_b, _ = _prefilled(params, prompt)
    cache_b, logits = llama.verify_step(
        params, CFG, cache_b, slots, jnp.asarray([toks], jnp.int32))
    for i in range(len(toks)):
        np.testing.assert_allclose(
            np.asarray(logits[0, i]), seq_logits[i], atol=2e-4, rtol=1e-4,
            err_msg=f"verify logits diverge at span index {i}",
        )
    np.testing.assert_array_equal(np.asarray(cache_b.lengths),
                                  np.asarray(cache_a.lengths))


def test_rollback_restores_decode_state():
    params = llama.init_params(jax.random.key(1), CFG)
    prompt = [11, 12, 13]
    slots = jnp.asarray([0], jnp.int32)

    cache_a, _ = _prefilled(params, prompt)
    base_len = int(cache_a.lengths[0])
    # speculate 3 tokens, then roll back all of them
    cache_b, _ = llama.verify_step(
        params, CFG, cache_a, slots, jnp.asarray([[7, 8, 9]], jnp.int32))
    cache_b = llama.rollback(cache_b, slots, jnp.asarray([base_len]))
    # decoding token 20 now must equal decoding it from the clean state
    _, lg_clean = llama.decode_step(
        params, CFG, cache_a, slots, jnp.asarray([20], jnp.int32))
    _, lg_rolled = llama.decode_step(
        params, CFG, cache_b, slots, jnp.asarray([20], jnp.int32))
    np.testing.assert_allclose(np.asarray(lg_rolled), np.asarray(lg_clean),
                               atol=2e-5, rtol=1e-5)


def test_speculative_engine_matches_plain_greedy():
    """Speculative output must be bit-identical to plain greedy decoding of
    the target model, for any draft (here: a differently-seeded tiny model,
    so acceptance is partial and rollback paths are exercised)."""
    from mfa_tpu.serve.engine import Engine

    params = llama.init_params(jax.random.key(0), CFG)
    draft_cfg = llama.LlamaConfig.tiny(vocab=64, dim=32, layers=1, heads=2,
                                       kv_heads=1, ffn=64, dtype=jnp.float32)
    draft_params = llama.init_params(jax.random.key(9), draft_cfg)
    prompts = [[1, 2, 3], [9] * 11, [7, 8, 5, 3]]

    def run(spec):
        kw = dict(draft_params=draft_params, draft_cfg=draft_cfg,
                  spec_tokens=3) if spec else {}
        eng = Engine(params, CFG, num_pages=48, page_size=8, max_seqs=4,
                     pages_per_seq=8, **kw)
        reqs = [eng.submit(p, 7) for p in prompts]
        eng.run()
        assert eng.sched.allocator.free_pages == 47
        return [r.generated for r in reqs], eng.stats

    gen_spec, stats = run(True)
    gen_plain, _ = run(False)
    assert gen_spec == gen_plain, f"{gen_spec} vs {gen_plain}"
    assert stats.spec_proposed > 0


def test_speculative_self_draft_full_acceptance():
    """Draft == target: every proposal must be accepted (acceptance 1.0),
    and throughput bookkeeping still exact."""
    from mfa_tpu.serve.engine import Engine

    params = llama.init_params(jax.random.key(0), CFG)
    eng = Engine(params, CFG, num_pages=48, page_size=8, max_seqs=2,
                 pages_per_seq=8, draft_params=params, draft_cfg=CFG,
                 spec_tokens=4)
    req = eng.submit([1, 2, 3], 9)
    eng.run()
    assert len(req.generated) == 9
    assert eng.stats.spec_acceptance == 1.0, eng.stats


def test_speculative_at_table_capacity_matches_greedy():
    """A request within spec_tokens of filling its page table must not let
    span KV writes clamp into its own live last page (silent corruption):
    speculation shrinks to the headroom and output stays bit-identical."""
    from mfa_tpu.serve.engine import Engine

    params = llama.init_params(jax.random.key(0), CFG)
    draft_cfg = llama.LlamaConfig.tiny(vocab=64, dim=32, layers=1, heads=2,
                                       kv_heads=1, ffn=64, dtype=jnp.float32)
    draft = llama.init_params(jax.random.key(9), draft_cfg)
    # capacity = pages_per_seq * page = 4 * 8 = 32; prompt 20 + max_new 12
    # fills it exactly, so late steps have headroom < spec_tokens
    prompt = list(np.random.RandomState(11).randint(0, CFG.vocab_size, 20))

    def run(spec):
        kw = dict(draft_params=draft, draft_cfg=draft_cfg,
                  spec_tokens=4) if spec else {}
        eng = Engine(params, CFG, num_pages=16, page_size=8, max_seqs=2,
                     pages_per_seq=4, **kw)
        req = eng.submit(prompt, 12)
        eng.run()
        return req.generated

    g_spec, g_plain = run(True), run(False)
    assert g_spec == g_plain, f"{g_spec} vs {g_plain}"


def test_all_features_combined_match_plain_greedy():
    """Speculative + prefix cache + chunked prefill + int8 KV, all at once,
    must still be token-identical to a plain greedy engine — the
    interaction catch-all (rollbacks vs shared pages vs chunk offsets)."""
    import numpy as np

    from mfa_tpu.serve.engine import Engine

    params = llama.init_params(jax.random.key(0), CFG)
    draft_cfg = llama.LlamaConfig.tiny(vocab=64, dim=32, layers=1, heads=2,
                                       kv_heads=1, ffn=64, dtype=jnp.float32)
    draft = llama.init_params(jax.random.key(9), draft_cfg)
    shared = list(np.random.RandomState(5).randint(0, CFG.vocab_size, 18))
    prompts = [shared + [3], shared + [7, 1], [2, 4, 6]]

    def run(everything):
        kw = {}
        if everything:
            kw = dict(draft_params=draft, draft_cfg=draft_cfg,
                      spec_tokens=3, prefix_cache=True, prefill_chunk=16,
                      quant_dtype="int8")
        else:
            kw = dict(quant_dtype="int8")
        eng = Engine(params, CFG, num_pages=64, page_size=8, max_seqs=4,
                     pages_per_seq=8, **kw)
        reqs = [eng.submit(p, 6) for p in prompts]
        eng.run()
        # no page leaks (idle prefix pages are retained by design)
        retained = (len(eng.sched.prefix.pages)
                    if eng.sched.prefix is not None else 0)
        assert eng.sched.allocator.free_pages + retained == 63
        return [r.generated for r in reqs]

    assert run(True) == run(False)


def test_speculative_accept_greedy_params():
    """Regression: greedy params (temperature=0, the default) used to hit
    filtered_logits' division by zero, NaN-ing the acceptance rule so even
    a PERFECT draft was fully rejected. Greedy degenerates to exact-match
    acceptance with the target argmax as residual."""
    from mfa_tpu.serve.sampling import SamplingParams, speculative_accept

    V, k, n = 16, 3, 2
    rng = np.random.RandomState(1)
    target_logits = jnp.asarray(rng.randn(n, k, V), jnp.float32)
    tgt = np.asarray(jnp.argmax(target_logits, axis=-1))
    # row 0: perfect draft; row 1: mismatch at position 1
    d_toks = tgt.copy()
    d_toks[1, 1] = (tgt[1, 1] + 1) % V
    toks, m = speculative_accept(jax.random.key(0), target_logits * 0.9,
                                 target_logits, jnp.asarray(d_toks),
                                 SamplingParams())
    toks, m = np.asarray(toks), np.asarray(m)
    assert m[0] == k and list(toks[0]) == list(tgt[0])
    assert m[1] == 1 and toks[1, 1] == tgt[1, 1]  # residual = target argmax


def test_speculative_accept_preserves_target_distribution():
    """Rejection-sampling acceptance: the marginal of the first emitted
    token must equal the (filtered) target distribution regardless of the
    draft — the defining property of speculative sampling."""
    from mfa_tpu.serve.sampling import (SamplingParams, filtered_logits,
                                        speculative_accept)

    V, k, n = 16, 3, 1
    params = SamplingParams(temperature=0.8, top_p=0.9)
    rng = np.random.RandomState(0)
    draft_logits = jnp.asarray(rng.randn(n, k, V), jnp.float32)
    target_logits = jnp.asarray(rng.randn(n, k, V) * 1.5, jnp.float32)

    ql0 = filtered_logits(draft_logits, params)[:, 0]
    p_target = np.asarray(
        jax.nn.softmax(filtered_logits(target_logits, params), axis=-1)
    )[0, 0]

    N = 4000
    counts = np.zeros(V)

    def draw(key):
        kd, ka = jax.random.split(key)
        d_toks = jax.random.categorical(
            kd, jnp.broadcast_to(
                filtered_logits(draft_logits, params), (n, k, V)), axis=-1
        ).astype(jnp.int32)
        toks, m = speculative_accept(ka, draft_logits, target_logits,
                                     d_toks, params)
        return toks[0, 0]

    draws = jax.vmap(draw)(jax.random.split(jax.random.key(1), N))
    for t in np.asarray(draws):
        counts[t] += 1
    emp = counts / N
    tv = 0.5 * np.abs(emp - p_target).sum()
    assert tv < 0.05, f"TV distance {tv} (empirical {emp} vs {p_target})"
    del ql0


def test_speculative_sampled_engine_runs():
    """Spec decoding composes with stochastic sampling: the engine runs,
    completes, and reports acceptance (distribution preservation is the
    unit test above; here we drive the full engine path)."""
    from mfa_tpu.serve.engine import Engine
    from mfa_tpu.serve.sampling import SamplingParams

    params = llama.init_params(jax.random.key(0), CFG)
    draft_cfg = llama.LlamaConfig.tiny(vocab=64, dim=32, layers=1, heads=2,
                                       kv_heads=1, ffn=64, dtype=jnp.float32)
    draft = llama.init_params(jax.random.key(9), draft_cfg)
    eng = Engine(params, CFG, num_pages=64, page_size=8, max_seqs=2,
                 pages_per_seq=8, draft_params=draft, draft_cfg=draft_cfg,
                 spec_tokens=3,
                 sampling=SamplingParams(temperature=0.8, top_p=0.95))
    reqs = [eng.submit([1, 2, 3, 4, 5], 8), eng.submit([9, 8, 7], 6)]
    eng.run()
    for r in reqs:
        assert r.done and len(r.generated) in (8, 6) or r.done
        assert len(r.logprobs) == len(r.generated)
        assert all(0 <= t < CFG.vocab_size for t in r.generated)
    assert eng.stats.spec_proposed > 0
    assert 0.0 <= eng.stats.spec_acceptance <= 1.0
    assert eng.sched.allocator.free_pages == 63
