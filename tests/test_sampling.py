"""Sampling: greedy/temperature/top-k/top-p semantics + engine integration.

The reference has no sampling (kernel library); these pin down the serving
layer's sampler: filtering order (top-k then top-p then categorical),
greedy short-circuit, and determinism under a fixed PRNG seed in both the
stepwise and burst decode paths.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mfa_tpu.serve.sampling import SamplingParams, sample


def test_greedy_is_argmax():
    logits = jax.random.normal(jax.random.key(0), (5, 64))
    out = sample(logits, jax.random.key(1), SamplingParams())
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(jnp.argmax(logits, -1))
    )


def test_top_k_one_is_argmax():
    logits = jax.random.normal(jax.random.key(0), (5, 64))
    out = sample(logits, jax.random.key(1),
                 SamplingParams(temperature=1.0, top_k=1))
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(jnp.argmax(logits, -1))
    )


def test_top_k_restricts_support():
    logits = jax.random.normal(jax.random.key(2), (4, 128))
    topk_ids = np.asarray(jax.lax.top_k(logits, 8)[1])
    for i in range(20):
        out = np.asarray(
            sample(logits, jax.random.key(i),
                   SamplingParams(temperature=2.0, top_k=8))
        )
        for row in range(4):
            assert out[row] in topk_ids[row], (row, out[row])


def test_top_p_nucleus_cut():
    # probs ~ [0.6, 0.3, 0.05, ...]: with top_p=0.7 the nucleus is {0, 1}
    # (cumulative mass before token 2 is 0.9 >= 0.7)
    probs = np.full((1, 32), 0.1 / 30)
    probs[0, 0], probs[0, 1] = 0.6, 0.3
    logits = jnp.log(jnp.asarray(probs))
    seen = set()
    for i in range(50):
        out = int(
            sample(logits, jax.random.key(i),
                   SamplingParams(temperature=1.0, top_p=0.7))[0]
        )
        seen.add(out)
    assert seen <= {0, 1}, seen
    assert seen == {0, 1}, "both nucleus tokens should appear in 50 draws"


def test_engine_stochastic_deterministic_per_seed():
    from mfa_tpu.models import llama
    from mfa_tpu.serve.engine import Engine

    cfg = llama.LlamaConfig.tiny(vocab=64, dim=64, layers=2, heads=4,
                                 kv_heads=2, ffn=96, dtype=jnp.float32)
    params = llama.init_params(jax.random.key(0), cfg)
    sp = SamplingParams(temperature=0.8, top_k=16)

    def run(seed, burst):
        eng = Engine(params, cfg, num_pages=32, page_size=8, max_seqs=4,
                     pages_per_seq=8, sampling=sp, seed=seed)
        reqs = [eng.submit([1, 2, 3], 6), eng.submit([9] * 10, 6)]
        eng.run(burst=burst)
        return [r.generated for r in reqs]

    a = run(0, burst=1)
    b = run(0, burst=1)
    assert a == b, "same seed must reproduce"
    c = run(1, burst=1)
    assert a != c, "different seed should diverge (overwhelmingly likely)"
    d = run(0, burst=4)
    e = run(0, burst=4)
    assert d == e, "burst sampling must also reproduce per seed"
    for gen in a + d:
        assert all(0 <= t < cfg.vocab_size for t in gen)


def test_engine_logprobs():
    """Every generated token carries a logprob; greedy logprobs equal the
    max log-softmax; burst and stepwise agree."""
    from mfa_tpu.models import llama
    from mfa_tpu.serve.engine import Engine

    cfg = llama.LlamaConfig.tiny(vocab=64, dim=64, layers=2, heads=4,
                                 kv_heads=2, ffn=96, dtype=jnp.float32)
    params = llama.init_params(jax.random.key(0), cfg)

    def run(burst):
        eng = Engine(params, cfg, num_pages=32, page_size=8, max_seqs=4,
                     pages_per_seq=8)
        reqs = [eng.submit([1, 2, 3], 5), eng.submit([9] * 10, 5)]
        eng.run(burst=burst)
        return reqs

    a = run(1)
    b = run(4)
    for ra, rb in zip(a, b):
        assert len(ra.logprobs) == len(ra.generated) == 5
        assert all(np.isfinite(ra.logprobs)) and all(lp <= 0 for lp in ra.logprobs)
        assert ra.generated == rb.generated
        np.testing.assert_allclose(ra.logprobs, rb.logprobs, atol=1e-4)


def test_speculative_logprobs_match_plain():
    from mfa_tpu.models import llama
    from mfa_tpu.serve.engine import Engine

    cfg = llama.LlamaConfig.tiny(vocab=64, dim=64, layers=2, heads=4,
                                 kv_heads=2, ffn=96, dtype=jnp.float32)
    params = llama.init_params(jax.random.key(0), cfg)
    draft_cfg = llama.LlamaConfig.tiny(vocab=64, dim=32, layers=1, heads=2,
                                       kv_heads=1, ffn=64, dtype=jnp.float32)
    draft = llama.init_params(jax.random.key(5), draft_cfg)

    def run(spec):
        kw = dict(draft_params=draft, draft_cfg=draft_cfg,
                  spec_tokens=3) if spec else {}
        eng = Engine(params, cfg, num_pages=32, page_size=8, max_seqs=2,
                     pages_per_seq=8, **kw)
        req = eng.submit([4, 2, 7, 7], 6)
        eng.run()
        return req

    rs, rp = run(True), run(False)
    assert rs.generated == rp.generated
    np.testing.assert_allclose(rs.logprobs, rp.logprobs, atol=1e-4)


def test_min_p_keeps_only_dominant_token():
    from mfa_tpu.serve.sampling import SamplingParams, sample

    # token 0 has >10x the probability of every other token; min_p=0.5
    # leaves it alone in the support, so sampling is deterministic.
    logits = jnp.asarray([[5.0, 0.0, 0.5, 1.0]])
    p = SamplingParams(temperature=1.0, min_p=0.5)
    for seed in range(5):
        ids = sample(logits, jax.random.key(seed), p)
        assert int(ids[0]) == 0


def test_min_p_zero_is_noop_support():
    from mfa_tpu.serve.sampling import SamplingParams, sample

    logits = jnp.asarray([[1.0, 1.01, 0.99, 1.0]])
    p = SamplingParams(temperature=1.0, min_p=0.0)
    seen = {int(sample(logits, jax.random.key(s), p)[0]) for s in range(40)}
    assert len(seen) > 1  # near-uniform: several tokens appear


def test_repetition_penalty_flips_argmax():
    from mfa_tpu.serve.sampling import SamplingParams, sample

    logits = jnp.asarray([[2.0, 1.9, -3.0, -1.0]])
    presence = jnp.asarray([[True, False, False, False]])
    greedy_pen = SamplingParams(temperature=0.0, repetition_penalty=10.0)
    # without presence: argmax 0; with presence on 0: 2.0/10 < 1.9 -> 1
    assert int(sample(logits, jax.random.key(0), greedy_pen)[0]) == 0
    assert int(sample(logits, jax.random.key(0), greedy_pen, presence)[0]) == 1
    # negative logits are multiplied: penalizing token 3 pushes it down
    presence2 = jnp.asarray([[False, False, False, True]])
    l2 = jnp.asarray([[-2.0, -1.9, -3.0, -1.0]])
    assert int(sample(l2, jax.random.key(0), greedy_pen, presence2)[0]) == 1


def test_per_request_sampling_mixed_batch():
    """A batch mixing a greedy request, a penalized greedy request, and an
    engine-default request runs in one program; the greedy rows are
    deterministic and the penalized row matches its single-request run."""
    import numpy as np

    from mfa_tpu.models import llama
    from mfa_tpu.serve.engine import Engine
    from mfa_tpu.serve.sampling import SamplingParams

    cfg = llama.LlamaConfig.tiny(vocab=64, dim=64, layers=2, heads=4,
                                 kv_heads=2, ffn=96, dtype=jnp.float32)
    params = llama.init_params(jax.random.key(0), cfg)
    pen = SamplingParams(temperature=0.0, repetition_penalty=1.7)

    def fresh():
        return Engine(params, cfg, num_pages=48, page_size=8, max_seqs=4,
                      pages_per_seq=8)

    # single-request references
    e1 = fresh(); r_plain = e1.submit([1, 2, 3], 6); e1.run(burst=3)
    e2 = fresh(); r_pen = e2.submit([1, 2, 3], 6, sampling=pen)
    e2.run(burst=3)
    assert r_plain.generated != r_pen.generated  # penalty changes output

    # mixed batch reproduces both, stepwise AND burst
    for burst in (1, 3):
        eng = fresh()
        a = eng.submit([1, 2, 3], 6)
        b = eng.submit([1, 2, 3], 6, sampling=pen)
        c = eng.submit([9, 8], 6)
        eng.run(burst=burst)
        assert a.generated == r_plain.generated, burst
        assert b.generated == r_pen.generated, burst
        assert len(c.generated) == 6


def test_per_request_sampling_rejected_with_speculative():
    import pytest
    from mfa_tpu.models import llama
    from mfa_tpu.serve.engine import Engine
    from mfa_tpu.serve.sampling import SamplingParams

    cfg = llama.LlamaConfig.tiny(vocab=64, dim=64, layers=2, heads=4,
                                 kv_heads=2, ffn=96, dtype=jnp.float32)
    params = llama.init_params(jax.random.key(0), cfg)
    eng = Engine(params, cfg, num_pages=48, page_size=8, max_seqs=4,
                 pages_per_seq=8, draft_params=params, draft_cfg=cfg)
    with pytest.raises(ValueError):
        eng.submit([1, 2], 4, sampling=SamplingParams(temperature=0.5))


def test_penalty_slot_reuse_no_stale_presence():
    """A finished request's presence bits must not leak into the next
    request admitted to the same slot (rows are cleared per admission
    wave, not eagerly at finish)."""
    from mfa_tpu.models import llama
    from mfa_tpu.serve.engine import Engine
    from mfa_tpu.serve.sampling import SamplingParams

    cfg = llama.LlamaConfig.tiny(vocab=64, dim=64, layers=2, heads=4,
                                 kv_heads=2, ffn=96, dtype=jnp.float32)
    params = llama.init_params(jax.random.key(0), cfg)
    pen = SamplingParams(temperature=0.0, repetition_penalty=1.7)

    # reference: B alone on a fresh engine
    e_ref = Engine(params, cfg, num_pages=48, page_size=8, max_seqs=1,
                   pages_per_seq=8, sampling=pen)
    r_ref = e_ref.submit([9, 8, 7], 6)
    e_ref.run(burst=3)

    # A runs to completion (its tokens mark slot 0), then B reuses slot 0
    eng = Engine(params, cfg, num_pages=48, page_size=8, max_seqs=1,
                 pages_per_seq=8, sampling=pen)
    a = eng.submit([1, 2, 3], 6)
    eng.run(burst=3)
    assert len(a.generated) == 6
    b = eng.submit([9, 8, 7], 6)
    eng.run(burst=3)
    assert b.generated == r_ref.generated, (b.generated, r_ref.generated)
