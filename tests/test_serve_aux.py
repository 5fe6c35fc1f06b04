"""Serving auxiliary subsystems: failure recovery, checkpointing, timing."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.models import llama

CFG = llama.LlamaConfig.tiny(vocab=64, dim=64, layers=2, heads=4, kv_heads=2,
                             ffn=128, dtype=jnp.float32)


@pytest.fixture(scope="module")
def params():
    return llama.init_params(jax.random.key(0), CFG)


def test_engine_preempts_on_page_exhaustion(params):
    """When every admitted sequence decodes long enough that page demand
    exceeds the pool, the engine must preempt (evict + requeue + resume)
    rather than crash with MemoryError — and preemption must not change
    any request's output."""
    from mfa_tpu.serve.engine import Engine

    rs = np.random.RandomState(11)
    prompts = [list(rs.randint(0, CFG.vocab_size, 8)) for _ in range(2)]

    # ground truth: a roomy engine
    eng0 = Engine(params, CFG, num_pages=32, page_size=8, max_seqs=2,
                  pages_per_seq=4)
    want = [eng0.submit(p, 20) for p in prompts]
    eng0.run()

    # 7 usable pages; both requests eventually need 4 each (28 tokens)
    eng = Engine(params, CFG, num_pages=8, page_size=8, max_seqs=2,
                 pages_per_seq=4)
    got = [eng.submit(p, 20) for p in prompts]
    stats = eng.run()
    assert stats.preemptions >= 1, "page pressure never triggered preemption"
    for g, w in zip(got, want):
        assert g.generated == w.generated, (g.generated, w.generated)
    assert eng.sched.allocator.free_pages == 8 - 1  # all recycled


def test_engine_recovery_preserves_output(params, monkeypatch):
    """A mid-flight device failure must not change what gets generated."""
    from mfa_tpu.serve.engine import Engine

    prompt = list(np.random.RandomState(5).randint(0, CFG.vocab_size, 9))

    # Ground truth: no failure.
    eng0 = Engine(params, CFG, num_pages=32, page_size=8, max_seqs=4,
                  pages_per_seq=8)
    r0 = eng0.submit(prompt, 6)
    eng0.run()

    # Fault injection: decode_step raises once at the 3rd call.
    real_decode = llama.decode_step
    calls = {"n": 0}

    def flaky_decode(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("injected device failure")
        return real_decode(*args, **kwargs)

    import mfa_tpu.serve.engine as engine_mod
    monkeypatch.setattr(engine_mod.llama, "decode_step", flaky_decode)

    # Without a retry budget the injected failure surfaces.
    eng_no_retry = Engine(params, CFG, num_pages=32, page_size=8, max_seqs=4,
                          pages_per_seq=8)
    eng_no_retry.submit(prompt, 6)
    with pytest.raises(RuntimeError):
        eng_no_retry.run(max_retries=0)

    calls["n"] = 0
    eng1 = Engine(params, CFG, num_pages=32, page_size=8, max_seqs=4,
                  pages_per_seq=8)
    r1 = eng1.submit(prompt, 6)
    stats = eng1.run(max_retries=2)
    assert stats.recoveries >= 1
    assert r1.generated == r0.generated, (r1.generated, r0.generated)
    # pages fully recycled after recovery + completion
    assert eng1.sched.allocator.free_pages == 31


def test_checkpoint_roundtrip_extensionless_path(params, tmp_path):
    """Regression: np.savez appends '.npz' to extension-less paths, which
    used to break the save/load round-trip for such paths."""
    from mfa_tpu.utils.checkpoint import load_params, save_params

    path = os.path.join(tmp_path, "model")  # no extension
    save_params(path, params)
    restored = load_params(path, llama.init_params(jax.random.key(1), CFG))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip(params, tmp_path):
    from mfa_tpu.utils.checkpoint import load_params, save_params

    path = os.path.join(tmp_path, "ckpt.npz")
    save_params(path, params)
    like = llama.init_params(jax.random.key(1), CFG)  # different values
    restored = load_params(path, like)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # forward parity
    tokens = jnp.arange(10, dtype=jnp.int32)[None]
    out1 = llama.forward(params, tokens, CFG)
    out2 = llama.forward(restored, tokens, CFG)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_checkpoint_structure_mismatch(params, tmp_path):
    from mfa_tpu.utils.checkpoint import load_params, save_params

    path = os.path.join(tmp_path, "ckpt.npz")
    save_params(path, params)
    with pytest.raises(ValueError):
        load_params(path, {"just": jnp.zeros(3)})


def test_scan_timeit_cpu_sanity():
    """The timing harness itself must run on CPU and return sane values."""
    from mfa_tpu.utils.timing import scan_timeit

    x = jnp.ones((256, 256))

    def step(c, x):
        return c + 0.0 * jnp.sum(x) + 1.0

    dt = scan_timeit(step, jnp.float32(0), args=(x,), iters=16)
    assert 0 < dt < 1.0


def test_burst_decode_matches_stepwise(params):
    """run(burst=4) must produce token-for-token the same generations as
    the per-step loop (decode_burst is the same decode_step scanned
    on-device; only the host-sync cadence differs)."""
    from mfa_tpu.serve.engine import Engine

    prompts = [[1, 2, 3], [5] * 11, [7, 8]]

    def run(burst):
        eng = Engine(params, CFG, num_pages=32, page_size=8, max_seqs=4,
                     pages_per_seq=8)
        reqs = [eng.submit(p, 7) for p in prompts]
        eng.run(burst=burst)
        assert eng.sched.allocator.free_pages == 31  # pages recycled
        return [r.generated for r in reqs]

    assert run(burst=4) == run(burst=1)


def test_burst_decode_eos_truncates(params):
    """A request hitting eos mid-burst stops there; outputs match the
    stepwise loop with the same eos."""
    from mfa_tpu.serve.engine import Engine

    prompt = [3, 1, 4, 1, 5]

    def run(burst):
        eng = Engine(params, CFG, num_pages=32, page_size=8, max_seqs=2,
                     pages_per_seq=8)
        # pick the token the model actually emits second as eos so the
        # request ends mid-burst deterministically
        probe = Engine(params, CFG, num_pages=32, page_size=8, max_seqs=2,
                       pages_per_seq=8)
        r = probe.submit(prompt, 3)
        probe.run()
        eos = r.generated[1]
        req = eng.submit(prompt, 7, eos_token=eos)
        eng.run(burst=burst)
        return req.generated

    assert run(burst=4) == run(burst=1)


def test_engine_fp8_kv_cache(params):
    """FP8 KV serving end-to-end: runs to completion, recycles pages, and
    stays close to the fp32-cache generations (per-row fp8 quant noise can
    flip rare near-ties, so compare logprob sanity rather than demand
    token equality)."""
    from mfa_tpu.serve.engine import Engine

    prompts = [[1, 2, 3, 4], [9] * 9]

    def run(quant):
        eng = Engine(params, CFG, num_pages=32, page_size=8, max_seqs=4,
                     pages_per_seq=8, quant_dtype=quant)
        reqs = [eng.submit(p, 5) for p in prompts]
        eng.run(burst=4)
        assert eng.sched.allocator.free_pages == 31
        return reqs

    fp8 = run("fp8")
    ref = run(None)
    for a, b in zip(fp8, ref):
        assert len(a.generated) == 5
        assert all(np.isfinite(a.logprobs))
        # same argmax path on a tiny random model: expect agreement
        assert a.generated == b.generated, (a.generated, b.generated)


def test_streaming_poll(params):
    """poll() yields every generated token exactly once, in order, across
    step and burst drives; finished requests drop out of future polls."""
    from mfa_tpu.serve.engine import Engine

    eng = Engine(params, CFG, num_pages=32, page_size=8, max_seqs=4,
                 pages_per_seq=8)
    r1 = eng.submit([1, 2, 3], 6)
    r2 = eng.submit([9] * 10, 4)
    streamed = {r1.uid: [], r2.uid: []}
    while eng.sched.has_work:
        eng.step_burst(3)
        for uid, toks in eng.poll().items():
            streamed[uid].extend(toks)
    final = eng.poll()
    for uid, toks in final.items():
        streamed[uid].extend(toks)
    assert streamed[r1.uid] == r1.generated
    assert streamed[r2.uid] == r2.generated
    assert eng.poll() == {}  # all flushed


def test_stop_sequences_end_generation(params):
    from mfa_tpu.serve.engine import Engine

    prompt = [3, 1, 4, 1, 5]
    eng0 = Engine(params, CFG, num_pages=32, page_size=8, max_seqs=4,
                  pages_per_seq=8)
    r0 = eng0.submit(prompt, 8)
    eng0.run(burst=4)
    assert len(r0.generated) == 8

    # stop on a 2-token subsequence -> generation halts at the FIRST
    # suffix match (matched tokens stay in the output)
    stop_seq = r0.generated[2:4]

    def first_match_end(tokens, seq):
        for e in range(len(seq), len(tokens) + 1):
            if tokens[e - len(seq):e] == seq:
                return e
        return len(tokens)

    eng1 = Engine(params, CFG, num_pages=32, page_size=8, max_seqs=4,
                  pages_per_seq=8)
    r1 = eng1.submit(prompt, 8, stop=[stop_seq, [9999]])
    eng1.run(burst=4)
    expect = r0.generated[:first_match_end(r0.generated, stop_seq)]
    assert r1.generated == expect, (r1.generated, expect)
    assert len(r1.generated) < 8  # it actually stopped early
    assert eng1.sched.allocator.free_pages == 31


def test_repetition_penalty_burst_matches_stepwise(params):
    """The presence mask is built host-side per call in the stepwise path
    and updated on-device inside the burst scan — the two must agree
    token-for-token (greedy + penalty is deterministic)."""
    from mfa_tpu.serve.engine import Engine
    from mfa_tpu.serve.sampling import SamplingParams

    prompts = [[1, 2, 3], [5] * 9]
    sampling = SamplingParams(temperature=0.0, repetition_penalty=1.8)

    def run(burst):
        eng = Engine(params, CFG, num_pages=32, page_size=8, max_seqs=4,
                     pages_per_seq=8, sampling=sampling)
        reqs = [eng.submit(p, 7) for p in prompts]
        eng.run(burst=burst)
        return [r.generated for r in reqs]

    gen_b, gen_s = run(4), run(1)
    assert gen_b == gen_s
    # sanity: the penalty actually changes the output vs plain greedy
    def run_plain():
        eng = Engine(params, CFG, num_pages=32, page_size=8, max_seqs=4,
                     pages_per_seq=8)
        reqs = [eng.submit(p, 7) for p in prompts]
        eng.run(burst=4)
        return [r.generated for r in reqs]

    assert gen_b != run_plain()


def test_repetition_penalty_applies_to_first_token(params):
    """The first token (sampled from prefill logits) must see the prompt's
    presence mask, not just later decode steps."""
    import jax.numpy as jnp

    from mfa_tpu.serve.engine import Engine
    from mfa_tpu.serve.sampling import SamplingParams

    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    pen = 1.7
    eng = Engine(params, CFG, num_pages=32, page_size=8, max_seqs=4,
                 pages_per_seq=8,
                 sampling=SamplingParams(temperature=0.0,
                                         repetition_penalty=pen))
    req = eng.submit(prompt, 3)
    eng.run(burst=2)

    logits = llama.forward(params, jnp.asarray([prompt], jnp.int32),
                           CFG)[0, -1]
    present = jnp.zeros((CFG.vocab_size,), bool).at[jnp.asarray(prompt)].set(True)
    penalized = jnp.where(present,
                          jnp.where(logits > 0, logits / pen, logits * pen),
                          logits)
    assert req.generated[0] == int(jnp.argmax(penalized))
