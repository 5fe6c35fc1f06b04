"""Pipelined burst serving (Engine._run_pipelined).

run(burst>1) keeps up to PIPELINE_DEPTH decode bursts in flight, chaining
burst N+1's input token (and repetition-penalty presence) on device before
burst N's readback. These tests pin the correctness contract: token-for-
token parity with the synchronous loop across row-set changes (admission
waves, eos finishes), page pressure (preemption fallback), and the
presence-threaded sampling path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mfa_tpu.models import llama
from mfa_tpu.serve.engine import Engine

import pytest

CFG = llama.LlamaConfig.tiny(vocab=64, dim=64, layers=2, heads=4,
                             kv_heads=2, ffn=128, dtype=jnp.float32)


@pytest.fixture(scope="module")
def params():
    return llama.init_params(jax.random.key(0), CFG)


def _gen(params, prompts, max_new, *, pipeline, burst=4, eos=None,
         sampling=None, max_seqs=4, num_pages=64, stop=None):
    eng = Engine(params, CFG, num_pages=num_pages, page_size=8,
                 max_seqs=max_seqs, pages_per_seq=8, sampling=sampling)
    reqs = [eng.submit(p, max_new, eos_token=eos, stop=stop)
            for p in prompts]
    eng.run(burst=burst, pipeline=pipeline)
    assert eng.sched.allocator.free_pages == num_pages - 1  # recycled
    assert all(r.inflight == 0 for r in reqs)
    return [r.generated for r in reqs]


def test_pipeline_matches_sync(params):
    prompts = [[1, 2, 3], [5] * 11, [7, 8], [9, 10, 11, 12, 13]]
    a = _gen(params, prompts, 9, pipeline=True)
    b = _gen(params, prompts, 9, pipeline=False)
    assert a == b


def test_pipeline_admission_waves(params):
    """More requests than slots: finishes mid-pipeline free slots, new
    admissions join the row set while bursts are in flight (the device
    token-map chaining path)."""
    rs = np.random.RandomState(3)
    prompts = [list(rs.randint(1, CFG.vocab_size, 3 + i)) for i in range(7)]
    # staggered budgets so finishes interleave with dispatches
    eng_kw = dict(num_pages=64, page_size=8, max_seqs=2, pages_per_seq=8)

    def run(pipeline):
        eng = Engine(params, CFG, **eng_kw)
        reqs = [eng.submit(p, 4 + (i % 3) * 5)
                for i, p in enumerate(prompts)]
        eng.run(burst=4, pipeline=pipeline)
        assert all(r.inflight == 0 for r in reqs)
        return [r.generated for r in reqs]

    assert run(True) == run(False)


def test_pipeline_eos_midburst(params):
    prompt = [3, 1, 4, 1, 5]
    probe = _gen(params, [prompt], 3, pipeline=False)[0]
    eos = probe[1]
    a = _gen(params, [prompt], 9, pipeline=True, eos=eos)
    b = _gen(params, [prompt], 9, pipeline=False, eos=eos)
    assert a == b and len(a[0]) <= 9


def test_pipeline_repetition_penalty_presence(params):
    """Greedy + repetition penalty: presence rows must chain exactly
    (stable row sets) or force a pipeline flush (row changes) — outputs
    equal the synchronous loop either way."""
    from mfa_tpu.serve.sampling import SamplingParams

    sp = SamplingParams(repetition_penalty=1.4)
    prompts = [[1, 2, 3], [5] * 9, [8, 9]]
    a = _gen(params, prompts, 8, pipeline=True, sampling=sp)
    b = _gen(params, prompts, 8, pipeline=False, sampling=sp)
    assert a == b


def test_pipeline_page_pressure_preempts(params):
    """Page exhaustion mid-pipeline drains and falls back to the
    synchronous preempting path; outputs unchanged."""
    rs = np.random.RandomState(11)
    prompts = [list(rs.randint(1, CFG.vocab_size, 8)) for _ in range(2)]
    want = _gen(params, prompts, 20, pipeline=False, num_pages=32,
                max_seqs=2)

    eng = Engine(params, CFG, num_pages=8, page_size=8, max_seqs=2,
                 pages_per_seq=4)
    got = [eng.submit(p, 20) for p in prompts]
    stats = eng.run(burst=4, pipeline=True)
    assert stats.preemptions >= 1
    assert [r.generated for r in got] == want
    assert eng.sched.allocator.free_pages == 8 - 1


def test_pipeline_stochastic_budgets(params):
    """Seeded stochastic sampling under the pipelined loop: budgets and
    lifecycle hold (token parity with the sync loop is not required —
    admission interleaving may consume PRNG splits in a different
    order)."""
    from mfa_tpu.serve.sampling import SamplingParams

    sp = SamplingParams(temperature=0.9, top_p=0.9)
    rs = np.random.RandomState(7)
    prompts = [list(rs.randint(1, CFG.vocab_size, 4)) for _ in range(5)]
    eng = Engine(params, CFG, num_pages=64, page_size=8, max_seqs=4,
                 pages_per_seq=8, sampling=sp, seed=5)
    reqs = [eng.submit(p, 6) for p in prompts]
    eng.run(burst=4, pipeline=True)
    assert all(len(r.generated) == 6 for r in reqs)
    assert all(r.inflight == 0 for r in reqs)
    assert eng.sched.allocator.free_pages == 63
