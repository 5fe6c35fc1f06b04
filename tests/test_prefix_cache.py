"""Prefix caching: shared prompt pages, refcounts, eviction, correctness.

Shared-prefix requests alias the same physical pages through their block
tables (pure metadata — kernels unchanged); outputs must be identical to
uncached runs, pages must never leak, and idle entries must be reclaimed
under allocation pressure.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mfa_tpu.models import llama
from mfa_tpu.serve.engine import Engine
from mfa_tpu.serve.scheduler import PrefixCache, Request

CFG = llama.LlamaConfig.tiny(vocab=64, dim=64, layers=2, heads=4, kv_heads=2,
                             ffn=96, dtype=jnp.float32)
PAGE = 8


def _params():
    return llama.init_params(jax.random.key(0), CFG)


def test_prefix_cache_unit():
    from mfa_tpu.cache.paged_cache import PageAllocator

    pc = PrefixCache(page_size=4)
    alloc = PageAllocator(16)
    prompt = [1, 2, 3, 4, 5, 6, 7, 8, 9]  # 2 full pages (last token held out)
    keys, pages = pc.match(prompt)
    assert keys == [] and pages == []
    req = Request(0, prompt, 4)
    req.pages = alloc.alloc(3)
    pc.register(req)
    assert len(req.prefix_keys) == 2
    # a second identical prompt hits both pages
    keys2, pages2 = pc.match(prompt)
    assert pages2 == req.pages[:2]
    # divergent second page -> only first page hits
    other = prompt[:4] + [9, 9, 9, 9, 9]
    keys3, pages3 = pc.match(other)
    assert pages3 == req.pages[:1]
    pc.release(keys2)
    pc.release(keys3)
    pc.release(req.prefix_keys)
    assert len(pc.idle) == 2
    freed = pc.evict(10, alloc)
    assert freed == 2 and not pc.pages


def test_prefix_cached_engine_matches_uncached():
    params = _params()
    shared = list(np.random.RandomState(0).randint(0, CFG.vocab_size, 21))
    prompts = [shared + [7], shared + [9, 9], shared[:10] + [3],
               list(shared)]

    def run(prefix):
        eng = Engine(params, CFG, num_pages=64, page_size=PAGE, max_seqs=4,
                     pages_per_seq=8, prefix_cache=prefix)
        reqs = [eng.submit(p, 4) for p in prompts]
        eng.run()
        return [r.generated for r in reqs], eng

    gen_c, eng = run(True)
    gen_u, _ = run(False)
    assert gen_c == gen_u, f"{gen_c} vs {gen_u}"
    # after completion entries are idle but retained; no page leaked:
    # free + idle-retained must equal the initial free count
    retained = len(eng.sched.prefix.pages)
    assert eng.sched.allocator.free_pages + retained == 63
    assert retained > 0  # the shared prefix stayed cached


def test_prefix_cache_hit_skips_prefill_work():
    params = _params()
    shared = list(np.random.RandomState(1).randint(0, CFG.vocab_size, 24))

    eng = Engine(params, CFG, num_pages=64, page_size=PAGE, max_seqs=4,
                 pages_per_seq=8, prefix_cache=True)
    r1 = eng.submit(shared + [5], 3)
    eng.run()
    t1 = eng.stats.prefill_tokens
    r2 = eng.submit(shared + [6], 3)
    eng.run()
    t2 = eng.stats.prefill_tokens - t1
    # 24 shared tokens = 3 full pages cached; only the suffix is prefilled
    assert t2 <= len(shared) + 1 - 3 * PAGE + PAGE  # suffix only
    assert r2.generated and len(r2.generated) == 3


def test_prefix_cache_eviction_under_pressure():
    params = _params()
    eng = Engine(params, CFG, num_pages=14, page_size=PAGE, max_seqs=2,
                 pages_per_seq=6, prefix_cache=True)
    # first request caches 2 pages worth of prefix, then finishes (idle)
    p1 = list(np.random.RandomState(2).randint(0, CFG.vocab_size, 17))
    eng.submit(p1, 2)
    eng.run()
    assert len(eng.sched.prefix.pages) == 2
    # a large unrelated request needs more pages than are free -> eviction
    p2 = list(np.random.RandomState(3).randint(0, CFG.vocab_size, 40))
    r2 = eng.submit(p2, 2)
    eng.run()
    assert len(r2.generated) == 2


def test_prefix_cache_invalidated_on_recovery():
    """recover() rebuilds zeroed page pools; stale prefix entries must not
    alias them (would silently generate from zeroed KV)."""
    params = _params()
    prompt = list(np.random.RandomState(7).randint(0, CFG.vocab_size, 20))

    fresh = Engine(params, CFG, num_pages=64, page_size=PAGE, max_seqs=4,
                   pages_per_seq=8, prefix_cache=True)
    r0 = fresh.submit(prompt, 4)
    fresh.run()

    eng = Engine(params, CFG, num_pages=64, page_size=PAGE, max_seqs=4,
                 pages_per_seq=8, prefix_cache=True)
    r1 = eng.submit(prompt, 4)
    eng.run()
    assert r1.generated == r0.generated
    eng.recover()
    assert not eng.sched.prefix.pages, "stale entries must be evicted"
    r2 = eng.submit(prompt, 4)
    eng.run()
    assert r2.generated == r0.generated, (
        f"post-recovery generation from stale shared pages: "
        f"{r2.generated} vs {r0.generated}")
