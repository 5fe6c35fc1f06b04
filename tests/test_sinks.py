"""StreamingLLM attention sinks: with a sliding window, the first
`sink` tokens stay visible to every query. Covered across the prefill,
paged decode (incl. the double-buffer pipeline's sink-to-window gap
skipping), contiguous decode, and the serving engine."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.models import llama


def _prefill_oracle(q, k, v, wl, sinks):
    b, h, s, d = q.shape
    sc = jnp.einsum("bhqd,bhkd->bhqk", q, k) * d ** -0.5
    row = jnp.arange(s)[:, None]
    col = jnp.arange(s)[None, :]
    vis = (col <= row) & ((col >= row - wl) | (col < sinks))
    sc = jnp.where(vis, sc, -jnp.inf)
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(sc, -1), v)


def test_prefill_sinks_noncausal_gap_filled():
    """Regression: NON-causal window+sinks where the sink cells exactly
    fill the window-pruned gap made the cell count equal the full grid,
    selecting the rectangular kernel — whose run-gate and clamped kv index
    maps silently skip the sink blocks. Sinks must always take the
    triangular grid."""
    from mfa_tpu.kernels.prefill import prefill_attention

    b, h, s, d = 1, 2, 256, 64
    q = jax.random.normal(jax.random.key(3), (b, h, s, d))
    k = jax.random.normal(jax.random.key(4), (b, h, s, d))
    v = jax.random.normal(jax.random.key(5), (b, h, s, d))
    out = prefill_attention(q, k, v, causal=False, window_size=(0, -1),
                            sink_tokens=128, block_q=128, block_k=128)
    # oracle: row sees [row-0 .. end]? no — left window 0, no right bound
    row = jnp.arange(s)[:, None]
    col = jnp.arange(s)[None, :]
    vis = (col >= row) | (col < 128)  # wl=0: col >= row; plus sinks
    sc = jnp.einsum("bhqd,bhkd->bhqk", q, k) * d ** -0.5
    sc = jnp.where(vis, sc, -jnp.inf)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(sc, -1), v)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4


@pytest.mark.parametrize("wl,sinks,s", [(63, 10, 400), (31, 4, 130),
                                        (100, 140, 260)])
def test_prefill_sinks_match_oracle(wl, sinks, s):
    from mfa_tpu.kernels.prefill import prefill_attention

    b, h, d = 1, 2, 64
    q = jax.random.normal(jax.random.key(0), (b, h, s, d))
    k = jax.random.normal(jax.random.key(1), (b, h, s, d))
    v = jax.random.normal(jax.random.key(2), (b, h, s, d))
    out = prefill_attention(q, k, v, causal=True, window_size=(wl, -1),
                            sink_tokens=sinks, block_q=128, block_k=128)
    ref = _prefill_oracle(q, k, v, wl, sinks)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4


def test_paged_decode_sinks_match_oracle():
    from mfa_tpu.kernels.paged import paged_attention

    b, h, kvh, d, page, pps = 3, 4, 2, 64, 16, 16
    P = b * pps + 1
    kp = jax.random.normal(jax.random.key(1), (kvh, P, page, d))
    vp = jax.random.normal(jax.random.key(2), (kvh, P, page, d))
    table = jnp.arange(1, b * pps + 1, dtype=jnp.int32).reshape(b, pps)
    lens = jnp.asarray([250, 97, 16], jnp.int32)
    q = jax.random.normal(jax.random.key(0), (b, h, d))
    wl, sinks = 40, 12
    # small compute blocks force the pipeline across the sink->window gap
    out = paged_attention(q, kp, vp, lens, table, window_left=wl,
                          sink_tokens=sinks, pages_per_compute_block=2)
    kk = jnp.transpose(kp, (1, 2, 0, 3))[table].reshape(b, -1, kvh, d)
    vv = jnp.transpose(vp, (1, 2, 0, 3))[table].reshape(b, -1, kvh, d)
    kg = jnp.repeat(jnp.swapaxes(kk, 1, 2), h // kvh, 1)
    vg = jnp.repeat(jnp.swapaxes(vv, 1, 2), h // kvh, 1)
    sc = jnp.einsum("bhd,bhSd->bhS", q, kg) * d ** -0.5
    col = jnp.arange(pps * page)[None, None]
    pos = (lens - 1)[:, None, None]
    vis = (col < lens[:, None, None]) & ((col >= pos - wl) | (col < sinks))
    ref = jnp.einsum("bhS,bhSd->bhd",
                     jax.nn.softmax(jnp.where(vis, sc, -jnp.inf), -1), vg)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4
    # and sinks actually matter for the long row
    out0 = paged_attention(q, kp, vp, lens, table, window_left=wl,
                           pages_per_compute_block=2)
    assert float(jnp.max(jnp.abs(out - out0))) > 1e-4


def test_contiguous_decode_sinks_match_oracle():
    from mfa_tpu.kernels.decode import decode_attention

    b, h, kvh, d, s = 2, 4, 2, 64, 300
    q = jax.random.normal(jax.random.key(0), (b, h, d))
    k = jax.random.normal(jax.random.key(1), (b, kvh, s, d))
    v = jax.random.normal(jax.random.key(2), (b, kvh, s, d))
    lens = jnp.asarray([288, 100], jnp.int32)
    wl, sinks = 50, 7
    out = decode_attention(q, k, v, lens, window_left=wl, sink_tokens=sinks,
                           block_k=128)
    kg = jnp.repeat(k, h // kvh, 1)
    vg = jnp.repeat(v, h // kvh, 1)
    sc = jnp.einsum("bhd,bhSd->bhS", q, kg) * d ** -0.5
    col = jnp.arange(s)[None, None]
    pos = (lens - 1)[:, None, None]
    vis = (col < lens[:, None, None]) & ((col >= pos - wl) | (col < sinks))
    ref = jnp.einsum("bhS,bhSd->bhd",
                     jax.nn.softmax(jnp.where(vis, sc, -jnp.inf), -1), vg)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4


CFG_SINK = dataclasses.replace(
    llama.LlamaConfig.tiny(vocab=64, dim=64, layers=2, heads=4, kv_heads=2,
                           ffn=96, dtype=jnp.float32),
    sliding_window=24, attn_sinks=4,
)


def test_engine_sinks_burst_matches_stepwise():
    from mfa_tpu.serve.engine import Engine

    params = llama.init_params(jax.random.key(0), CFG_SINK)
    prompts = [[1, 2, 3] * 12, [5] * 9]  # first prompt exceeds the window

    def run(burst):
        eng = Engine(params, CFG_SINK, num_pages=48, page_size=8, max_seqs=4,
                     pages_per_seq=12)
        reqs = [eng.submit(p, 6) for p in prompts]
        eng.run(burst=burst)
        return [r.generated for r in reqs]

    gen = run(4)
    assert gen == run(1)
    # sinks change the output vs plain sliding window
    cfg_nosink = dataclasses.replace(CFG_SINK, attn_sinks=0)
    eng = Engine(params, cfg_nosink, num_pages=48, page_size=8, max_seqs=4,
                 pages_per_seq=12)
    reqs = [eng.submit(p, 6) for p in prompts]
    eng.run(burst=4)
    assert gen[0] != reqs[0].generated


def test_engine_sinks_chunked_matches_whole():
    params = llama.init_params(jax.random.key(1), CFG_SINK)
    prompt = list(np.random.RandomState(0).randint(0, 64, 45))
    pages = list(range(1, 9))

    cache_a = llama.build_kv_caches(CFG_SINK, 16, 8, 2, 8)
    cache_a, la = llama.prefill_step(params, CFG_SINK, cache_a, 0, pages,
                                     jnp.asarray(prompt, jnp.int32))
    cache_b = llama.build_kv_caches(CFG_SINK, 16, 8, 2, 8)
    lb = None
    for pos in range(0, len(prompt), 16):
        cache_b, lb = llama.prefill_chunk(
            params, CFG_SINK, cache_b, 0, pages, prompt[pos:pos + 16],
            pos, len(prompt))
    np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                               atol=2e-4, rtol=1e-4)


def test_public_kvcache_api_sinks():
    import mfa_tpu

    b, h, d, s = 2, 4, 64, 200
    q = jax.random.normal(jax.random.key(0), (b, 1, h, d))
    kc = jax.random.normal(jax.random.key(1), (b, s, 2, d))
    vc = jax.random.normal(jax.random.key(2), (b, s, 2, d))
    lens = jnp.asarray([180, 60], jnp.int32)
    wl, sinks = 30, 5
    out = mfa_tpu.flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=lens, window_size=(wl, -1),
        sink_tokens=sinks)[:, 0]
    kg = jnp.repeat(jnp.swapaxes(kc, 1, 2), 2, 1)
    vg = jnp.repeat(jnp.swapaxes(vc, 1, 2), 2, 1)
    sc = jnp.einsum("bshd,bhSd->bhsS", q, kg)[:, :, 0] * d ** -0.5
    col = jnp.arange(s)[None, None]
    pos = (lens - 1)[:, None, None]
    vis = (col < lens[:, None, None]) & ((col >= pos - wl) | (col < sinks))
    ref = jnp.einsum("bhS,bhSd->bhd",
                     jax.nn.softmax(jnp.where(vis, sc, -jnp.inf), -1), vg)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4


def test_interaction_int4_window_sinks_penalty():
    """Feature-combination catch-all: int4 KV + sliding window + sinks +
    repetition penalty + burst decode must equal the stepwise run and
    produce finite logprobs end-to-end."""
    from mfa_tpu.serve.engine import Engine
    from mfa_tpu.serve.sampling import SamplingParams

    cfg = dataclasses.replace(
        llama.LlamaConfig.tiny(vocab=64, dim=64, layers=2, heads=4,
                               kv_heads=2, ffn=96, dtype=jnp.float32),
        sliding_window=24, attn_sinks=4,
    )
    params = llama.init_params(jax.random.key(7), cfg)
    sampling = SamplingParams(temperature=0.0, repetition_penalty=1.5)
    prompts = [[1, 2, 3] * 11, [5] * 7]

    def run(burst):
        eng = Engine(params, cfg, num_pages=48, page_size=8, max_seqs=4,
                     pages_per_seq=12, quant_dtype="int4",
                     sampling=sampling)
        reqs = [eng.submit(p, 6) for p in prompts]
        eng.run(burst=burst)
        assert eng.sched.allocator.free_pages == 47
        for r in reqs:
            assert len(r.generated) == 6
            assert np.isfinite(r.logprobs).all()
        return [r.generated for r in reqs]

    assert run(3) == run(1)


@pytest.mark.parametrize("wl,sinks,s", [(63, 8, 256), (127, 16, 300)])
def test_sinks_backward_grad_parity(wl, sinks, s):
    """Round-4 stretch (VERDICT r3 next #9): StreamingLLM models must
    FINE-TUNE with the same sinked-window attention they serve. The
    fused backward kernel gets sink-prefix cell tables + sink-aware
    masks; gradients must match the dense jnp oracle."""
    from mfa_tpu.kernels.autodiff import flash_attention_grad

    b, h, d = 1, 2, 64
    key = jax.random.key(wl)
    q = jax.random.normal(jax.random.key(1), (b, h, s, d))
    k = jax.random.normal(jax.random.key(2), (b, h, s, d))
    v = jax.random.normal(jax.random.key(3), (b, h, s, d))
    do = jax.random.normal(key, (b, h, s, d))

    def loss_kernel(q, k, v):
        out = flash_attention_grad(q, k, v, True, None, (wl, -1), 0.0,
                                   sinks)
        return jnp.sum(out * do)

    def loss_dense(q, k, v):
        sc = jnp.einsum("bhqd,bhkd->bhqk", q, k) * d ** -0.5
        row = jnp.arange(s)[:, None]
        col = jnp.arange(s)[None, :]
        vis = (col <= row) & ((col >= row - wl) | (col < sinks))
        sc = jnp.where(vis, sc, -jnp.inf)
        out = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(sc, -1), v)
        return jnp.sum(out * do)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for name, a, bb in zip("qkv", gk, gd):
        dmax = float(jnp.abs(a - bb).max())
        assert dmax < 2e-4, f"d{name} maxdiff {dmax} (wl={wl} sinks={sinks})"
