"""Sliding-window decode (contiguous + paged) vs windowed oracle.

The reference carries window params but never exposes them from Python
(_C.pyi:4-41, SURVEY.md §0); here windowed decode is first-class — the
enabling feature for Mistral-style sliding-window serving where the KV
visibility is capped at W tokens.
"""

import jax
import jax.numpy as jnp
import pytest

from mfa_tpu import flash_attn_with_kvcache
from mfa_tpu.ref.oracle import decode_ref, paged_decode_ref
from tests.utils import assert_close


@pytest.mark.parametrize("lengths,window", [
    ([512, 512], 127),
    ([256, 511], 63),
    ([300, 1], 255),      # window larger than one row's whole cache
    ([700, 640], 511),
])
def test_window_decode_contiguous(lengths, window):
    key = jax.random.key(0)
    kq, kk, kv = jax.random.split(key, 3)
    batch, heads, kv_heads, d, max_s = len(lengths), 4, 2, 64, 768
    q = jax.random.normal(kq, (batch, 1, heads, d), jnp.float32)
    k = jax.random.normal(kk, (batch, max_s, kv_heads, d), jnp.float32)
    v = jax.random.normal(kv, (batch, max_s, kv_heads, d), jnp.float32)
    lens = jnp.asarray(lengths, jnp.int32)
    out = flash_attn_with_kvcache(
        q, k, v, cache_seqlens=lens, window_size=(window, -1)
    )
    ref = decode_ref(q, k, v, lens, window_left=window)
    assert_close(out, ref, tol=2e-5, msg=f"window={window}")


def test_window_equals_full_when_wide():
    """window >= length-1 must be bit-identical to unbounded decode."""
    import numpy as np

    key = jax.random.key(1)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 1, 4, 64), jnp.float32)
    k = jax.random.normal(kk, (2, 256, 4, 64), jnp.float32)
    v = jax.random.normal(kv, (2, 256, 4, 64), jnp.float32)
    lens = jnp.asarray([256, 100], jnp.int32)
    full = flash_attn_with_kvcache(q, k, v, cache_seqlens=lens)
    wide = flash_attn_with_kvcache(
        q, k, v, cache_seqlens=lens, window_size=(4096, -1)
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(wide))


@pytest.mark.parametrize("window", [63, 127, 300])
def test_window_decode_paged(window):
    batch, heads, kv_heads, d = 3, 4, 2, 64
    page, pages_per_seq = 64, 6
    num_pages = batch * pages_per_seq + 1
    key = jax.random.key(2)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (batch, 1, heads, d), jnp.float32)
    k_cache = jax.random.normal(kk, (num_pages, page, kv_heads, d), jnp.float32)
    v_cache = jax.random.normal(kv, (num_pages, page, kv_heads, d), jnp.float32)
    table = (
        jax.random.permutation(jax.random.key(3), num_pages - 1)[
            : batch * pages_per_seq
        ]
        + 1
    ).reshape(batch, pages_per_seq).astype(jnp.int32)
    lens = jnp.asarray([page * pages_per_seq, 200, 65], jnp.int32)
    out = flash_attn_with_kvcache(
        q, k_cache, v_cache, cache_seqlens=lens, block_table=table,
        window_size=(window, -1),
    )
    ref = paged_decode_ref(q, k_cache, v_cache, lens, table,
                           window_left=window)
    assert_close(out, ref, tol=2e-5, msg=f"paged window={window}")


def test_window_decode_paged_quantized():
    """Windowed + int8-quantized paged decode stays within quant tolerance."""
    from mfa_tpu.kernels.paged import paged_attention
    from mfa_tpu.kernels.quant import quantize_rows

    batch, heads, kv_heads, d = 2, 4, 2, 128
    page, pps = 128, 4
    num_pages = batch * pps + 1
    kq_, kk_, kv_ = jax.random.split(jax.random.key(4), 3)
    q = jax.random.normal(kq_, (batch, heads, d), jnp.float32)
    k_pages = jax.random.normal(kk_, (kv_heads, num_pages, page, d))
    v_pages = jax.random.normal(kv_, (kv_heads, num_pages, page, d))
    kq, ks = quantize_rows(k_pages, "int8")
    vq, vs = quantize_rows(v_pages, "int8")
    table = jnp.arange(1, 1 + batch * pps, dtype=jnp.int32).reshape(batch, pps)
    lens = jnp.asarray([512, 300], jnp.int32)
    window = 255
    out = paged_attention(q, kq, vq, lens, table, k_scales=ks, v_scales=vs,
                          window_left=window)
    # oracle on the dequantized pool
    pool_k = jnp.transpose(kq.astype(jnp.float32) * ks[..., None], (1, 2, 0, 3))
    pool_v = jnp.transpose(vq.astype(jnp.float32) * vs[..., None], (1, 2, 0, 3))
    ref = paged_decode_ref(q[:, None], pool_k, pool_v, lens, table,
                           window_left=window)[:, 0]
    assert_close(out, ref, tol=3e-2, msg="quantized windowed paged decode")


def test_sliding_window_model_incremental_matches_forward():
    """Mistral-style config: prefill+decode through the paged cache must
    match the full windowed forward (teacher forcing) — the end-to-end
    check that prefill window masking and decode window_left agree."""
    import numpy as np

    from mfa_tpu.models import llama

    cfg = llama.LlamaConfig.tiny(vocab=64, dim=64, layers=2, heads=4,
                                 kv_heads=2, ffn=96, dtype=jnp.float32)
    cfg = llama.LlamaConfig(**{**cfg.__dict__, "sliding_window": 8})
    params = llama.init_params(jax.random.key(0), cfg)
    prompt = list(np.random.RandomState(0).randint(0, cfg.vocab_size, 13))
    cache = llama.build_kv_caches(cfg, num_pages=16, page_size=8,
                                  max_seqs=2, pages_per_seq=8)
    cache, logits = llama.prefill_step(
        params, cfg, cache, 0, list(range(1, 9)),
        jnp.asarray(prompt, jnp.int32)
    )
    seq = list(prompt)
    inc = [np.asarray(logits)]
    for _ in range(3):
        tok = int(np.argmax(inc[-1]))
        seq.append(tok)
        cache, lg = llama.decode_step(
            params, cfg, cache,
            jnp.asarray([0], jnp.int32), jnp.asarray([tok], jnp.int32),
        )
        inc.append(np.asarray(lg[0]))
    full = np.asarray(llama.forward(params, jnp.asarray([seq], jnp.int32), cfg))[0]
    for i, il in enumerate(inc):
        pos = len(prompt) - 1 + i
        diff = np.abs(il - full[pos]).max()
        assert diff < 2e-3, f"windowed incremental diverges at step {i}: {diff}"
