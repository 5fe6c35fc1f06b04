"""Paged KV-cache manager tests (mfa_tpu.cache.paged_cache)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.cache.paged_cache import (
    PageAllocator,
    append_token,
    create_cache,
    release_slot,
    write_prompt,
)
from mfa_tpu.kernels.paged import paged_attention
from mfa_tpu.kernels.quant import dequantize_rows
from mfa_tpu.ref.oracle import decode_ref


def test_allocator():
    a = PageAllocator(8)
    assert a.free_pages == 7  # page 0 reserved
    p = a.alloc(3)
    assert len(set(p)) == 3 and 0 not in p
    a.free(p)
    assert a.free_pages == 7
    with pytest.raises(MemoryError):
        a.alloc(100)


@pytest.mark.parametrize("quant", [None, "int8"])
def test_prompt_then_decode(quant):
    page, pps, kvh, d, heads = 16, 4, 2, 64, 4
    cache = create_cache(
        num_pages=16, page_size=page, num_kv_heads=kvh, head_dim=d,
        max_seqs=2, pages_per_seq=pps, dtype=jnp.float32, quant_dtype=quant,
    )
    alloc = PageAllocator(16)
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    L = 37
    k_prompt = jax.random.normal(k1, (L, kvh, d), jnp.float32)
    v_prompt = jax.random.normal(k2, (L, kvh, d), jnp.float32)
    pages = alloc.alloc(pps)
    cache = write_prompt(cache, 0, pages, k_prompt, v_prompt)
    assert int(cache.lengths[0]) == L

    # append two decode tokens
    for step in range(2):
        kk, vv, k3 = jax.random.split(k3, 3)
        nk = jax.random.normal(kk, (1, kvh, d), jnp.float32)
        nv = jax.random.normal(vv, (1, kvh, d), jnp.float32)
        cache = append_token(cache, jnp.asarray([0], jnp.int32), nk, nv)
        k_prompt = jnp.concatenate([k_prompt, nk])
        v_prompt = jnp.concatenate([v_prompt, nv])
    assert int(cache.lengths[0]) == L + 2

    # decode against the cache == oracle on the accumulated K/V
    q = jax.random.normal(k3, (1, heads, d), jnp.float32)
    out = paged_attention(
        q if quant is None else q.astype(jnp.bfloat16),
        cache.k_pages, cache.v_pages,
        cache.lengths[:1], cache.block_tables[:1],
        k_scales=cache.k_scales, v_scales=cache.v_scales,
    )
    if quant:
        k_full = dequantize_rows(cache.k_pages, cache.k_scales)
        v_full = dequantize_rows(cache.v_pages, cache.v_scales)
    else:
        k_full, v_full = cache.k_pages, cache.v_pages
    # oracle: gather this sequence's pages
    tbl = np.asarray(cache.block_tables[0])
    W = cache.k_pages.shape[-1]  # stored width (128-lane padded)
    kg = np.asarray(k_full)[:, tbl].reshape(kvh, -1, W)[..., :d]
    vg = np.asarray(v_full)[:, tbl].reshape(kvh, -1, W)[..., :d]
    kg = kg.swapaxes(0, 1)[None]
    vg = vg.swapaxes(0, 1)[None]
    ref = decode_ref(q[:, None], jnp.asarray(kg), jnp.asarray(vg), cache.lengths[:1])
    tol = 0.05 if quant else 1e-4
    diff = np.abs(np.asarray(out, np.float32) - np.asarray(ref[:, 0], np.float32)).max()
    assert diff < tol, f"cache decode diff {diff} (quant={quant})"
    # and matches direct accumulation
    ref2 = decode_ref(
        q[:, None], k_prompt[None], v_prompt[None],
        jnp.asarray([L + 2], jnp.int32),
    )
    diff2 = np.abs(np.asarray(out, np.float32) - np.asarray(ref2[:, 0], np.float32)).max()
    assert diff2 < (0.08 if quant else 1e-4)


def test_release_slot():
    cache = create_cache(8, 16, 1, 64, max_seqs=2, pages_per_seq=2,
                         dtype=jnp.float32)
    cache = write_prompt(
        cache, 1, [3, 4],
        jnp.ones((20, 1, 64)), jnp.ones((20, 1, 64)),
    )
    assert int(cache.lengths[1]) == 20
    cache = release_slot(cache, 1)
    assert int(cache.lengths[1]) == 0
    assert np.all(np.asarray(cache.block_tables[1]) == 0)


def test_release_slots_batched():
    # release_slots == N release_slot calls, in one scatter pair (the
    # engine defers finished slots into one flush — r5 serving fix)
    from mfa_tpu.cache.paged_cache import (create_stacked_cache,
                                           release_slot, release_slots)

    c = create_stacked_cache(2, 8, 4, 4, 16, 4, 4)
    c = dataclasses.replace(
        c,
        block_tables=jnp.arange(4 * 4, dtype=jnp.int32).reshape(4, 4) % 7,
        lengths=jnp.asarray([5, 9, 3, 7], jnp.int32),
    )
    a = release_slots(c, [1, 3])
    b = release_slot(release_slot(c, 1), 3)
    np.testing.assert_array_equal(np.asarray(a.block_tables),
                                  np.asarray(b.block_tables))
    np.testing.assert_array_equal(np.asarray(a.lengths),
                                  np.asarray(b.lengths))
