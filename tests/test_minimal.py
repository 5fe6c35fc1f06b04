"""Smallest paged-decode parity case (reference: tests/test_minimal.py).

The reference's minimal test is a single tiny paged decode checked against
the official flash_attn package; here the oracle is the pure-jnp reference
(mfa_tpu.ref.oracle.paged_decode_ref). Kept deliberately tiny so it is the
first thing to run when debugging a fresh install.
"""

import jax
import jax.numpy as jnp

from mfa_tpu import flash_attn_with_kvcache
from mfa_tpu.ref.oracle import paged_decode_ref
from tests.utils import assert_close


def test_minimal_paged_decode():
    batch, heads, kv_heads, d = 1, 2, 2, 64
    page, pages_per_seq = 64, 4
    num_pages = batch * pages_per_seq + 1
    key = jax.random.key(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (batch, 1, heads, d), jnp.float32)
    # Reference pool layout [num_pages, page, kv_heads, d]
    k_cache = jax.random.normal(kk, (num_pages, page, kv_heads, d), jnp.float32)
    v_cache = jax.random.normal(kv, (num_pages, page, kv_heads, d), jnp.float32)
    block_table = jnp.asarray([[3, 1, 4, 2]], jnp.int32)
    lens = jnp.asarray([200], jnp.int32)

    out = flash_attn_with_kvcache(
        q, k_cache, v_cache, cache_seqlens=lens, block_table=block_table
    )
    ref = paged_decode_ref(q, k_cache, v_cache, lens, block_table)
    assert_close(out, ref, tol=2e-5, msg="minimal paged decode")


def test_minimal_dense():
    """Smallest dense prefill case — one batch, one head, one tile."""
    from mfa_tpu import flash_attn_func
    from mfa_tpu.ref.oracle import attention_ref

    key = jax.random.key(1)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 128, 1, 64), jnp.float32)
    k = jax.random.normal(kk, (1, 128, 1, 64), jnp.float32)
    v = jax.random.normal(kv, (1, 128, 1, 64), jnp.float32)
    out = flash_attn_func(q, k, v)
    ref = attention_ref(q, k, v)
    assert_close(out, ref, tol=2e-5, msg="minimal dense prefill")
