"""Batched-vs-solo consistency (reference: tests/test_output_compare.py).

The reference checks that decoding a batch of sequences gives bitwise the
same per-sequence output as decoding each sequence alone (batch
independence of the decode path); same invariant here, on both the
contiguous and paged cache paths.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mfa_tpu import flash_attn_with_kvcache


def _inputs(key, batch, heads, kv_heads, d, max_s, dtype=jnp.float32):
    kq, kk, kv, kl = jax.random.split(key, 4)
    q = jax.random.normal(kq, (batch, 1, heads, d), dtype)
    k = jax.random.normal(kk, (batch, max_s, kv_heads, d), dtype)
    v = jax.random.normal(kv, (batch, max_s, kv_heads, d), dtype)
    lens = jax.random.randint(kl, (batch,), 1, max_s + 1).astype(jnp.int32)
    return q, k, v, lens


def test_batched_vs_solo_decode():
    batch, heads, kv_heads, d, max_s = 4, 4, 2, 64, 384
    q, k, v, lens = _inputs(jax.random.key(0), batch, heads, kv_heads, d, max_s)
    batched = np.asarray(flash_attn_with_kvcache(q, k, v, cache_seqlens=lens))
    for i in range(batch):
        solo = np.asarray(
            flash_attn_with_kvcache(
                q[i : i + 1], k[i : i + 1], v[i : i + 1],
                cache_seqlens=lens[i : i + 1],
            )
        )
        # Same kernel, same per-sequence tile schedule -> bitwise equal.
        np.testing.assert_array_equal(
            batched[i : i + 1], solo, err_msg=f"decode row {i} differs solo"
        )


def test_batched_vs_solo_paged_decode():
    batch, heads, kv_heads, d = 3, 4, 2, 64
    page, pages_per_seq = 64, 3
    num_pages = batch * pages_per_seq + 1
    key = jax.random.key(1)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (batch, 1, heads, d), jnp.float32)
    k_cache = jax.random.normal(kk, (num_pages, page, kv_heads, d), jnp.float32)
    v_cache = jax.random.normal(kv, (num_pages, page, kv_heads, d), jnp.float32)
    table = (
        jax.random.permutation(jax.random.key(2), num_pages - 1)[
            : batch * pages_per_seq
        ]
        + 1
    ).reshape(batch, pages_per_seq).astype(jnp.int32)
    lens = jnp.asarray([page * pages_per_seq, 100, 65], jnp.int32)

    batched = np.asarray(
        flash_attn_with_kvcache(
            q, k_cache, v_cache, cache_seqlens=lens, block_table=table
        )
    )
    for i in range(batch):
        solo = np.asarray(
            flash_attn_with_kvcache(
                q[i : i + 1], k_cache, v_cache,
                cache_seqlens=lens[i : i + 1], block_table=table[i : i + 1],
            )
        )
        np.testing.assert_array_equal(
            batched[i : i + 1], solo, err_msg=f"paged decode row {i} differs solo"
        )
