"""Decode path tests (reference: tests/test_flash_decoding.py).

Covers contiguous and paged caches, GQA, split sweeps, block-boundary
lengths, determinism, and a short generation-loop simulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu import flash_attn_with_kvcache
from mfa_tpu.kernels.decode import combine_splits, decode_attention
from mfa_tpu.ref.oracle import decode_ref, paged_decode_ref
from tests.utils import assert_close


def _decode_inputs(key, batch, heads, kv_heads, d, max_s, lengths, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (batch, 1, heads, d), dtype)
    k_cache = jax.random.normal(kk, (batch, max_s, kv_heads, d), dtype)
    v_cache = jax.random.normal(kv, (batch, max_s, kv_heads, d), dtype)
    lens = jnp.asarray(lengths, jnp.int32)
    return q, k_cache, v_cache, lens


@pytest.mark.parametrize("lengths", [[512, 512], [256, 511], [1, 300]])
def test_decode_contiguous(lengths):
    q, k, v, lens = _decode_inputs(jax.random.key(0), 2, 4, 4, 64, 512, lengths)
    out = flash_attn_with_kvcache(q, k, v, cache_seqlens=lens)
    ref = decode_ref(q, k, v, lens)
    assert_close(out, ref, msg=f"decode lens={lengths}")


def test_decode_gqa():
    q, k, v, lens = _decode_inputs(jax.random.key(1), 2, 8, 2, 64, 256, [256, 100])
    out = flash_attn_with_kvcache(q, k, v, cache_seqlens=lens)
    ref = decode_ref(q, k, v, lens)
    assert_close(out, ref, msg="decode gqa")


@pytest.mark.parametrize("num_splits", [1, 2, 4, 8])
def test_decode_splits(num_splits):
    # Reference split sweep: tests/test_flash_decoding.py:364
    q, k, v, lens = _decode_inputs(jax.random.key(2), 1, 2, 2, 64, 2048, [2000])
    out = flash_attn_with_kvcache(q, k, v, cache_seqlens=lens, num_splits=num_splits)
    ref = decode_ref(q, k, v, lens)
    assert_close(out, ref, msg=f"decode splits={num_splits}")


def test_decode_splits_block_k():
    # splits with uneven block coverage
    q, k, v, lens = _decode_inputs(jax.random.key(3), 2, 2, 2, 64, 640, [640, 130])
    out = decode_attention(
        q[:, 0].swapaxes(1, 1), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
        lens, num_splits=3, block_k=128,
    )
    ref = decode_ref(q, k, v, lens)
    assert_close(out[:, None], ref, msg="decode splits=3 block_k=128")


def test_decode_boundary_256_257():
    # Reference: tests/test_both_seqlens.py:14
    q, k, v, lens = _decode_inputs(jax.random.key(4), 2, 2, 2, 64, 512, [256, 257])
    out = flash_attn_with_kvcache(q, k, v, cache_seqlens=lens)
    ref = decode_ref(q, k, v, lens)
    assert_close(out, ref, msg="decode 256/257")


def test_decode_bf16():
    q, k, v, lens = _decode_inputs(
        jax.random.key(5), 2, 4, 4, 128, 512, [512, 384], dtype=jnp.bfloat16
    )
    out = flash_attn_with_kvcache(q, k, v, cache_seqlens=lens)
    ref = decode_ref(q, k, v, lens)
    assert_close(out, ref, dtype=jnp.bfloat16, msg="decode bf16")


def test_decode_determinism():
    q, k, v, lens = _decode_inputs(jax.random.key(6), 2, 4, 4, 64, 512, [512, 300])
    out1 = flash_attn_with_kvcache(q, k, v, cache_seqlens=lens, num_splits=4)
    out2 = flash_attn_with_kvcache(q, k, v, cache_seqlens=lens, num_splits=4)
    assert np.array_equal(np.asarray(out1), np.asarray(out2))


def test_combine_splits_math():
    # Split-combine must equal unsplit softmax exactly (up to fp assoc).
    key = jax.random.key(7)
    s = jax.random.normal(key, (1, 1, 256))  # scores for one row
    v = jax.random.normal(jax.random.key(8), (256, 64))
    p = jax.nn.softmax(s[0, 0])
    ref = p @ v
    # two splits of 128
    parts, lses = [], []
    for sl in (slice(0, 128), slice(128, 256)):
        sc = s[0, 0, sl]
        m = sc.max()
        w = jnp.exp(sc - m)
        parts.append((w @ v[sl]) / w.sum())
        lses.append(m + jnp.log(w.sum()))
    o_parts = jnp.stack(parts)[None, None]  # [1,1,2,64]
    lse = jnp.stack(lses)[None, None]  # [1,1,2]
    out = combine_splits(o_parts, lse, axis=2)[0, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


# ---------------- paged cache ----------------


def _paged_inputs(key, batch, heads, kv_heads, d, page, pages_per_seq, lengths,
                  dtype=jnp.float32, shuffle=True):
    num_pages = batch * pages_per_seq + 3
    kq, kk, kv, kt = jax.random.split(key, 4)
    q = jax.random.normal(kq, (batch, 1, heads, d), dtype)
    k_pages = jax.random.normal(kk, (num_pages, page, kv_heads, d), dtype)
    v_pages = jax.random.normal(kv, (num_pages, page, kv_heads, d), dtype)
    ids = jax.random.permutation(kt, num_pages)[: batch * pages_per_seq] if shuffle \
        else jnp.arange(batch * pages_per_seq)
    table = ids.reshape(batch, pages_per_seq).astype(jnp.int32)
    lens = jnp.asarray(lengths, jnp.int32)
    return q, k_pages, v_pages, table, lens


@pytest.mark.parametrize("page,pages_per_seq,lengths", [
    (128, 4, [512, 300]),
    (64, 8, [512, 70]),
    (16, 8, [128, 100]),  # page < kv tile: reference can't do this (SURVEY §2.4)
])
def test_paged_decode(page, pages_per_seq, lengths):
    q, kp, vp, table, lens = _paged_inputs(
        jax.random.key(9), 2, 4, 2, 64, page, pages_per_seq, lengths
    )
    out = flash_attn_with_kvcache(q, kp, vp, cache_seqlens=lens, block_table=table)
    ref = paged_decode_ref(q, kp, vp, lens, table)
    assert_close(out, ref, msg=f"paged page={page}")


def test_paged_decode_noncontiguous_table():
    # Manually scattered block ids (reference: test_varlen_block_table.py:411)
    q, kp, vp, table, lens = _paged_inputs(
        jax.random.key(10), 3, 4, 4, 128, 64, 4, [256, 130, 64], shuffle=True
    )
    out = flash_attn_with_kvcache(q, kp, vp, cache_seqlens=lens, block_table=table)
    ref = paged_decode_ref(q, kp, vp, lens, table)
    assert_close(out, ref, msg="paged scattered")


def test_generation_loop_paged():
    """10-step autoregressive append + decode parity
    (reference: tests/test_flash_decoding.py:520-628)."""
    batch, heads, kv_heads, d, page, pps = 2, 4, 2, 64, 64, 4
    key = jax.random.key(11)
    q0, kp, vp, table, lens = _paged_inputs(
        key, batch, heads, kv_heads, d, page, pps, [100, 37], shuffle=True
    )
    kp = np.array(kp)
    vp = np.array(vp)
    lens = np.array(lens)
    tbl = np.array(table)
    for step in range(10):
        kk, kv, kq, key = jax.random.split(jax.random.fold_in(key, step), 4)
        q = jax.random.normal(kq, (batch, 1, heads, d), jnp.float32)
        new_k = np.asarray(jax.random.normal(kk, (batch, kv_heads, d)))
        new_v = np.asarray(jax.random.normal(kv, (batch, kv_heads, d)))
        for b in range(batch):
            pos = lens[b]
            pid = tbl[b, pos // page]
            kp[pid, pos % page] = new_k[b]
            vp[pid, pos % page] = new_v[b]
            lens[b] += 1
        out = flash_attn_with_kvcache(
            q, jnp.asarray(kp), jnp.asarray(vp),
            cache_seqlens=jnp.asarray(lens), block_table=jnp.asarray(tbl),
        )
        ref = paged_decode_ref(
            q, jnp.asarray(kp), jnp.asarray(vp), jnp.asarray(lens), jnp.asarray(tbl)
        )
        assert_close(out, ref, msg=f"genloop step {step}")
