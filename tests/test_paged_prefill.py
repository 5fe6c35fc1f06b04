"""Paged prefill kernel (chunk attention against a paged cache) vs oracle.

Each query row r of sequence b sits at absolute position q_start[b]+r and
attends causally to the paged prefix. Oracle: gather the pages to a
contiguous cache and run masked softmax attention in fp32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.kernels.paged_prefill import paged_prefill_attention
from tests.utils import assert_close


def _oracle(q, pool_k, pool_v, lens, q_start, table, window_left=-1,
            window_right=0, sinks=0):
    """q [b, sq, h, d]; pool [hkv, pages, page, d]. window_right 0 is the
    causal band; -1 unbounded (non-causal)."""
    b, sq, h, d = q.shape
    hkv, _, page, _ = pool_k.shape
    group = h // hkv
    pps = table.shape[1]
    k = pool_k[:, table].reshape(hkv, b, pps * page, d)  # [hkv, b, S, d]
    v = pool_v[:, table].reshape(hkv, b, pps * page, d)
    k = jnp.repeat(k, group, axis=0)  # [h, b, S, d]
    v = jnp.repeat(v, group, axis=0)
    qf = q.astype(jnp.float32)
    scores = jnp.einsum("bshd,hbSd->bhsS", qf, k.astype(jnp.float32))
    scores *= d ** -0.5
    pos = q_start[:, None] + jnp.arange(sq)[None]  # [b, sq]
    col = jnp.arange(pps * page)
    vis = col[None, None] < lens[:, None, None]
    if window_right >= 0:
        vis &= col[None, None] <= pos[..., None] + window_right
    if window_left >= 0:
        in_win = col[None, None] >= pos[..., None] - window_left
        if sinks:
            in_win |= col[None, None] < sinks
        vis &= in_win
    scores = jnp.where(vis[:, None], scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    p = jnp.where(jnp.isnan(p), 0.0, p)
    out = jnp.einsum("bhsS,hbSd->bshd", p, v.astype(jnp.float32))
    return out


def _setup(batch, hkv, pps, page, d, key=0):
    num_pages = batch * pps + 1
    kk, kv = jax.random.split(jax.random.key(key))
    pool_k = jax.random.normal(kk, (hkv, num_pages, page, d), jnp.float32)
    pool_v = jax.random.normal(kv, (hkv, num_pages, page, d), jnp.float32)
    table = (
        jax.random.permutation(jax.random.key(key + 1), num_pages - 1)[
            : batch * pps] + 1
    ).reshape(batch, pps).astype(jnp.int32)
    return pool_k, pool_v, table


@pytest.mark.parametrize("offsets,chunk", [
    ([0, 0], 64),          # plain prefill from scratch
    ([128, 64], 64),       # mid-prompt chunks at different offsets
    ([192, 0], 128),       # ragged: one row's chunk is partially dead
])
def test_paged_prefill_vs_oracle(offsets, chunk):
    batch, hkv, group, d, page, pps = 2, 2, 2, 64, 64, 6
    h = hkv * group
    pool_k, pool_v, table = _setup(batch, hkv, pps, page, d)
    q = jax.random.normal(jax.random.key(9), (batch, chunk, h, d), jnp.float32)
    q_start = jnp.asarray(offsets, jnp.int32)
    lens = q_start + chunk
    if offsets == [192, 0]:  # second row: only 100 real rows in the chunk
        lens = jnp.asarray([192 + chunk, 100], jnp.int32)

    out = paged_prefill_attention(q, pool_k, pool_v, lens, q_start, table)
    ref = _oracle(q, pool_k, pool_v, lens, q_start, table)
    rows = np.asarray(lens - q_start)
    for b in range(batch):
        assert_close(out[b, : rows[b]], ref[b, : rows[b]], tol=2e-5,
                     msg=f"seq {b} offsets={offsets}")


def test_paged_prefill_windowed():
    batch, hkv, group, d, page, pps = 1, 2, 2, 64, 64, 6
    h = hkv * group
    pool_k, pool_v, table = _setup(batch, hkv, pps, page, d, key=5)
    chunk, off, window = 128, 128, 63
    q = jax.random.normal(jax.random.key(2), (batch, chunk, h, d), jnp.float32)
    q_start = jnp.asarray([off], jnp.int32)
    lens = jnp.asarray([off + chunk], jnp.int32)
    out = paged_prefill_attention(q, pool_k, pool_v, lens, q_start, table,
                                  window_left=window)
    ref = _oracle(q, pool_k, pool_v, lens, q_start, table, window_left=window)
    assert_close(out[0], ref[0], tol=2e-5, msg="windowed paged prefill")


@pytest.mark.parametrize("wl,wr", [
    (63, 40),    # bidirectional local band
    (-1, 40),    # right bound only
    (63, -1),    # left bound only, unbounded right (non-causal)
])
def test_paged_prefill_noncausal_band(wl, wr):
    """Non-causal (left, right) bands: row at q_start+r sees columns in
    [pos-wl, pos+wr] (either side unbounded at -1) — reference window
    semantics on the paged route. The chunk sits mid-cache so both band
    edges cross page boundaries."""
    batch, hkv, group, d, page, pps = 2, 2, 2, 64, 64, 6
    h = hkv * group
    pool_k, pool_v, table = _setup(batch, hkv, pps, page, d, key=7)
    chunk = 128
    q = jax.random.normal(jax.random.key(4), (batch, chunk, h, d), jnp.float32)
    q_start = jnp.asarray([128, 0], jnp.int32)
    lens = jnp.asarray([128 + chunk + 96, chunk], jnp.int32)  # kv past q
    out = paged_prefill_attention(
        q, pool_k, pool_v, lens, q_start, table, causal=False,
        q_lens=jnp.asarray([chunk, chunk], jnp.int32),
        window_left=wl, window_right=wr)
    ref = _oracle(q, pool_k, pool_v, lens, q_start, table,
                  window_left=wl, window_right=wr)
    for b in range(batch):
        assert_close(out[b], ref[b], tol=2e-5,
                     msg=f"noncausal band wl={wl} wr={wr} seq {b}")


def test_paged_prefill_noncausal_band_sinks():
    """Sinks with a non-causal band (newly reachable: sinks gate on the
    left window only): the first `sinks` columns stay visible to every
    row alongside the [pos-wl, pos+wr] band."""
    batch, hkv, group, d, page, pps = 1, 2, 2, 64, 64, 6
    h = hkv * group
    pool_k, pool_v, table = _setup(batch, hkv, pps, page, d, key=9)
    chunk, wl, wr, sinks = 128, 63, 40, 16
    q = jax.random.normal(jax.random.key(6), (batch, chunk, h, d), jnp.float32)
    q_start = jnp.asarray([192], jnp.int32)
    lens = jnp.asarray([192 + chunk + 40], jnp.int32)
    out = paged_prefill_attention(
        q, pool_k, pool_v, lens, q_start, table, causal=False,
        q_lens=jnp.asarray([chunk], jnp.int32),
        window_left=wl, window_right=wr, sink_tokens=sinks)
    ref = _oracle(q, pool_k, pool_v, lens, q_start, table,
                  window_left=wl, window_right=wr, sinks=sinks)
    assert_close(out[0], ref[0], tol=2e-5, msg="noncausal band + sinks")


def test_paged_prefill_quantized():
    from mfa_tpu.kernels.quant import quantize_rows

    batch, hkv, group, d, page, pps = 1, 2, 2, 128, 128, 4
    h = hkv * group
    pool_k, pool_v, table = _setup(batch, hkv, pps, page, d, key=11)
    kq, ks = quantize_rows(pool_k, "int8")
    vq, vs = quantize_rows(pool_v, "int8")
    chunk, off = 128, 256
    q = jax.random.normal(jax.random.key(3), (batch, chunk, h, d), jnp.float32)
    q_start = jnp.asarray([off], jnp.int32)
    lens = jnp.asarray([off + chunk], jnp.int32)
    out = paged_prefill_attention(q, kq, vq, lens, q_start, table,
                                  k_scales=ks, v_scales=vs)
    deq_k = kq.astype(jnp.float32) * ks[..., None]
    deq_v = vq.astype(jnp.float32) * vs[..., None]
    ref = _oracle(q, deq_k, deq_v, lens, q_start, table)
    assert_close(out[0], ref[0], tol=3e-2, msg="quantized paged prefill")
