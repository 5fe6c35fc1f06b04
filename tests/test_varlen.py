"""Varlen (packed continuous batching) tests (reference: tests/test_varlen.py
and tests/test_varlen_block_table.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu import flash_attn_varlen_func
from mfa_tpu.ref.oracle import varlen_attention_ref
from tests.utils import assert_close


def _pack(key, seqlens_q, seqlens_k, heads, kv_heads, d, dtype=jnp.float32):
    tq, tk = sum(seqlens_q), sum(seqlens_k)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (tq, heads, d), dtype)
    k = jax.random.normal(kk, (tk, kv_heads, d), dtype)
    v = jax.random.normal(kv, (tk, kv_heads, d), dtype)
    cu_q = np.concatenate([[0], np.cumsum(seqlens_q)]).astype(np.int32)
    cu_k = np.concatenate([[0], np.cumsum(seqlens_k)]).astype(np.int32)
    return q, k, v, cu_q, cu_k


@pytest.mark.parametrize("seqlens", [[128, 256, 512], [128, 128], [64, 100, 30, 200]])
def test_varlen_uniform_and_ragged(seqlens):
    q, k, v, cu_q, cu_k = _pack(jax.random.key(0), seqlens, seqlens, 4, 4, 64)
    out = flash_attn_varlen_func(q, k, v, cu_q, cu_k, max(seqlens), max(seqlens))
    ref = varlen_attention_ref(q, k, v, cu_q, cu_k)
    assert_close(out, ref, msg=f"varlen {seqlens}")


@pytest.mark.parametrize("seqlens", [[128, 256], [100, 37, 300]])
def test_varlen_causal(seqlens):
    q, k, v, cu_q, cu_k = _pack(jax.random.key(1), seqlens, seqlens, 4, 4, 64)
    out = flash_attn_varlen_func(
        q, k, v, cu_q, cu_k, max(seqlens), max(seqlens), causal=True
    )
    ref = varlen_attention_ref(q, k, v, cu_q, cu_k, causal=True)
    assert_close(out, ref, msg=f"varlen causal {seqlens}")


def test_varlen_gqa():
    # BASELINE.json config 3: cu_seqlens [128,256,512], 32 q / 8 kv heads
    seqlens = [128, 256, 512]
    q, k, v, cu_q, cu_k = _pack(jax.random.key(2), seqlens, seqlens, 32, 8, 64)
    out = flash_attn_varlen_func(
        q, k, v, cu_q, cu_k, max(seqlens), max(seqlens), causal=True
    )
    ref = varlen_attention_ref(q, k, v, cu_q, cu_k, causal=True)
    assert_close(out, ref, msg="varlen gqa 32:8")


def test_varlen_short_sequences():
    seqlens = [8, 16, 48, 24]
    q, k, v, cu_q, cu_k = _pack(jax.random.key(3), seqlens, seqlens, 2, 2, 64)
    out = flash_attn_varlen_func(q, k, v, cu_q, cu_k, max(seqlens), max(seqlens))
    ref = varlen_attention_ref(q, k, v, cu_q, cu_k)
    assert_close(out, ref, msg="varlen short")


def test_varlen_bf16():
    seqlens = [128, 200]
    q, k, v, cu_q, cu_k = _pack(
        jax.random.key(4), seqlens, seqlens, 4, 4, 64, dtype=jnp.bfloat16
    )
    out = flash_attn_varlen_func(q, k, v, cu_q, cu_k, 200, 200, causal=True)
    ref = varlen_attention_ref(q, k, v, cu_q, cu_k, causal=True)
    assert_close(out, ref, dtype=jnp.bfloat16, msg="varlen bf16")


def test_varlen_cross_lengths():
    # decode-like: 1 q token per seq against longer KV (mixed with prefill)
    seqlens_q = [1, 64, 1]
    seqlens_k = [200, 64, 37]
    q, k, v, cu_q, cu_k = _pack(jax.random.key(5), seqlens_q, seqlens_k, 4, 4, 64)
    out = flash_attn_varlen_func(q, k, v, cu_q, cu_k, 64, 200)
    ref = varlen_attention_ref(q, k, v, cu_q, cu_k)
    assert_close(out, ref, msg="varlen cross")


# ---------------- paged (block_table) varlen ----------------


def _paged_varlen(key, seqlens_q, seqlens_k, heads, kv_heads, d, page, shuffle=True):
    batch = len(seqlens_q)
    pages_per_seq = max(-(-l // page) for l in seqlens_k)
    num_pages = batch * pages_per_seq + 2
    kq, kk, kv, kt = jax.random.split(key, 4)
    tq = sum(seqlens_q)
    q = jax.random.normal(kq, (tq, heads, d), jnp.float32)
    k_pages = jax.random.normal(kk, (num_pages, page, kv_heads, d), jnp.float32)
    v_pages = jax.random.normal(kv, (num_pages, page, kv_heads, d), jnp.float32)
    ids = (jax.random.permutation(kt, num_pages)[: batch * pages_per_seq]
           if shuffle else jnp.arange(batch * pages_per_seq))
    table = np.asarray(ids.reshape(batch, pages_per_seq), np.int32)
    cu_q = np.concatenate([[0], np.cumsum(seqlens_q)]).astype(np.int32)
    cu_k = np.concatenate([[0], np.cumsum(seqlens_k)]).astype(np.int32)
    # Oracle: gather pages to packed K/V
    kg, vg = [], []
    for b, L in enumerate(seqlens_k):
        rows_k, rows_v = [], []
        for t in range(L):
            pid = table[b, t // page]
            rows_k.append(np.asarray(k_pages[pid, t % page]))
            rows_v.append(np.asarray(v_pages[pid, t % page]))
        kg.append(np.stack(rows_k))
        vg.append(np.stack(rows_v))
    k_packed = jnp.asarray(np.concatenate(kg))
    v_packed = jnp.asarray(np.concatenate(vg))
    return q, k_pages, v_pages, table, cu_q, cu_k, k_packed, v_packed


@pytest.mark.parametrize("page", [16, 64, 128])
def test_varlen_block_table(page):
    seqlens = [100, 256]
    q, kp, vp, table, cu_q, cu_k, k_packed, v_packed = _paged_varlen(
        jax.random.key(6), seqlens, seqlens, 4, 2, 64, page
    )
    out = flash_attn_varlen_func(
        q, kp, vp, cu_q, cu_k, max(seqlens), max(seqlens),
        causal=True, block_table=jnp.asarray(table),
    )
    ref = varlen_attention_ref(q, k_packed, v_packed, cu_q, cu_k, causal=True)
    assert_close(out, ref, msg=f"varlen paged page={page}")


def test_varlen_block_table_mixed_decode_prefill():
    # Mixed decode (q len 1) + prefill (reference: test_varlen_block_table.py:157)
    seqlens_q = [1, 128]
    seqlens_k = [200, 128]
    q, kp, vp, table, cu_q, cu_k, k_packed, v_packed = _paged_varlen(
        jax.random.key(7), seqlens_q, seqlens_k, 4, 4, 64, 64
    )
    out = flash_attn_varlen_func(
        q, kp, vp, cu_q, cu_k, 128, 200, block_table=jnp.asarray(table)
    )
    ref = varlen_attention_ref(q, k_packed, v_packed, cu_q, cu_k)
    assert_close(out, ref, msg="varlen paged mixed")


# ---------------- windows / sinks / alibi on varlen routes ----------------


def _win_oracle(q, k, v, cu_q, cu_k, wl, wr, sinks, slopes=None):
    """Per-sequence dense oracle: causal-style window on sequence-local
    positions; sinks keep the first tokens visible; optional ALiBi."""
    cu_q = [int(x) for x in cu_q]
    cu_k = [int(x) for x in cu_k]
    h, d = q.shape[1], q.shape[2]
    g = h // k.shape[1]
    outs = []
    for b in range(len(cu_q) - 1):
        qb = q[cu_q[b]:cu_q[b + 1]].astype(jnp.float32)
        kb = jnp.repeat(k[cu_k[b]:cu_k[b + 1]].astype(jnp.float32), g, 1)
        vb = jnp.repeat(v[cu_k[b]:cu_k[b + 1]].astype(jnp.float32), g, 1)
        sq, sk = qb.shape[0], kb.shape[0]
        sc = jnp.einsum("qhd,khd->hqk", qb, kb) * d ** -0.5
        row = jnp.arange(sq)[:, None]
        col = jnp.arange(sk)[None, :]
        if slopes is not None:
            sc = sc - slopes[:, None, None] * jnp.abs(row - col)
        vis = jnp.ones((sq, sk), bool)
        if wr >= 0:
            vis &= col <= row + wr
        if wl >= 0:
            in_win = col >= row - wl
            if sinks:
                in_win |= col < sinks
            vis &= in_win
        sc = jnp.where(vis[None], sc, -jnp.inf)
        o = jnp.einsum("hqk,khd->qhd", jax.nn.softmax(sc, -1), vb)
        # kernel semantics: fully-masked rows produce zeros, not NaN
        o = jnp.where(jnp.any(vis, axis=1)[:, None, None], o, 0.0)
        outs.append(o)
    return jnp.concatenate(outs, axis=0)


@pytest.mark.parametrize("wl,sinks", [(40, 0), (40, 8), (17, 150)])
def test_varlen_window_sinks(wl, sinks):
    seqlens = [128, 300, 60]
    q, k, v, cu_q, cu_k = _pack(jax.random.key(8), seqlens, seqlens, 4, 2, 64)
    out = flash_attn_varlen_func(
        q, k, v, cu_q, cu_k, max(seqlens), max(seqlens), causal=True,
        window_size=(wl, 0), sink_tokens=sinks)
    ref = _win_oracle(q, k, v, cu_q, cu_k, wl, 0, sinks)
    assert_close(out, ref, msg=f"varlen window wl={wl} sinks={sinks}")


def test_varlen_window_short_kv_segment_boundary():
    """Regression: the per-q-block kv_first window tightening must clamp to
    the first spanned segment's kv range. With lens_k << lens_q, a q block
    whose first row's window starts beyond segment A's entire kv range
    spans into segment B — the unclamped bound skipped B's kv blocks."""
    from mfa_tpu.kernels.varlen import varlen_attention

    seqlens_q = [300, 100]
    seqlens_k = [8, 100]
    q, k, v, cu_q, cu_k = _pack(
        jax.random.key(11), seqlens_q, seqlens_k, 2, 1, 64)
    out = varlen_attention(
        q, k, v, cu_seqlens_q=cu_q, cu_seqlens_k=cu_k,
        max_seqlen_q=300, max_seqlen_k=100, causal=True,
        window_size=(4, 0), block_q=128, block_k=128)
    ref = _win_oracle(q, k, v, cu_q, cu_k, 4, 0, 0)
    assert_close(out, ref, msg="varlen window short-kv segment boundary")


def test_varlen_right_window_noncausal():
    seqlens = [100, 220]
    q, k, v, cu_q, cu_k = _pack(jax.random.key(9), seqlens, seqlens, 2, 2, 64)
    out = flash_attn_varlen_func(
        q, k, v, cu_q, cu_k, max(seqlens), max(seqlens),
        window_size=(30, 20))
    ref = _win_oracle(q, k, v, cu_q, cu_k, 30, 20, 0)
    assert_close(out, ref, msg="varlen right window")


def test_varlen_paged_noncausal_window_right0():
    """causal=False + window_size=(wl, 0) must behave like causal+window on
    the paged route too (non-paged kernel: `causal or window_right == 0`)."""
    seqlens = [100, 256]
    q, kp, vp, table, cu_q, cu_k, k_packed, v_packed = _paged_varlen(
        jax.random.key(12), seqlens, seqlens, 4, 2, 64, 64
    )
    out = flash_attn_varlen_func(
        q, kp, vp, cu_q, cu_k, max(seqlens), max(seqlens),
        causal=False, block_table=jnp.asarray(table), window_size=(50, 0))
    ref = _win_oracle(q, k_packed, v_packed, cu_q, cu_k, 50, 0, 0)
    assert_close(out, ref, msg="varlen paged noncausal wr=0")


@pytest.mark.parametrize("causal,window,dead_rows", [
    (True, (-1, -1), False),   # plain causal, all rows live
    (False, (40, 20), False),  # non-causal band
    (True, (4, 0), True),      # narrow window past a shorter kv -> -inf
])
def test_varlen_paged_return_lse(causal, window, dead_rows):
    """return_lse on the PAGED route (kernel LSE output): out AND the
    natural-log LSE [h, total_q] must match the non-paged route on the
    packed equivalent, including the -inf dead-row convention (a left
    window pushed entirely past a shorter kv sequence)."""
    from mfa_tpu.kernels.varlen import varlen_attention

    seqlens_q = [100, 256]
    seqlens_k = [60, 256]
    q, kp, vp, table, cu_q, cu_k, k_packed, v_packed = _paged_varlen(
        jax.random.key(15), seqlens_q, seqlens_k, 4, 2, 64, 64
    )
    kwargs = dict(
        cu_seqlens_q=jnp.asarray(cu_q), cu_seqlens_k=jnp.asarray(cu_k),
        max_seqlen_q=256, max_seqlen_k=256, causal=causal,
        window_size=window, return_lse=True)
    out_p, lse_p = varlen_attention(
        q, kp, vp, block_table=jnp.asarray(table), **kwargs)
    out_r, lse_r = varlen_attention(q, k_packed, v_packed, **kwargs)
    assert_close(out_p, out_r, msg=f"paged lse-route out causal={causal}")
    assert lse_p.shape == lse_r.shape == (4, sum(seqlens_q))
    inf_p, inf_r = np.isinf(np.asarray(lse_p)), np.isinf(np.asarray(lse_r))
    assert (inf_p == inf_r).all(), "dead-row -inf pattern differs"
    # seq 0 rows r >= 65: window [r-4, r] lies entirely past kv len 60
    assert inf_p[:, 65:100].all() == dead_rows
    assert not inf_p[:, 100:].any()
    np.testing.assert_allclose(
        np.asarray(lse_p)[~inf_p], np.asarray(lse_r)[~inf_r],
        atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("wl,wr", [(30, 20), (-1, 20), (40, -1)])
def test_varlen_paged_noncausal_band(wl, wr):
    """Right windows and non-causal bands on the paged route: row i of a
    sequence sees columns in [i - wl, i + wr] (either side unbounded at
    -1), matching the non-paged kernel's band semantics."""
    seqlens_q = [100, 256]
    seqlens_k = [160, 256]  # kv extends past q: band end is kv-bounded
    q, kp, vp, table, cu_q, cu_k, k_packed, v_packed = _paged_varlen(
        jax.random.key(14), seqlens_q, seqlens_k, 4, 2, 64, 64
    )
    out = flash_attn_varlen_func(
        q, kp, vp, cu_q, cu_k, 256, 256,
        causal=False, block_table=jnp.asarray(table), window_size=(wl, wr))
    ref = _win_oracle(q, k_packed, v_packed, cu_q, cu_k, wl, wr, 0)
    assert_close(out, ref, msg=f"varlen paged band wl={wl} wr={wr}")


def test_varlen_paged_window_short_kv_dead_rows():
    """Paged-route analog of the short-kv dead-row regression: rows whose
    window lies entirely past a shorter kv sequence must output zeros."""
    seqlens_q = [300, 100]
    seqlens_k = [8, 100]
    q, kp, vp, table, cu_q, cu_k, k_packed, v_packed = _paged_varlen(
        jax.random.key(13), seqlens_q, seqlens_k, 2, 1, 64, 64
    )
    out = flash_attn_varlen_func(
        q, kp, vp, cu_q, cu_k, 300, 100, causal=True,
        block_table=jnp.asarray(table), window_size=(4, 0))
    ref = _win_oracle(q, k_packed, v_packed, cu_q, cu_k, 4, 0, 0)
    assert_close(out, ref, msg="varlen paged window short-kv")


@pytest.mark.parametrize("wl,sinks", [(-1, 0), (50, 6)])
def test_varlen_paged_window_sinks(wl, sinks):
    seqlens = [100, 256]
    q, kp, vp, table, cu_q, cu_k, k_packed, v_packed = _paged_varlen(
        jax.random.key(10), seqlens, seqlens, 4, 2, 64, 64
    )
    out = flash_attn_varlen_func(
        q, kp, vp, cu_q, cu_k, max(seqlens), max(seqlens),
        causal=True, block_table=jnp.asarray(table),
        window_size=(wl, 0), sink_tokens=sinks)
    ref = _win_oracle(q, k_packed, v_packed, cu_q, cu_k, wl, 0, sinks)
    assert_close(out, ref, msg=f"varlen paged window wl={wl} sinks={sinks}")


def test_varlen_paged_alibi():
    # ALiBi on the paged varlen route (in-kernel bias in paged_prefill)
    seqlens = [90, 200]
    slopes = jnp.asarray([0.25, 0.0625, 0.5, 0.125])
    q, kp, vp, table, cu_q, cu_k, k_packed, v_packed = _paged_varlen(
        jax.random.key(11), seqlens, seqlens, 4, 2, 64, 64
    )
    out = flash_attn_varlen_func(
        q, kp, vp, cu_q, cu_k, max(seqlens), max(seqlens),
        causal=True, block_table=jnp.asarray(table), alibi_slopes=slopes)
    ref = _win_oracle(q, k_packed, v_packed, cu_q, cu_k, -1, 0, 0,
                      slopes=slopes)
    assert_close(out, ref, msg="varlen paged alibi")
