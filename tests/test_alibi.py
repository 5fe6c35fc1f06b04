"""ALiBi (alibi_slopes, official flash-attn API parity): per-head linear
position bias -slope * |i - j| across prefill, varlen, contiguous decode,
and paged decode (incl. GQA row mapping and speculative spans)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mfa_tpu

SLOPES4 = jnp.asarray([0.25, 0.0625, 0.5, 0.125])


def _oracle(q, k, v, slopes, causal, lens=None):
    """[b, s, h, d] layout with GQA; lens masks kv columns."""
    b, sq, h, d = q.shape
    sk, hk = k.shape[1], k.shape[2]
    g = h // hk
    qf = jnp.swapaxes(q.astype(jnp.float32), 1, 2)
    kf = jnp.repeat(jnp.swapaxes(k.astype(jnp.float32), 1, 2), g, 1)
    vf = jnp.repeat(jnp.swapaxes(v.astype(jnp.float32), 1, 2), g, 1)
    sc = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * d ** -0.5
    row = jnp.arange(sq)[:, None]
    col = jnp.arange(sk)[None, :]
    sc = sc - slopes[None, :, None, None] * jnp.abs(row - col)
    vis = jnp.ones((sq, sk), bool)
    if causal:
        vis &= col <= row
    vis = jnp.broadcast_to(vis, (b, 1, sq, sk))
    if lens is not None:
        vis = vis & (col[None, None] < lens[:, None, None, None])
    sc = jnp.where(vis, sc, -jnp.inf)
    o = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(sc, -1), vf)
    return jnp.swapaxes(o, 1, 2)


@pytest.mark.parametrize("causal", [True, False])
def test_flash_attn_func_alibi(causal):
    b, s, h, d = 2, 200, 4, 64
    q = jax.random.normal(jax.random.key(0), (b, s, h, d))
    k = jax.random.normal(jax.random.key(1), (b, s, 2, d))
    v = jax.random.normal(jax.random.key(2), (b, s, 2, d))
    out = mfa_tpu.flash_attn_func(q, k, v, causal=causal,
                                  alibi_slopes=SLOPES4)
    ref = _oracle(q, k, v, SLOPES4, causal)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4
    out0 = mfa_tpu.flash_attn_func(q, k, v, causal=causal)
    assert float(jnp.max(jnp.abs(out - out0))) > 1e-4  # bias matters


def test_varlen_alibi():
    h, d = 4, 64
    lens = [50, 110, 9]
    cu = jnp.asarray(np.cumsum([0] + lens), jnp.int32)
    total = sum(lens)
    q = jax.random.normal(jax.random.key(0), (total, h, d))
    k = jax.random.normal(jax.random.key(1), (total, 2, d))
    v = jax.random.normal(jax.random.key(2), (total, 2, d))
    out = mfa_tpu.flash_attn_varlen_func(
        q, k, v, cu, cu, max(lens), max(lens), causal=True,
        alibi_slopes=SLOPES4)
    o = 0
    for ln in lens:
        seg = slice(o, o + ln)
        ref = _oracle(q[None, seg], k[None, seg], v[None, seg],
                      SLOPES4, True)[0]
        assert float(jnp.max(jnp.abs(out[seg] - ref))) < 1e-4, ln
        o += ln


def test_kvcache_alibi_contiguous_and_paged():
    b, h, d, s = 2, 4, 64, 160
    lens = jnp.asarray([150, 64], jnp.int32)
    q = jax.random.normal(jax.random.key(0), (b, 1, h, d))
    kc = jax.random.normal(jax.random.key(1), (b, s, 2, d))
    vc = jax.random.normal(jax.random.key(2), (b, s, 2, d))
    # contiguous
    out = mfa_tpu.flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=lens, alibi_slopes=SLOPES4)[:, 0]
    kg = jnp.repeat(jnp.swapaxes(kc, 1, 2), 2, 1)
    vg = jnp.repeat(jnp.swapaxes(vc, 1, 2), 2, 1)
    sc = jnp.einsum("bshd,bhSd->bhsS", q, kg)[:, :, 0] * d ** -0.5
    col = jnp.arange(s)[None, None]
    pos = (lens - 1)[:, None, None]
    sc = sc - SLOPES4[None, :, None] * jnp.abs(pos - col)
    vis = col < lens[:, None, None]
    ref = jnp.einsum("bhS,bhSd->bhd",
                     jax.nn.softmax(jnp.where(vis, sc, -jnp.inf), -1), vg)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4
    # paged: same KV scattered into pages
    page, pps = 16, 10
    P = b * pps + 1
    kp = jnp.zeros((P, page, 2, d))
    vp = jnp.zeros((P, page, 2, d))
    table = jnp.arange(1, b * pps + 1, dtype=jnp.int32).reshape(b, pps)
    kp = kp.at[1:].set(kc.reshape(b * pps, page, 2, d))
    vp = vp.at[1:].set(vc.reshape(b * pps, page, 2, d))
    out_p = mfa_tpu.flash_attn_with_kvcache(
        q, kp, vp, cache_seqlens=lens, block_table=table,
        alibi_slopes=SLOPES4)[:, 0]
    assert float(jnp.max(jnp.abs(out_p - ref))) < 1e-4


def test_paged_alibi_speculative_span():
    """ALiBi with a multi-query span: row si sits at position
    eff_len-1 = lens - span + si, and each GQA group row carries its own
    slope."""
    from mfa_tpu.kernels.paged import paged_attention

    b, h, kvh, d, page, pps, span = 2, 4, 2, 64, 16, 8, 3
    P = b * pps + 1
    kp = jax.random.normal(jax.random.key(1), (kvh, P, page, d))
    vp = jax.random.normal(jax.random.key(2), (kvh, P, page, d))
    table = jnp.arange(1, b * pps + 1, dtype=jnp.int32).reshape(b, pps)
    lens = jnp.asarray([100, 40], jnp.int32)
    q = jax.random.normal(jax.random.key(5), (b, span, h, d))
    out = paged_attention(q, kp, vp, lens, table, alibi_slopes=SLOPES4,
                          pages_per_compute_block=2)
    kk = jnp.transpose(kp, (1, 2, 0, 3))[table].reshape(b, -1, kvh, d)
    vv = jnp.transpose(vp, (1, 2, 0, 3))[table].reshape(b, -1, kvh, d)
    kg = jnp.repeat(jnp.swapaxes(kk, 1, 2), h // kvh, 1)
    vg = jnp.repeat(jnp.swapaxes(vv, 1, 2), h // kvh, 1)
    col = jnp.arange(pps * page)[None, None]
    for si in range(span):
        eff = lens - (span - 1 - si)
        sc = jnp.einsum("bhd,bhSd->bhS", q[:, si], kg) * d ** -0.5
        pos = (eff - 1)[:, None, None]
        sc = sc - SLOPES4[None, :, None] * jnp.abs(pos - col)
        vis = col < eff[:, None, None]
        ref = jnp.einsum(
            "bhS,bhSd->bhd",
            jax.nn.softmax(jnp.where(vis, sc, -jnp.inf), -1), vg)
        assert float(jnp.max(jnp.abs(out[:, si] - ref))) < 1e-4, si
