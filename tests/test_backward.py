"""Pallas backward kernel tests vs the dense jnp reference backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.kernels.autodiff import _bwd_jnp_reference, flash_attention_grad
from mfa_tpu.kernels.backward import flash_attention_bwd
from mfa_tpu.kernels.prefill import prefill_attention


def _grads(key, b, sq, sk, hq, hkv, d, causal, window=(-1, -1), dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, hq, sq, d), dtype)
    k = jax.random.normal(ks[1], (b, hkv, sk, d), dtype)
    v = jax.random.normal(ks[2], (b, hkv, sk, d), dtype)
    do = jax.random.normal(ks[3], (b, hq, sq, d), dtype)
    out, lse = prefill_attention(q, k, v, causal=causal, window_size=window,
                                 return_lse=True)
    got = flash_attention_bwd(q, k, v, out, lse, do, causal=causal,
                              window_size=window)
    want = _bwd_jnp_reference(causal, None, window, (q, k, v, out), do)
    return got, want


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("hq,hkv", [(2, 2), (4, 1), (4, 2)])
def test_backward_matches_reference(causal, hq, hkv):
    got, want = _grads(jax.random.key(0), 1, 128, 128, hq, hkv, 64, causal)
    for g, w, name in zip(got, want, ["dq", "dk", "dv"]):
        diff = np.abs(np.asarray(g) - np.asarray(w)).max()
        assert diff < 2e-3, f"{name} diff {diff} (causal={causal}, {hq}:{hkv})"


def test_backward_arbitrary_lengths():
    got, want = _grads(jax.random.key(1), 2, 100, 37, 2, 2, 64, True)
    for g, w, name in zip(got, want, ["dq", "dk", "dv"]):
        diff = np.abs(np.asarray(g) - np.asarray(w)).max()
        assert diff < 2e-3, f"{name} diff {diff}"


def test_backward_causal_short_q_long_k():
    """Regression: causal with seqlen_q < seqlen_k left the q-block bounds
    for trailing kv blocks unclamped (first > num_q_blocks-1), so their
    dk/dv output blocks were never visited or stored — garbage instead of
    the correct zeros."""
    got, want = _grads(jax.random.key(5), 1, 128, 512, 2, 2, 64, True)
    for g, w, name in zip(got, want, ["dq", "dk", "dv"]):
        diff = np.abs(np.asarray(g) - np.asarray(w)).max()
        assert diff < 2e-3, f"{name} diff {diff}"


def test_backward_window_past_short_kv():
    """Window pushing past a shorter kv: dead forward rows (lse = -inf)
    must contribute ZERO gradients (p = exp2(s*c + inf) would be inf)."""
    got, want = _grads(jax.random.key(6), 1, 300, 8, 2, 2, 64, True,
                       window=(4, -1))
    for g, w, name in zip(got, want, ["dq", "dk", "dv"]):
        g, w = np.asarray(g), np.asarray(w)
        assert np.isfinite(g).all(), f"{name} non-finite"
        diff = np.abs(g - w).max()
        assert diff < 2e-3, f"{name} diff {diff}"


def test_backward_window():
    got, want = _grads(jax.random.key(2), 1, 256, 256, 2, 2, 64, False,
                       window=(64, 0))
    for g, w, name in zip(got, want, ["dq", "dk", "dv"]):
        diff = np.abs(np.asarray(g) - np.asarray(w)).max()
        assert diff < 2e-3, f"{name} diff {diff}"


def test_backward_alibi():
    """ALiBi backward: jax.grad through the Pallas VJP vs a dense oracle."""
    b, hq, hkv, s, d = 1, 4, 2, 192, 64
    ks = jax.random.split(jax.random.key(7), 4)
    q = jax.random.normal(ks[0], (b, hq, s, d))
    k = jax.random.normal(ks[1], (b, hkv, s, d))
    v = jax.random.normal(ks[2], (b, hkv, s, d))
    slopes = jnp.asarray([0.25, 0.0625, 0.5, 0.125])

    def f_kernel(q, k, v):
        out = flash_attention_grad(q, k, v, True, None, (-1, -1), 0.0, 0,
                                   slopes)
        return (out ** 2).sum()

    def f_dense(q, k, v):
        g = hq // hkv
        kk = jnp.repeat(k, g, 1)
        vv = jnp.repeat(v, g, 1)
        sc = jnp.einsum("bhqd,bhkd->bhqk", q, kk) * d ** -0.5
        row = jnp.arange(s)[:, None]
        col = jnp.arange(s)[None, :]
        sc = sc - slopes[None, :, None, None] * jnp.abs(
            row - col).astype(jnp.float32)
        sc = jnp.where((col <= row)[None, None], sc, -jnp.inf)
        out = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(sc, -1), vv)
        return (out ** 2).sum()

    got = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
    for a, w, name in zip(got, want, ["dq", "dk", "dv"]):
        diff = np.abs(np.asarray(a) - np.asarray(w)).max()
        assert diff < 5e-3, f"alibi {name} diff {diff}"


def test_grad_through_custom_vjp_multi_tile():
    """End-to-end jax.grad over >1 kv tile exercises accumulation."""
    q = jax.random.normal(jax.random.key(3), (1, 2, 384, 64))
    k = jax.random.normal(jax.random.key(4), (1, 1, 384, 64))
    v = jax.random.normal(jax.random.key(5), (1, 1, 384, 64))

    f = lambda q, k, v: (flash_attention_grad(q, k, v, True) ** 2).sum()
    g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    out, lse = prefill_attention(q, k, v, causal=True, return_lse=True)
    want = _bwd_jnp_reference(True, None, (-1, -1), (q, k, v, out), 2 * out)
    for a, b, name in zip(g, want, ["dq", "dk", "dv"]):
        diff = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert diff < 5e-3, f"{name} diff {diff}"


# ---------------- varlen (cu_seqlens) backward ----------------


def _vl_oracle_attn(q, k, v, cu_q, cu_k, causal, window=(-1, -1),
                    softcap=0.0, slopes=None):
    """Dense jnp varlen attention on the packed layout (O(total^2) memory)
    — the numerical oracle for the segment-masked Pallas backward."""
    total_q, hq, d = q.shape
    total_k, hkv, _ = k.shape
    group = hq // hkv
    scale = 1.0 / np.sqrt(d)

    cu_qn = np.asarray(cu_q)
    cu_kn = np.asarray(cu_k)
    seg_q = np.searchsorted(cu_qn[1:-1], np.arange(total_q), side="right")
    seg_k = np.searchsorted(cu_kn[1:-1], np.arange(total_k), side="right")
    pos_q = np.arange(total_q) - cu_qn[seg_q]
    pos_k = np.arange(total_k) - cu_kn[seg_k]

    mask = seg_q[:, None] == seg_k[None, :]
    wl, wr = window
    if causal:
        wr = 0
    if wr >= 0:
        mask &= pos_k[None, :] <= pos_q[:, None] + wr
    if wl >= 0:
        mask &= pos_k[None, :] >= pos_q[:, None] - wl

    qf = q.astype(jnp.float32)
    kf = jnp.repeat(k.astype(jnp.float32), group, axis=1)
    vf = jnp.repeat(v.astype(jnp.float32), group, axis=1)
    s = jnp.einsum("qhd,khd->hqk", qf, kf) * scale
    if softcap:
        s = jnp.tanh(s / softcap) * softcap
    if slopes is not None:
        bias = -jnp.asarray(slopes, jnp.float32)[:, None, None] * jnp.abs(
            pos_q[:, None] - pos_k[None, :]
        )
        s = s + bias
    s = jnp.where(jnp.asarray(mask)[None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("hqk,khd->qhd", p, vf).astype(q.dtype)


def _vl_case(key, lens_q, lens_k, hq, hkv, d, causal, window=(-1, -1),
             softcap=0.0, slopes=None, block_q=64, block_k=128, tol=2e-3):
    from mfa_tpu.kernels.autodiff import flash_attn_varlen_func_grad

    total_q, total_k = sum(lens_q), sum(lens_k)
    cu_q = jnp.asarray(np.concatenate([[0], np.cumsum(lens_q)]), jnp.int32)
    cu_k = jnp.asarray(np.concatenate([[0], np.cumsum(lens_k)]), jnp.int32)
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (total_q, hq, d))
    k = jax.random.normal(ks[1], (total_k, hkv, d))
    v = jax.random.normal(ks[2], (total_k, hkv, d))
    w = jax.random.normal(ks[3], (total_q, hq, d))

    def loss_kernel(q, k, v):
        out = flash_attn_varlen_func_grad(
            q, k, v, cu_q, cu_k, max(lens_q), max(lens_k), causal=causal,
            window_size=window, logit_softcap=softcap, alibi_slopes=slopes,
        )
        return (out * w).sum()

    def loss_oracle(q, k, v):
        out = _vl_oracle_attn(q, k, v, cu_q, cu_k, causal, window, softcap,
                              slopes)
        return (out * w).sum()

    got = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for g, o, name in zip(got, want, ["dq", "dk", "dv"]):
        diff = np.abs(np.asarray(g) - np.asarray(o)).max()
        assert diff < tol, f"{name} diff {diff}"


@pytest.mark.parametrize("causal", [False, True])
def test_varlen_backward_gqa(causal):
    """Ragged batch spanning several kv blocks, GQA 4:2, mid-block seams."""
    _vl_case(jax.random.key(10), [100, 120, 36], [100, 120, 36], 4, 2, 64,
             causal)


def test_varlen_backward_unequal_qk():
    """seqlen_q != seqlen_k per sequence (top-left causal)."""
    _vl_case(jax.random.key(11), [40, 17], [64, 33], 2, 1, 64, True)


def test_varlen_backward_window():
    _vl_case(jax.random.key(12), [200, 56], [200, 56], 2, 2, 64, True,
             window=(32, -1))


def test_varlen_backward_alibi():
    _vl_case(jax.random.key(13), [90, 70], [90, 70], 4, 4, 64, True,
             slopes=jnp.asarray([0.25, 0.0625, 0.5, 0.125]))


def test_varlen_backward_softcap():
    _vl_case(jax.random.key(14), [128, 64], [128, 64], 2, 2, 64, True,
             softcap=30.0)


def test_varlen_forward_lse():
    """return_lse on the varlen forward matches a jnp LSE oracle."""
    from mfa_tpu.kernels.varlen import varlen_attention

    lens = [60, 68]
    cu = jnp.asarray([0, 60, 128], jnp.int32)
    ks = jax.random.split(jax.random.key(15), 3)
    q = jax.random.normal(ks[0], (128, 2, 64))
    k = jax.random.normal(ks[1], (128, 2, 64))
    v = jax.random.normal(ks[2], (128, 2, 64))
    out, lse = varlen_attention(q, k, v, cu, cu, 68, 68, causal=True,
                                return_lse=True)
    # oracle LSE per token over its own segment's causal prefix
    scale = 1.0 / np.sqrt(64)
    want = np.zeros((2, 128), np.float32)
    o_ref = np.zeros((128, 2, 64), np.float32)
    for s0, s1 in zip([0, 60], [60, 128]):
        qs = np.asarray(q[s0:s1], np.float64)
        kss = np.asarray(k[s0:s1], np.float64)
        vs = np.asarray(v[s0:s1], np.float64)
        sc = np.einsum("qhd,khd->hqk", qs, kss) * scale
        n = s1 - s0
        cmask = np.tril(np.ones((n, n), bool))
        sc = np.where(cmask[None], sc, -np.inf)
        want[:, s0:s1] = np.log(np.sum(np.exp(sc), axis=-1))
        pm = np.exp(sc - sc.max(-1, keepdims=True))
        pm = pm / pm.sum(-1, keepdims=True)
        o_ref[s0:s1] = np.einsum("hqk,khd->qhd", pm, vs)
    assert np.abs(np.asarray(lse) - want).max() < 1e-3
    assert np.abs(np.asarray(out) - o_ref).max() < 1e-3
