"""Attention logit softcap (Gemma2 convention; flash-attn v2.6's softcap
arg) across every kernel path: the capped logits are cap*tanh(s*scale/cap)
and softmax runs on them directly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mfa_tpu

CAP = 30.0


def _oracle(q, k, v, causal, cap, scale=None):
    """[b, s, h, d] layout, GQA-aware, fp32."""
    b, sq, h, d = q.shape
    hk = k.shape[2]
    scale = scale or d ** -0.5
    qf = jnp.swapaxes(q.astype(jnp.float32), 1, 2)
    kf = jnp.repeat(jnp.swapaxes(k.astype(jnp.float32), 1, 2), h // hk, 1)
    vf = jnp.repeat(jnp.swapaxes(v.astype(jnp.float32), 1, 2), h // hk, 1)
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
    s = jnp.tanh(s / cap) * cap
    if causal:
        sk = k.shape[1]
        mask = jnp.arange(sk)[None] <= jnp.arange(sq)[:, None] + (sk - sq)
        s = jnp.where(mask, s, -jnp.inf)
    o = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), vf)
    return jnp.swapaxes(o, 1, 2)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attn_func_softcap(causal):
    b, s, h, d = 2, 130, 4, 64
    q = jax.random.normal(jax.random.key(0), (b, s, h, d))
    k = jax.random.normal(jax.random.key(1), (b, s, 2, d))
    v = jax.random.normal(jax.random.key(2), (b, s, 2, d))
    out = mfa_tpu.flash_attn_func(q, k, v, causal=causal, softcap=CAP)
    ref = _oracle(q, k, v, causal, CAP)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4
    # softcap actually changes the result
    out0 = mfa_tpu.flash_attn_func(q, k, v, causal=causal)
    assert float(jnp.max(jnp.abs(out - out0))) > 1e-4


def test_flash_attn_varlen_softcap():
    h, d = 4, 64
    lens = [37, 80, 11]
    total = sum(lens)
    cu = jnp.asarray(np.cumsum([0] + lens), jnp.int32)
    q = jax.random.normal(jax.random.key(0), (total, h, d))
    k = jax.random.normal(jax.random.key(1), (total, 2, d))
    v = jax.random.normal(jax.random.key(2), (total, 2, d))
    out = mfa_tpu.flash_attn_varlen_func(
        q, k, v, cu, cu, max(lens), max(lens), causal=True, softcap=CAP)
    o = 0
    for ln in lens:
        seg = slice(o, o + ln)
        ref = _oracle(q[None, seg], k[None, seg], v[None, seg], True, CAP)[0]
        assert float(jnp.max(jnp.abs(out[seg] - ref))) < 1e-4, ln
        o += ln


def test_flash_attn_kvcache_softcap():
    b, h, d, s = 2, 4, 64, 96
    lens = jnp.asarray([51, 96], jnp.int32)
    q = jax.random.normal(jax.random.key(0), (b, 1, h, d))
    kc = jax.random.normal(jax.random.key(1), (b, s, 2, d))
    vc = jax.random.normal(jax.random.key(2), (b, s, 2, d))
    out = mfa_tpu.flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=lens, softcap=CAP)
    for i in range(b):
        ln = int(lens[i])
        ref = _oracle(q[i:i+1], kc[i:i+1, :ln], vc[i:i+1, :ln], False, CAP)
        assert float(jnp.max(jnp.abs(out[i:i+1] - ref))) < 1e-4, i
