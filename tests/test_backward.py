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
