"""GQA/MQA parity (reference: tests/test_gqa.py).

Covers the reference's ratio matrix incl. MQA; the oracle expands KV heads
with repeat (reference oracle: tests/test_gqa.py:119-120).
"""

import jax
import jax.numpy as jnp
import pytest

from mfa_tpu import flash_attn_func
from mfa_tpu.ref.oracle import attention_ref
from tests.utils import assert_close, make_qkv


@pytest.mark.parametrize("heads,kv_heads", [
    (8, 1), (8, 2), (8, 4), (16, 2), (16, 4), (32, 8),
])
def test_gqa_ratios(heads, kv_heads):
    q, k, v = make_qkv(jax.random.key(0), 2, 128, 128, heads, kv_heads, 64)
    out = flash_attn_func(q, k, v)
    ref = attention_ref(q, k, v)
    assert_close(out, ref, msg=f"gqa {heads}:{kv_heads}")


@pytest.mark.parametrize("heads,kv_heads", [(8, 2), (16, 4)])
def test_gqa_causal(heads, kv_heads):
    q, k, v = make_qkv(jax.random.key(1), 1, 256, 256, heads, kv_heads, 64)
    out = flash_attn_func(q, k, v, causal=True)
    ref = attention_ref(q, k, v, causal=True)
    assert_close(out, ref, msg=f"gqa causal {heads}:{kv_heads}")


def test_mqa_bf16():
    q, k, v = make_qkv(jax.random.key(2), 2, 128, 128, 8, 1, 128, dtype=jnp.bfloat16)
    out = flash_attn_func(q, k, v, causal=True)
    ref = attention_ref(q, k, v, causal=True)
    assert_close(out, ref, dtype=jnp.bfloat16, msg="mqa bf16")


def test_gqa_head_mapping():
    """Q head h must attend exactly to kv head h // group (api.cpp:84)."""
    batch, s, d = 1, 128, 64
    heads, kv_heads = 4, 2
    key = jax.random.key(3)
    q = jax.random.normal(key, (batch, s, heads, d), jnp.float32)
    # Distinct K/V per kv head so a wrong mapping shows up
    k = jnp.stack([jnp.full((batch, s, d), 0.01 * (i + 1)) for i in range(kv_heads)], axis=2)
    v = jnp.stack([jnp.full((batch, s, d), float(i + 1)) for i in range(kv_heads)], axis=2)
    out = flash_attn_func(q, k, v)
    # With constant V per kv head, output == that constant regardless of softmax
    for h in range(heads):
        expected = float(h // (heads // kv_heads) + 1)
        assert jnp.allclose(out[:, :, h], expected, atol=1e-3), f"head {h}"
