"""Standard MHA parity vs the jnp oracle (reference: tests/test_mha.py).

Covers shape sweeps, dtypes, determinism, and batch independence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu import flash_attn_func
from mfa_tpu.ref.oracle import attention_ref
from tests.utils import assert_close, make_qkv


@pytest.mark.parametrize("batch,seqlen,heads,d", [
    (1, 128, 1, 64),
    (2, 128, 8, 64),
    (2, 256, 4, 128),
    (1, 512, 2, 32),
    (2, 128, 2, 96),
    (1, 128, 1, 256),
])
def test_mha_shapes(batch, seqlen, heads, d):
    q, k, v = make_qkv(jax.random.key(0), batch, seqlen, seqlen, heads, heads, d)
    out = flash_attn_func(q, k, v)
    ref = attention_ref(q, k, v)
    assert_close(out, ref, msg=f"mha b={batch} s={seqlen} h={heads} d={d}")


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16, jnp.float16])
def test_mha_dtypes(dtype):
    q, k, v = make_qkv(jax.random.key(1), 2, 128, 128, 4, 4, 64, dtype=dtype)
    out = flash_attn_func(q, k, v)
    ref = attention_ref(q, k, v)
    assert out.dtype == dtype
    assert_close(out, ref, dtype=dtype, msg=f"mha {dtype}")


def test_mha_cross_seqlen():
    # seqlen_q != seqlen_k
    q, k, v = make_qkv(jax.random.key(2), 2, 128, 384, 4, 4, 64)
    out = flash_attn_func(q, k, v)
    ref = attention_ref(q, k, v)
    assert_close(out, ref, msg="cross seqlen")


def test_determinism():
    q, k, v = make_qkv(jax.random.key(3), 2, 256, 256, 4, 4, 64)
    out1 = flash_attn_func(q, k, v)
    out2 = flash_attn_func(q, k, v)
    assert np.array_equal(np.asarray(out1), np.asarray(out2))


def test_batch_independence():
    q, k, v = make_qkv(jax.random.key(4), 4, 128, 128, 2, 2, 64)
    out = flash_attn_func(q, k, v)
    for b in range(4):
        solo = flash_attn_func(q[b : b + 1], k[b : b + 1], v[b : b + 1])
        np.testing.assert_allclose(
            np.asarray(out[b]), np.asarray(solo[0]), rtol=0, atol=0
        )


def test_invalid_inputs():
    q, k, v = make_qkv(jax.random.key(5), 1, 128, 128, 8, 3, 64)
    with pytest.raises(ValueError):
        flash_attn_func(q, k, v)  # 8 % 3 != 0 (reference tests/test_gqa.py:206)
    with pytest.raises(ValueError):
        flash_attn_func(q.astype(jnp.int8), k.astype(jnp.int8), v.astype(jnp.int8))
