"""Shared test helpers: random inputs + tolerance checks.

Tolerances adopted from the reference acceptance thresholds
(tests/test_mha.py:90, test_flash_decoding.py:139-140, test_varlen.py:93,366).
"""

import jax
import jax.numpy as jnp
import numpy as np

# max-abs-diff thresholds by dtype, vs fp32 oracle with normalized inputs
TOL = {
    jnp.dtype(jnp.float32): 2e-5,
    jnp.dtype(jnp.float16): 1e-2,
    jnp.dtype(jnp.bfloat16): 2e-2,
}


def make_qkv(key, batch, sq, sk, heads, kv_heads, d, dtype=jnp.float32, std=1.0):
    kq, kk, kv = jax.random.split(key, 3)
    q = (jax.random.normal(kq, (batch, sq, heads, d)) * std).astype(dtype)
    k = (jax.random.normal(kk, (batch, sk, kv_heads, d)) * std).astype(dtype)
    v = (jax.random.normal(kv, (batch, sk, kv_heads, d)) * std).astype(dtype)
    return q, k, v


def assert_close(out, ref, dtype=None, tol=None, msg=""):
    dtype = dtype or out.dtype
    tol = tol if tol is not None else TOL[jnp.dtype(dtype)]
    out = np.asarray(out, dtype=np.float32)
    ref = np.asarray(ref, dtype=np.float32)
    assert out.shape == ref.shape, f"{msg} shape {out.shape} != {ref.shape}"
    assert np.isfinite(out).all(), f"{msg} non-finite values in output"
    max_diff = np.abs(out - ref).max()
    assert max_diff < tol, f"{msg} max_diff={max_diff:.5f} >= tol={tol}"
