"""Quantized KV-cache tests (INT8/FP8 per-row; north-star extension)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.kernels.paged import paged_attention
from mfa_tpu.kernels.quant import dequantize_rows, quantize_rows
from mfa_tpu.ref.oracle import paged_decode_ref
from tests.utils import assert_close


@pytest.mark.parametrize("qd", ["int8", "fp8"])
def test_quantize_roundtrip(qd):
    x = jax.random.normal(jax.random.key(0), (2, 8, 16, 64)) * 3.0
    payload, scales = quantize_rows(x, qd)
    back = dequantize_rows(payload, scales)
    rel = np.abs(np.asarray(back - x)).max() / np.abs(np.asarray(x)).max()
    assert rel < (0.02 if qd == "int8" else 0.08)


def test_quantize_zero_rows():
    x = jnp.zeros((4, 64))
    payload, scales = quantize_rows(x, "int8")
    assert np.all(np.asarray(payload) == 0)
    assert np.all(np.isfinite(np.asarray(scales)))


@pytest.mark.parametrize("qd,tol", [("int8", 0.05), ("fp8", 0.12)])
def test_paged_decode_quantized(qd, tol):
    """Quantized paged decode vs fp32 oracle on dequantized pages.

    Parity target: match the oracle at the same bit-width (BASELINE.json) —
    the oracle consumes the dequantized pages, so the only divergence is
    kernel arithmetic, held to fp tolerances.
    """
    batch, heads, kvh, d, page, pps = 2, 8, 2, 128, 64, 4
    key = jax.random.key(1)
    kq, kk, kv, kt = jax.random.split(key, 4)
    num_pages = batch * pps + 1
    q = jax.random.normal(kq, (batch, heads, d), jnp.float32)
    k_pages = jax.random.normal(kk, (kvh, num_pages, page, d), jnp.float32)
    v_pages = jax.random.normal(kv, (kvh, num_pages, page, d), jnp.float32)
    table = jax.random.permutation(kt, num_pages)[: batch * pps].reshape(
        batch, pps
    ).astype(jnp.int32)
    lens = jnp.asarray([page * pps, 100], jnp.int32)

    kq_pages, k_scales = quantize_rows(k_pages, qd)
    vq_pages, v_scales = quantize_rows(v_pages, qd)

    out = paged_attention(
        q.astype(jnp.bfloat16), kq_pages, vq_pages, lens, table,
        k_scales=k_scales, v_scales=v_scales,
    )

    # Oracle on the dequantized cache (same bit-width information)
    k_deq = dequantize_rows(kq_pages, k_scales)
    v_deq = dequantize_rows(vq_pages, v_scales)
    ref = paged_decode_ref(
        q[:, None],
        jnp.transpose(k_deq, (1, 2, 0, 3)),
        jnp.transpose(v_deq, (1, 2, 0, 3)),
        lens,
        table,
    )[:, 0]
    assert_close(out, ref, tol=tol, msg=f"paged quant {qd}")


def test_quantized_vs_full_precision_quality():
    """End-to-end: int8 KV attention stays close to full-precision attention."""
    batch, heads, kvh, d, page, pps = 1, 4, 4, 64, 64, 2
    key = jax.random.key(2)
    kq, kk, kv = jax.random.split(key, 3)
    num_pages = batch * pps + 1
    q = jax.random.normal(kq, (batch, heads, d), jnp.float32)
    k_pages = jax.random.normal(kk, (kvh, num_pages, page, d), jnp.float32)
    v_pages = jax.random.normal(kv, (kvh, num_pages, page, d), jnp.float32)
    table = jnp.arange(batch * pps, dtype=jnp.int32).reshape(batch, pps)
    lens = jnp.asarray([128], jnp.int32)

    full = paged_attention(q, k_pages, v_pages, lens, table)
    kq_pages, k_scales = quantize_rows(k_pages, "int8")
    vq_pages, v_scales = quantize_rows(v_pages, "int8")
    quant = paged_attention(
        q.astype(jnp.bfloat16), kq_pages, vq_pages, lens, table,
        k_scales=k_scales, v_scales=v_scales,
    )
    diff = np.abs(np.asarray(quant, np.float32) - np.asarray(full, np.float32)).max()
    assert diff < 0.08, f"int8 KV quality degradation too large: {diff}"
