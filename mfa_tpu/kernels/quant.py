"""KV-cache quantization: INT8 / FP8 per-row quant + dequant.

No reference counterpart (the reference stores fp16/bf16 KV only); this is
the BASELINE.json north-star extension: quantized paged KV halves (or
quarters) decode HBM traffic, which is the decode roofline lever.

Granularity: one fp32 scale per (kv_head, token-row) — i.e. per head_dim
vector. This matches the in-kernel dequant design of
mfa_tpu/kernels/paged.py, where K row scales multiply score columns and V
row scales fold into the probabilities, so dequantization costs O(tokens)
VPU work instead of O(tokens * head_dim).

These are jnp implementations (XLA fuses the absmax/scale/round pipeline
into a single pass); the hot path is the *read* side, which lives inside
the Pallas decode kernels.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "KV_QUANT_DTYPES",
    "quantize_rows",
    "dequantize_rows",
    "quant_max",
]

KV_QUANT_DTYPES = ("int8", "fp8")

_FP8_DTYPE = jnp.float8_e4m3fn


def quant_max(quant_dtype: str) -> float:
    if quant_dtype == "int8":
        return 127.0
    if quant_dtype == "fp8":
        return float(jnp.finfo(_FP8_DTYPE).max)  # 448 for e4m3fn
    raise ValueError(f"unsupported quant dtype {quant_dtype!r}")


def storage_dtype(quant_dtype: str):
    return jnp.int8 if quant_dtype == "int8" else _FP8_DTYPE


def quantize_rows(x: jax.Array, quant_dtype: str) -> Tuple[jax.Array, jax.Array]:
    """Quantize along the last axis with one scale per row.

    x: [..., head_dim] float -> (payload [..., head_dim] int8/fp8,
                                 scales [...] float32)
    Symmetric: payload = round(x / scale), scale = absmax / qmax.
    """
    qmax = quant_max(quant_dtype)
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.where(absmax == 0.0, 1.0, absmax / qmax)
    scaled = x.astype(jnp.float32) / scale[..., None]
    if quant_dtype == "int8":
        payload = jnp.clip(jnp.round(scaled), -127, 127).astype(jnp.int8)
    else:
        payload = jnp.clip(scaled, -qmax, qmax).astype(_FP8_DTYPE)
    return payload, scale.astype(jnp.float32)


def dequantize_rows(payload: jax.Array, scales: jax.Array,
                    dtype=jnp.float32) -> jax.Array:
    """Inverse of quantize_rows (test/oracle path)."""
    return (payload.astype(jnp.float32) * scales[..., None]).astype(dtype)
