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
    "pack_int4_pairs",
    "unpack_int4_pairs",
    "fp8_bits_to_bf16",
]

KV_QUANT_DTYPES = ("int8", "fp8", "int4")

_FP8_DTYPE = jnp.float8_e4m3fn


def quant_max(quant_dtype: str) -> float:
    if quant_dtype == "int8":
        return 127.0
    if quant_dtype == "int4":
        return 7.0
    if quant_dtype == "fp8":
        return float(jnp.finfo(_FP8_DTYPE).max)  # 448 for e4m3fn
    raise ValueError(f"unsupported quant dtype {quant_dtype!r}")


def storage_dtype(quant_dtype: str):
    # int4 stores two values per int8 byte (nibble-packed: this backend's
    # device layer mishandles native jnp.int4 arrays, and packed int8 is
    # portable anyway); see pack/unpack below.
    return jnp.int8 if quant_dtype in ("int8", "int4") else _FP8_DTYPE


def pack_int4_pairs(vals: jax.Array) -> jax.Array:
    """[..., n_tokens, d] int8 4-bit values in [-7, 7] -> nibble-packed
    [..., n_tokens//2, d]: byte (r, c) = token 2r's feature c (low nibble)
    | token 2r+1's feature c (high nibble). Lane-aligned pairing: every
    byte's two nibbles belong to the SAME feature of adjacent tokens, so
    the in-kernel unpack is two full-width shifts + one sublane concat —
    no lane slicing (which costs vector relayouts on TPU).
    """
    lo = jnp.bitwise_and(vals[..., 0::2, :], 0x0F)
    hi = jnp.left_shift(vals[..., 1::2, :], 4)  # int8 wrap = 2's-compl nibble
    return jnp.bitwise_or(lo, hi).astype(jnp.int8)


def unpack_int4_pairs(packed: jax.Array) -> jax.Array:
    """Inverse of pack_int4_pairs: [..., rows, d] -> [..., 2*rows, d] in
    NATURAL token order (host/oracle path; the kernel keeps the permuted
    [evens, odds] order instead)."""
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    hi = jnp.right_shift(packed, 4)
    stacked = jnp.stack([lo, hi], axis=-2)  # [..., rows, 2, d]
    return stacked.reshape(*packed.shape[:-2], -1, packed.shape[-1])


def fp8_bits_to_bf16(bits: jax.Array) -> jax.Array:
    """Decode e4m3fn bit patterns (int8) to bf16 with integer VPU ops.

    This chip has no native float8: Mosaic moves/relayouts float8-typed
    arrays pathologically slowly (measured 11x on the paged decode kernel,
    scripts/probe_fp8.py), so fp8 pools are bitcast to int8 OUTSIDE the
    kernel (free under jit) and decoded here with shifts/selects that run
    at int8-path speed. Normals: bf16 = s | (e+120)<<7 | m<<4 (e4m3 bias 7
    -> bf16 bias 127, mantissa 3 -> 7 bits). Subnormals (e==0): m * 2^-9.
    NaN (0x7F/0xFF) is NOT handled — quantize_rows clips, so cache
    payloads never contain it.
    """
    b32 = bits.astype(jnp.int32)
    # low = (e<<7) | (m<<4): exponent+mantissa in one masked shift; adding
    # the rebias constant 120<<7 turns it into the bf16 exponent/mantissa
    # field directly. e == 0 iff low < 1<<7.
    low = jnp.left_shift(jnp.bitwise_and(b32, 0x7F), 4)
    sign15 = jnp.left_shift(jnp.bitwise_and(b32, 0x80), 8)
    norm16 = (sign15 + low + (120 << 7)).astype(jnp.uint16)
    normal = jax.lax.bitcast_convert_type(norm16, jnp.bfloat16)
    m = jnp.bitwise_and(b32, 0x7)
    sgn = jnp.where(b32 < 0, jnp.float32(-(2.0 ** -9)),
                    jnp.float32(2.0 ** -9))
    sub = (m.astype(jnp.float32) * sgn).astype(jnp.bfloat16)
    return jnp.where(low < (1 << 7), sub, normal)


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
    elif quant_dtype == "int4":
        # UNPACKED 4-bit values; token-pair packing happens at the cache
        # layer (pack_pages_payload / scatter helpers)
        payload = jnp.clip(jnp.round(scaled), -7, 7).astype(jnp.int8)
    else:
        payload = jnp.clip(scaled, -qmax, qmax).astype(_FP8_DTYPE)
    return payload, scale.astype(jnp.float32)


def dequantize_rows(payload: jax.Array, scales: jax.Array,
                    dtype=jnp.float32, quant_dtype: str = None) -> jax.Array:
    """Inverse of quantize_rows (test/oracle path). quantize_rows outputs
    are unpacked for every format (int4 included), so this is one
    multiply; use unpack_int4_pairs first for CACHE pages."""
    del quant_dtype  # all quantize_rows payloads are per-token rows
    return (payload.astype(jnp.float32) * scales[..., None]).astype(dtype)
