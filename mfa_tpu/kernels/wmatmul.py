"""Pallas int8-weight matmul: x @ dequant(qw) with the weight streamed
from HBM as int8 — kept as a PROBED-SLOWER reference implementation.

Measured on v5e (scripts/probe_wquant.py, 8 stacked 4096x14336 weights
scanned per step so nothing stays VMEM-resident): XLA already fuses the
int8->bf16 convert of the naive `x @ qw.astype(bf16)` graph into the
dot's operand stream (2.04x over bf16 weights, 732 GB/s of int8 ~90%
roofline); this kernel reaches only 1.28x (459 GB/s) — the per-tile
VPU convert doesn't overlap the DMA stream as well as XLA's fusion.
models/wquant.qmm therefore emits the XLA graph; this kernel stays as
the measured baseline, a correctness cross-check
(tests/test_wquant.py:test_int8_matmul_kernel_parity), and the starting
point if a future XLA regression un-fuses the convert.

The reference has no weight quantization (fp16/bf16 kernels only,
/root/reference/csrc/mfa/api.cpp).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mfa_tpu.dispatch.config import cdiv, default_interpret, round_up

__all__ = ["int8_matmul"]


def _kernel(x_ref, w_ref, s_ref, o_ref, acc, *, nk, out_dtype):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    w = w_ref[...].astype(x_ref.dtype)  # int8 -> compute dtype, in VMEM
    acc[...] += jax.lax.dot_general(
        x_ref[...], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _store():
        o_ref[...] = (acc[...] * s_ref[0:1, :]).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "block_k",
                              "out_dtype", "interpret"))
def int8_matmul(
    x: jax.Array,
    qw: jax.Array,
    scale: jax.Array,
    *,
    block_m: Optional[int] = None,
    block_n: int = 512,
    block_k: int = 2048,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """x [m, K] @ (qw [K, N] int8 * scale [N]) -> [m, N] in x.dtype.

    Exact w8a16: the contraction runs at x's dtype on the MXU with fp32
    accumulation; scale applies to the accumulator (per output column, so
    it commutes with the contraction). K and N must be multiples of 128
    (model dims are); m is padded to sublanes internally."""
    if interpret is None:
        interpret = default_interpret()
    m, K = x.shape
    K2, N = qw.shape
    assert K == K2 and scale.shape == (N,)
    out_dtype = out_dtype or x.dtype
    bm = block_m or min(512, round_up(m, 8))
    # largest power-of-two-ish tile dividing the dim (vocab-sized N like
    # 128256 = 128 * 1002 only divides by 256/128)
    bn = next(b for b in (block_n, 512, 256, 128) if N % b == 0)
    bk = next(b for b in (block_k, 2048, 1024, 512, 256, 128)
              if K % b == 0)
    assert K % bk == 0 and N % bn == 0, (K, N, bk, bn)
    m_p = round_up(m, bm)
    if m_p != m:
        x = jnp.pad(x, ((0, m_p - m), (0, 0)))
    nm, nn, nk = m_p // bm, N // bn, K // bk
    # 8-sublane broadcast of the scale row (Mosaic block tiling floor)
    s8 = jnp.broadcast_to(scale.astype(jnp.float32)[None, :], (8, N))
    out = pl.pallas_call(
        functools.partial(_kernel, nk=nk, out_dtype=out_dtype),
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((8, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_p, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, qw, s8)
    return out[:m]
