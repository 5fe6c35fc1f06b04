"""Trace-time kernel configuration.

Plays the role of the reference's compile-time dispatch machinery
(csrc/mfa/static_switch.h runtime->template switches, csrc/mfa/traits.h
ForwardKernelTraits, and the split heuristic csrc/mfa/api.cpp:269-302).
On TPU, specialization is just Python branching at trace time — JAX retraces
per (shape, dtype, static-arg) combination, which is the exact analog of the
reference's template instantiation.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

# Head-dim buckets the reference instantiates (static_switch.h:25-52). We pad
# any head_dim up to the next lane-friendly size instead of erroring.
SUPPORTED_HEAD_DIMS = (32, 64, 96, 128, 160, 192, 224, 256)
MAX_HEAD_DIM = 256

# TPU lane count: the minimum useful last-dim tile; all block sizes are
# multiples of this (MXU is 128x128, VPU lanes = 128).
LANES = 128
SUBLANES_F32 = 8


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


@functools.lru_cache(maxsize=None)
def backend_platform() -> str:
    return jax.devices()[0].platform


def default_interpret() -> bool:
    """Pallas interpret mode when not on real TPU (CPU test mesh etc.).

    This is the TPU rebuild's 'CPU-runnable minimal config' mechanism
    (SURVEY.md section 4: Pallas interpret=True replaces CUDA-only testing).
    """
    return backend_platform() != "tpu"


@dataclasses.dataclass(frozen=True)
class PrefillConfig:
    """Tile configuration for the prefill kernel.

    The reference only ever instantiates kBlockM=64, kBlockN=64, 4 warps
    (flash.cu:78,89); on TPU the MXU is 128-wide so we default to 128x128
    q x kv tiles and scale the kv tile down for very large head dims to
    respect VMEM.
    """

    block_q: int = 128
    block_k: int = 128
    # Sub-tile size for causal diagonal cells (0 = monolithic): diagonal
    # bq x bq tiles are decomposed into diag_block-sized sub-tiles whose
    # dead upper triangle is skipped at trace time. Measured on v5e: the
    # per-dot overhead outweighs the FLOP savings (61.7 vs 71.3 TFLOP/s at
    # s=2048 with 256-sub-tiles), so this stays OFF by default; kept as an
    # experiment knob.
    diag_block: int = 0

    def vmem_bytes(self, head_dim: int, itemsize: int) -> int:
        # q + k + v tiles + fp32 scores + m/l/acc scratch
        return (
            self.block_q * head_dim * itemsize
            + 2 * self.block_k * head_dim * itemsize
            + self.block_q * self.block_k * 4
            + self.block_q * LANES * 4 * 2
            + self.block_q * head_dim * 4
        )


@dataclasses.dataclass(frozen=True)
class DecodeConfig:
    """Tile configuration for the split-KV decode kernel."""

    block_k: int = 512  # tokens of KV streamed per inner step
    num_splits: int = 1


def choose_prefill_config(
    seqlen_q: int, seqlen_k: int, head_dim: int, itemsize: int
) -> PrefillConfig:
    """Tile selection, tuned on v5e: large tiles amortize per-grid-cell
    overhead (measured: 1024x1024 is ~4.5x faster than 128x256 at s=2048,
    d=128); the VPU softmax, not the MXU, is the per-tile bound at d=128."""
    block_q = min(1024, round_up(max(seqlen_q, 8), 8) if seqlen_q < 128
                  else round_up(seqlen_q, 128) if seqlen_q < 1024 else 1024)
    block_k = min(1024, round_up(seqlen_k, 128))
    cfg = PrefillConfig(block_q=block_q, block_k=block_k)
    # VMEM guard: tiles + pipeline double-buffering well under the 64-128MB
    # of modern TPU VMEM; 24MB leaves headroom for Mosaic's own buffers.
    while cfg.vmem_bytes(head_dim, itemsize) > 24 * 1024 * 1024:
        if cfg.block_k >= cfg.block_q and cfg.block_k > 128:
            cfg = PrefillConfig(block_q=cfg.block_q, block_k=cfg.block_k // 2)
        elif cfg.block_q > 128:
            cfg = PrefillConfig(block_q=cfg.block_q // 2, block_k=cfg.block_k)
        else:
            break
    return cfg


def choose_bwd_config(seqlen_q: int, seqlen_k: int, head_dim: int,
                      itemsize: int) -> tuple:
    """Backward tile selection, tuned on v5e like the forward: large tiles
    amortize per-grid-cell overhead (measured: 1024x1024 is 4.7x faster
    than 128x128 at s=2048, d=128 — 27.6 -> 128.6 TFLOP/s). The VMEM guard
    covers the three [bq, bk] fp32 intermediates (p, dp, ds) that dominate
    the backward footprint."""
    bq = min(1024, round_up(max(seqlen_q, 8), 8) if seqlen_q < 128
             else round_up(seqlen_q, 128) if seqlen_q < 1024 else 1024)
    bk = min(1024, round_up(seqlen_k, 128))

    def vmem(bq, bk):
        return (3 * bq * bk * 4                          # p/dp/ds fp32
                + 2 * (bq + bk) * head_dim * itemsize * 2  # q/do,k/v 2-buf
                + (2 * bk + bq) * head_dim * 4)          # dk/dv/dq accum

    while vmem(bq, bk) > 40 * 1024 * 1024:
        if bk >= bq and bk > 128:
            bk //= 2
        elif bq > 128:
            bq //= 2
        else:
            break
    return bq, bk


# Parallel work units per chip used by the split heuristic. The reference
# doubles the SM count (api.cpp:274); the TPU analog is the number of
# independent compute cores (megacores) per chip — decode splits exist to
# keep them and the DMA engines busy when batch*kv_heads is small.
TPU_PARALLEL_UNITS = {
    "tpu": 2,  # v4/v5p megacores; v5e has 1 tensor core but 2 is a safe target
    "cpu": 2,
    "axon": 2,
}


def num_splits_heuristic(
    batch: int,
    num_kv_heads: int,
    seqlen_k: int,
    block_k: int,
    max_splits: int = 16,
    parallel_units: Optional[int] = None,
) -> int:
    """Pick a split count for flash decoding.

    TPU-native rework of csrc/mfa/api.cpp:269-302: instead of SM wave
    efficiency, target enough (batch x kv_head x split) grid cells to cover
    the chip's parallel units, capped by the number of KV blocks so every
    split has work. Pure arithmetic — static at trace time.
    """
    if parallel_units is None:
        parallel_units = TPU_PARALLEL_UNITS.get(backend_platform(), 2)
    n_blocks = cdiv(seqlen_k, block_k)
    if n_blocks <= 1:
        return 1
    work = batch * num_kv_heads
    if work >= parallel_units:
        return 1
    splits = min(max_splits, n_blocks, cdiv(parallel_units, work))
    return max(1, splits)


# INT4 KV pages halve decode HBM traffic but pay an in-kernel nibble
# unpack (int32 shift math — see kernels/quant.py) plus a read-modify-write
# on append, so they only win once the cache read dominates: the measured
# v5e crossover vs int8 sits between 2k and 4k tokens of KV per sequence
# (benchmark/compare_decode.py sweep; at 8192 int4 is ~1.1-1.3x faster,
# at ≤1024 it loses). Below the crossover int8 is both faster and
# accurate enough; above it int4 wins modestly on speed AND doubles
# residency. Why only ~1.15x when bytes predict 1.75x: per-page DMA
# transfers are LATENCY-bound on this chip — halving a page's bytes cuts
# its transfer time to only ~0.75-0.80x (measured serial floor), the
# unpack adds 5-12% VPU, and bigger pages measure slower end-to-end
# (scripts/probe_int4_decode.py). int4's primary value is the 2x KV
# DENSITY, which this crossover rule reflects.
INT4_KV_CROSSOVER_TOKENS = 4096


def recommend_kv_quant(
    expected_kv_len: int,
    *,
    memory_bound: bool = False,
    quality_floor: bool = False,
    outlier_tolerant: bool = False,
) -> str:
    """Pick the KV-cache storage dtype for a serving config.

    The analog of the reference's fixed fp16 cache (it has no KV quant at
    all — SURVEY §2.9 lists quant as north-star): callers pass the cache
    capacity per sequence (pages_per_seq * page_size) and get the dtype
    that maximizes decode throughput at that length. `memory_bound=True`
    forces int4 (capacity over latency); `quality_floor=True` refuses
    int4 (quality-sensitive serving).

    int8 vs fp8 (same bytes; int8 decodes at 92% of the HBM roofline vs
    fp8's 29% on this chip — BENCH captures both at kv=8192): per-row
    absmax-scaled int8 has finer steps near the row scale, so it is the
    8-bit default — MEASURED on benign KV its attention output error is
    5.6x lower than fp8's (0.0034 vs 0.019 max-abs,
    tests/test_quant.py:test_fp8_beats_int8_on_outlier_kv). fp8 (e4m3)
    keeps ~2^-4 RELATIVE precision per element regardless of the row's
    absmax, which wins when rows carry outlier channels that crush the
    int8 scale: with 256x outlier channels the same test measures int8
    at ~100% relative output error vs fp8's ~1.8% (59x better) — the
    rogue-head / no-qk-norm KV pattern. `outlier_tolerant=True` (the
    caller knows the model has outlier-heavy KV rows) selects fp8 at
    8-bit operating points, trading decode roofline for exactness.
    """
    eight_bit = "fp8" if outlier_tolerant else "int8"
    if quality_floor:
        return eight_bit
    if memory_bound or expected_kv_len >= INT4_KV_CROSSOVER_TOKENS:
        return "int4"
    return eight_bit


def validate_attention_inputs(q, k, v, *, api_name: str) -> None:
    """Shape/dtype validation mirroring csrc/mfa/api.cpp:126-162."""
    if q.dtype not in (jnp.float16, jnp.bfloat16, jnp.float32):
        raise ValueError(f"{api_name}: dtype must be fp16/bf16/fp32, got {q.dtype}")
    if k.dtype != q.dtype or v.dtype != q.dtype:
        raise ValueError(f"{api_name}: q/k/v dtypes must match")
    if q.shape[-1] != k.shape[-1] or q.shape[-1] != v.shape[-1]:
        raise ValueError(f"{api_name}: head_dim mismatch")
    if q.shape[-1] > MAX_HEAD_DIM:
        raise ValueError(f"{api_name}: head_dim must be <= {MAX_HEAD_DIM}")
    num_heads = q.shape[-2]
    num_kv_heads = k.shape[-2]
    if v.shape[-2] != num_kv_heads:
        raise ValueError(f"{api_name}: k/v head count mismatch")
    if num_heads % num_kv_heads != 0:
        raise ValueError(
            f"{api_name}: num_heads ({num_heads}) must be divisible by "
            f"num_kv_heads ({num_kv_heads})"
        )


def softmax_scale_default(head_dim: int) -> float:
    return 1.0 / math.sqrt(head_dim)
