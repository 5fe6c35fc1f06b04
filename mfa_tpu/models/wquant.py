"""INT8 weight quantization for the serving path.

The reference ships fp16/bf16 kernels only (its api.cpp validates q/k/v
dtypes to half/bf16, /root/reference/csrc/mfa/api.cpp:35-60) and has no
model layer at all; weight quantization is a BASELINE.md north-star
requirement here: the flagship "Llama-3-8B-shaped decode" config cannot
fit a 16 GB v5e in bf16 weights (~16 GB) next to a KV cache, and decode
throughput on one chip is bounded by weight streaming — int8 weights halve
both the footprint and the per-step HBM traffic.

Design (TPU-first):
- `QWeight`: a pytree dataclass holding the int8 payload plus one fp32
  scale per output channel (symmetric absmax, like kernels/quant.py's KV
  rows but per-CHANNEL: a weight column is reused by every token, so
  channel granularity costs O(out) memory and loses nothing to the
  per-row alternative).
- `qmm(x, w)`: the single matmul entry point used by models/llama.py for
  every projection. For a QWeight it computes `(x @ qw) * scale` — the
  per-output-column scale commutes with the contraction, so the big
  weight is never rescaled or materialized in bf16 ahead of the matmul;
  XLA fuses the int8->bf16 convert into the dot's operand stream (HBM
  reads stay int8 — verified on v5e by scripts/probe_wquant.py).
- Embeddings quantize per ROW (a gather reads whole rows): `qtake`.
- The layer-stacked params pytree, jax.lax.scan over layers, GSPMD
  shardings and checkpoint save/load all see QWeight as a regular pytree
  node; `adapt_shardings` rewrites a plain per-param NamedSharding tree
  into the matching (qw, scale) pair specs.

Gradients are NOT defined through QWeight (serving/inference only);
training keeps bf16 params.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp

__all__ = [
    "QWeight",
    "quantize_weight",
    "dequantize_weight",
    "qmm",
    "qtake",
    "quantize_params",
    "adapt_shardings",
    "params_nbytes",
]


@dataclasses.dataclass
class QWeight:
    """Per-channel symmetric int8 weight.

    qw: int8, any rank (leading layer-stack dims allowed).
    scale: fp32, qw's shape with `axis` removed.
    axis: the REDUCED axis as a negative index (-2 for [in, out] matmul
    weights -> one scale per output column; -1 for embedding tables ->
    one scale per vocab row). Static pytree metadata.
    """

    qw: jax.Array
    scale: jax.Array
    axis: int = -2

    @property
    def shape(self):
        return self.qw.shape

    @property
    def ndim(self):
        return self.qw.ndim


jax.tree_util.register_dataclass(
    QWeight, data_fields=("qw", "scale"), meta_fields=("axis",))


@functools.partial(jax.jit, static_argnames=("axis",))
def _quantize_body(w, axis: int):
    wf = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=axis)
    scale = jnp.where(absmax == 0.0, 1.0, absmax / 127.0)
    qw = jnp.clip(
        jnp.round(wf / jnp.expand_dims(scale, axis)), -127, 127
    ).astype(jnp.int8)
    return qw, scale.astype(jnp.float32)


def quantize_weight(w: jax.Array, axis: int = -2) -> QWeight:
    """Symmetric absmax int8 quantization along `axis` (one fp32 scale per
    remaining index). axis=-2 for [in, out] matmul weights (per output
    channel); axis=-1 for embedding tables (per vocab row).

    The body is jitted (fused upcast/reduce/round) and LARGE 2-D tensors
    quantize in slices along a non-reduced dim: a 128k-vocab embed's
    fp32 transient is 2.1 GB CONTIGUOUS, and the shared remote heap
    keeps fragmentation across clients — the 8B-on-16GB init dies or
    survives by allocator history without the chunking (r5)."""
    axis = axis if axis < 0 else axis - w.ndim  # normalize to negative
    chunk_elems = 64 * 1024 * 1024  # 256 MB fp32 transient cap
    if w.ndim == 2 and w.size > chunk_elems:
        split = 0 if axis == -1 else 1  # slice a NON-reduced dim
        n = w.shape[split]
        step = max(1, chunk_elems // max(1, w.size // n))
        qs, ss = [], []
        for lo in range(0, n, step):
            piece = (w[lo:lo + step] if split == 0
                     else w[:, lo:lo + step])
            qw_c, sc_c = _quantize_body(piece, axis)
            qs.append(qw_c)
            ss.append(sc_c)
        return QWeight(qw=jnp.concatenate(qs, axis=split),
                       scale=jnp.concatenate(ss, axis=0), axis=axis)
    qw, scale = _quantize_body(w, axis)
    return QWeight(qw=qw, scale=scale, axis=axis)


def dequantize_weight(w: QWeight, dtype=jnp.bfloat16) -> jax.Array:
    return (w.qw.astype(jnp.float32)
            * jnp.expand_dims(w.scale, w.axis)).astype(dtype)


def qmm(x: jax.Array, w: Any) -> jax.Array:
    """x @ w for a plain array or a QWeight (axis == -2).

    QWeight path: contract in the activation dtype against the int8
    payload and apply the per-output-channel scale to the SMALL output,
    which is exact: scale[j] * sum_k x[k] qw[k, j]
    == sum_k x[k] (qw[k, j] scale[j]).

    MEASURED (scripts/probe_wquant.py, v5e, 8 stacked 4096x14336 weights
    scanned per step so nothing stays VMEM-resident): XLA fuses the
    int8->bf16 convert into the dot's operand stream — this graph runs
    2.04x faster than bf16 weights at b=16 (732 GB/s of int8, ~90% of
    the HBM roofline). The alternatives lose: dynamic-activation w8a8
    int8 dot 1.93x (quantize overhead, worse numerics) and a hand-rolled
    Pallas dequant-matmul kernel 1.28x (kernels/wmatmul.py, kept as the
    probed-slower reference)."""
    if not isinstance(w, QWeight):
        return x @ w
    assert w.axis == -2, "qmm needs per-output-channel QWeight (axis=-2)"
    out = x @ w.qw.astype(x.dtype)
    return out * w.scale.astype(x.dtype)


def qtake(w: Any, idx: jax.Array) -> jax.Array:
    """Embedding lookup w[idx] for a plain array or a row-quantized
    QWeight (axis == -1): gather int8 rows + their scales, dequantize the
    gathered slice only."""
    if not isinstance(w, QWeight):
        return w[idx]
    assert w.axis == -1, "qtake needs per-row QWeight (axis=-1)"
    rows = w.qw[idx]
    return (rows.astype(jnp.bfloat16)
            * w.scale[idx][..., None].astype(jnp.bfloat16))


def ragged_qmm(x: jax.Array, w: Any, group_sizes: jax.Array) -> jax.Array:
    """lax.ragged_dot for a plain array or QWeight expert bank
    [E, in, out]. The quantized path dequantizes the bank into the
    contraction dtype first — ragged_dot requires matching operand types,
    so through THIS entry point expert weights save HBM *capacity* but
    not per-step traffic (measured 10.9 ms vs a 1.72 ms int8 stream
    floor at the Mixtral decode shape). Decode-sized batches take
    llama._moe_dense_int8 instead: dense per-expert fused-int8 matmuls
    at 92% of the int8 floor (scripts/probe_moe_int8.py); this ragged
    path remains for prefill/training token counts."""
    if not isinstance(w, QWeight):
        return jax.lax.ragged_dot(x, w, group_sizes)
    return jax.lax.ragged_dot(x, dequantize_weight(w, x.dtype), group_sizes)


# Matmul weights quantized per output channel. w_router stays fp32 (tiny,
# routing-accuracy-critical); norms/biases stay as-is.
_MATMUL_KEYS = frozenset((
    "wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
    "ws_gate", "ws_up", "ws_down", "lm_head",
))
_EXPERT_KEYS = frozenset(("we_gate", "we_up", "we_down"))


def quantize_params(params: dict, include_embed: bool = True,
                    include_experts: bool = False) -> dict:
    """Quantize a llama.py params pytree's big projections to int8.

    include_embed: also quantize the embedding table per row (saves
    ~1 GB on a 128k-vocab 8B model; lm_head is a matmul and always
    quantizes). include_experts: quantize MoE expert banks (decode
    batches stream them int8 via llama._moe_dense_int8; larger token
    counts dequantize at entry — see ragged_qmm). Returns a NEW pytree;
    norms, biases, and the router are untouched. Already-quantized
    leaves pass through."""

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            elif isinstance(v, QWeight):
                out[k] = v
            elif k in _MATMUL_KEYS:
                out[k] = quantize_weight(v, axis=-2)
            elif k in _EXPERT_KEYS and include_experts:
                out[k] = quantize_weight(v, axis=-2)
            elif k == "embed" and include_embed:
                out[k] = quantize_weight(v, axis=-1)
            else:
                out[k] = v
        return out

    return walk(dict(params))


def adapt_shardings(shardings: Any, params: Any) -> Any:
    """Rewrite a plain per-param NamedSharding tree (llama.param_shardings)
    to match a (possibly) quantized params tree: where params holds a
    QWeight, the array's PartitionSpec applies to qw and the spec with the
    reduced axis dropped applies to scale."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def adapt(s, p):
        if not isinstance(p, QWeight):
            return s
        spec = list(s.spec) + [None] * (p.qw.ndim - len(s.spec))
        ax = p.axis + p.qw.ndim
        scale_spec = tuple(spec[:ax] + spec[ax + 1:])
        return QWeight(
            qw=s, scale=NamedSharding(s.mesh, P(*scale_spec)), axis=p.axis)

    return jax.tree.map(adapt, shardings, params,
                        is_leaf=lambda x: isinstance(x, QWeight))


def params_nbytes(params: Any) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
