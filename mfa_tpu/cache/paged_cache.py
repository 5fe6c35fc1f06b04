"""Paged KV-cache manager.

The reference has no cache manager — cache tensors are owned by the caller
and passed into flash_attn_with_kvcache (interface.py:95-124); the only
"paging" machinery is the block_table indirection inside the kernels. For a
serving engine that owns continuous batching, the cache must be a
first-class component (SURVEY.md §5 checkpoint/resume note: "cache manager
owns paged buffers"). This module provides it, TPU-style:

- Device state is a pytree of fixed-shape arrays (pages, optional scales,
  block tables, lengths) so every mutation is a jittable functional update.
- Page *allocation* is host-side bookkeeping (a free list) — allocation
  decisions are control flow, not compute, and on TPU they must be resolved
  before dispatch; only page *contents* live on device.
- Page layout is the kernel-native [num_kv_heads, num_pages, page_size,
  head_dim] (contiguous (page_size x head_dim) chunks per head per page —
  the DMA-friendly shape), not the reference's [num_blocks, page_size,
  kv_heads, head_dim] (api.cpp:242-257).
- Optional INT8/FP8 storage quantizes rows on append (mfa_tpu.kernels.quant).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mfa_tpu.kernels.quant import quantize_rows, storage_dtype


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """Device-side paged KV state (a pytree; safe to pass through jit)."""

    k_pages: jax.Array  # [hkv, num_pages, page, d] (maybe quantized)
    v_pages: jax.Array
    k_scales: Optional[jax.Array]  # [hkv, num_pages, page] fp32 or None
    v_scales: Optional[jax.Array]
    block_tables: jax.Array  # [max_seqs, pages_per_seq] int32
    lengths: jax.Array  # [max_seqs] int32
    page_size: int = dataclasses.field(metadata=dict(static=True))
    quant_dtype: Optional[str] = dataclasses.field(metadata=dict(static=True))
    # true model head_dim; k_pages.shape[-1] is the 128-lane-padded
    # STORED width (and for int4 shape[-2] is page_size/2)
    head_dim: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def num_kv_heads(self) -> int:
        return self.k_pages.shape[0]

    @property
    def num_pages(self) -> int:
        return self.k_pages.shape[1]

    @property
    def page_width(self) -> int:
        return self.k_pages.shape[-1]

    @property
    def max_seqs(self) -> int:
        return self.block_tables.shape[0]

    @property
    def pages_per_seq(self) -> int:
        return self.block_tables.shape[1]


def create_cache(
    num_pages: int,
    page_size: int,
    num_kv_heads: int,
    head_dim: int,
    max_seqs: int,
    pages_per_seq: int,
    dtype=jnp.bfloat16,
    quant_dtype: Optional[str] = None,
) -> PagedKVCache:
    store = storage_dtype(quant_dtype) if quant_dtype else dtype
    if quant_dtype == "int4" and page_size % 2:
        raise ValueError("int4 KV needs an even page_size (row pairing)")
    # int4 pages are row-PAIRED: two tokens share one row — see
    # kernels/paged.py:_unpack_int4. All page rows are 128-lane padded:
    # the strided per-page DMA can't address sub-128-lane rows on TPU,
    # and zero-padded features are inert in attention.
    rows = page_size // 2 if quant_dtype == "int4" else page_size
    shape = (num_kv_heads, num_pages, rows, stored_width(head_dim))
    scales = (
        jnp.ones((num_kv_heads, num_pages, page_size), jnp.float32)
        if quant_dtype
        else None
    )
    return PagedKVCache(
        k_pages=jnp.zeros(shape, store),
        v_pages=jnp.zeros(shape, store),
        k_scales=scales,
        v_scales=None if scales is None else scales,
        block_tables=jnp.zeros((max_seqs, pages_per_seq), jnp.int32),
        lengths=jnp.zeros((max_seqs,), jnp.int32),
        page_size=page_size,
        quant_dtype=quant_dtype,
        head_dim=head_dim,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StackedKVCache:
    """All layers' paged KV state in one pytree, metadata SHARED.

    The serving engine's hot loop mutates cache metadata (map pages,
    release slots) from the host; with per-layer caches every such change
    is n_layers eager device ops, and through a remote-dispatch link that
    dominates the decode step. Sharing ONE block table + lengths vector
    across layers makes every metadata mutation a single O(1)-dispatch op,
    and lets the model lax.scan over layers (compile time O(1) in depth).

    LAYOUT (round 4): every layer's pages live in ONE MERGED pool
    [hkv, n_layers * num_pages, rows, W] — layer l's logical page p is
    physical page l * num_pages + p. The model layer passes the SAME
    merged pool to the paged kernels with a per-layer-offset block table
    (tables + l * num_pages, a tiny add), so the pools never ride a
    lax.scan's xs/ys: they thread through the scan CARRY and every write
    is a token/page-level scatter XLA aliases in place. The previous
    [layers, hkv, ...] layout forced a per-layer pool slice + restack
    each step — measured as the DOMINANT decode cost (step time scaled
    with POOL SIZE at fixed kv length: 5.7 -> 19.5 ms/step when pools
    grew 4x; scripts/probe_decode_step2.py decomposition)."""

    k_pages: jax.Array  # [hkv, layers * num_pages, rows, W] merged pool
    v_pages: jax.Array
    k_scales: Optional[jax.Array]  # [hkv, layers * num_pages, page] fp32
    v_scales: Optional[jax.Array]
    block_tables: jax.Array  # [max_seqs, pages_per_seq] int32 (all layers)
    lengths: jax.Array  # [max_seqs] int32 (all layers)
    page_size: int = dataclasses.field(metadata=dict(static=True))
    quant_dtype: Optional[str] = dataclasses.field(metadata=dict(static=True))
    head_dim: int = dataclasses.field(default=0, metadata=dict(static=True))
    # number of stacked layers (static: the merged page dim divides by it)
    layers: int = dataclasses.field(default=1, metadata=dict(static=True))

    @property
    def n_layers(self) -> int:
        return self.layers

    @property
    def num_kv_heads(self) -> int:
        return self.k_pages.shape[0]

    @property
    def num_pages(self) -> int:
        """LOGICAL pages per layer (the host allocator's id space)."""
        return self.k_pages.shape[1] // self.layers

    @property
    def page_width(self) -> int:
        return self.k_pages.shape[-1]

    @property
    def max_seqs(self) -> int:
        return self.block_tables.shape[0]

    @property
    def pages_per_seq(self) -> int:
        return self.block_tables.shape[1]


def create_stacked_cache(
    n_layers: int,
    num_pages: int,
    page_size: int,
    num_kv_heads: int,
    head_dim: int,
    max_seqs: int,
    pages_per_seq: int,
    dtype=jnp.bfloat16,
    quant_dtype: Optional[str] = None,
) -> StackedKVCache:
    store = storage_dtype(quant_dtype) if quant_dtype else dtype
    if quant_dtype == "int4" and page_size % 2:
        raise ValueError("int4 KV needs an even page_size (row pairing)")
    rows = page_size // 2 if quant_dtype == "int4" else page_size
    # one MERGED pool: layer l's logical page p = physical l*num_pages + p
    shape = (num_kv_heads, n_layers * num_pages, rows,
             stored_width(head_dim))
    # scales stay per-TOKEN (page_size rows) even when payload rows pair
    scales = (
        jnp.ones((num_kv_heads, n_layers * num_pages, page_size),
                 jnp.float32) if quant_dtype else None
    )
    return StackedKVCache(
        k_pages=jnp.zeros(shape, store),
        v_pages=jnp.zeros(shape, store),
        k_scales=scales,
        v_scales=None if scales is None else scales,
        block_tables=jnp.zeros((max_seqs, pages_per_seq), jnp.int32),
        lengths=jnp.zeros((max_seqs,), jnp.int32),
        page_size=page_size,
        quant_dtype=quant_dtype,
        head_dim=head_dim,
        layers=n_layers,
    )


def cache_shardings(cache: PagedKVCache, mesh, model_axis: str = "model"):
    """NamedSharding pytree for tensor-parallel cache placement.

    Pages (and scales) are sharded by KV head on `model_axis` — each chip
    owns whole kv heads, so decode attention against the cache needs zero
    communication (the GQA q-head group is co-located, SURVEY.md §2.8).
    Block tables and lengths are tiny int32 metadata, replicated.
    Use: ``jax.device_put(cache, cache_shardings(cache, mesh))``.
    """
    import dataclasses as _dc

    from jax.sharding import NamedSharding, PartitionSpec as P

    # Expert-only meshes carry no model axis: the cache replicates (EP
    # shards the MoE weight banks, not attention).
    if model_axis in mesh.axis_names:
        size = mesh.shape[model_axis]
    else:
        rep = NamedSharding(mesh, P())
        scales = rep if cache.k_scales is not None else None
        return _dc.replace(
            cache, k_pages=rep, v_pages=rep, k_scales=scales,
            v_scales=scales, block_tables=rep, lengths=rep,
        )
    if cache.num_kv_heads % size != 0:
        raise ValueError(
            f"kv heads ({cache.num_kv_heads}) must divide over "
            f"mesh axis '{model_axis}' ({size})"
        )
    rep = NamedSharding(mesh, P())
    # both layouts lead with the kv-head axis (StackedKVCache merges the
    # layer axis into the page dim)
    pages = NamedSharding(mesh, P(model_axis, None, None, None))
    scales = (
        NamedSharding(mesh, P(model_axis, None, None))
        if cache.k_scales is not None
        else None
    )
    return _dc.replace(
        cache,
        k_pages=pages,
        v_pages=pages,
        k_scales=scales,
        v_scales=scales,
        block_tables=rep,
        lengths=rep,
    )


class PageAllocator:
    """Host-side free-list page allocator (page 0 is reserved as the null
    page so uninitialized block-table entries stay in bounds)."""

    def __init__(self, num_pages: int):
        self.num_pages = num_pages
        self._free: List[int] = list(range(num_pages - 1, 0, -1))

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> List[int]:
        if n > len(self._free):
            raise MemoryError(
                f"paged KV cache out of pages: need {n}, have {len(self._free)}"
            )
        return [self._free.pop() for _ in range(n)]

    def free(self, pages: Sequence[int]) -> None:
        for p in pages:
            if p != 0:
                self._free.append(int(p))


def stored_width(head_dim: int) -> int:
    """Page-row lane count: head_dim rounded up to a 128-lane multiple
    (TPU DMA constraint; padded features are zeros and attention-inert)."""
    return -(-head_dim // 128) * 128


def _pad_width(kq: jax.Array) -> jax.Array:
    w = stored_width(kq.shape[-1])
    if w == kq.shape[-1]:
        return kq
    pad = [(0, 0)] * (kq.ndim - 1) + [(0, w - kq.shape[-1])]
    return jnp.pad(kq, pad)


def pack_pages_payload(quant_dtype, kq: jax.Array, n_pages: int,
                       page: int) -> jax.Array:
    """Whole-page payload [hkv, n_tokens(=n_pages*page), d] -> the pages'
    stored shape: [.., page, W], or token-pair nibble-packed
    [.., page/2, W] for int4 (quant.pack_int4_pairs), where
    W = stored_width(d)."""
    from mfa_tpu.kernels.quant import pack_int4_pairs

    hkv = kq.shape[0]
    kq = _pad_width(kq.reshape(hkv, n_pages * page, -1))
    if quant_dtype == "int4":
        return pack_int4_pairs(kq).reshape(hkv, n_pages, page // 2, -1)
    return kq.reshape(hkv, n_pages, page, -1)


def scatter_token_rows(pages: jax.Array, page_ids: jax.Array,
                       offs: jax.Array, kq: jax.Array,
                       quant_dtype) -> jax.Array:
    """Scatter per-token payload rows kq [hkv, n, pdim] at
    (page_ids[i], token offset offs[i]). For int4 this is a
    read-modify-write nibble blend into the token pair's shared row; two
    tokens of the same pair must NOT appear in one call (use
    scatter_span_rows for arbitrary position sets)."""
    kq = _pad_width(kq)
    if quant_dtype != "int4":
        return pages.at[:, page_ids, offs, :].set(kq)
    rows = offs // 2
    old = pages[:, page_ids, rows]  # [hkv, n, W] packed bytes
    parity = (offs % 2)[None, :, None]
    nib = jnp.bitwise_and(kq, 0x0F)  # two's-complement low nibble
    as_even = jnp.bitwise_or(jnp.bitwise_and(old, jnp.int8(-16)), nib)
    as_odd = jnp.bitwise_or(jnp.bitwise_and(old, jnp.int8(0x0F)),
                            jnp.left_shift(nib, 4))
    new = jnp.where(parity == 0, as_even, as_odd).astype(jnp.int8)
    return pages.at[:, page_ids, rows].set(new)


def scatter_span_rows(pages: jax.Array, page_ids: jax.Array,
                      offs: jax.Array, kq: jax.Array,
                      quant_dtype) -> jax.Array:
    """scatter_token_rows for ARBITRARY position sets: paired int4 writes
    go in two parity passes (even offsets, then odd) so both halves of a
    shared row land; the off-parity entries of each pass are routed to the
    reserved null page 0 (never read)."""
    kq = _pad_width(kq)
    if quant_dtype != "int4":
        return pages.at[:, page_ids, offs, :].set(kq)
    for parity in (0, 1):
        m = (offs % 2) == parity
        pids = jnp.where(m, page_ids, 0)
        offs_p = jnp.where(m, offs, parity)
        pages = scatter_token_rows(pages, pids, offs_p, kq, "int4")
    return pages


def _maybe_quant(cache: PagedKVCache, x: jax.Array):
    """-> (payload, scales|None) with payload in cache storage dtype."""
    if cache.quant_dtype is None:
        return x.astype(cache.k_pages.dtype), None
    return quantize_rows(x, cache.quant_dtype)


@jax.jit
def append_token(
    cache: PagedKVCache,
    seq_slots: jax.Array,  # [n] int32 — rows of block_tables/lengths
    new_k: jax.Array,  # [n, hkv, d]
    new_v: jax.Array,  # [n, hkv, d]
) -> PagedKVCache:
    """Append one token per active sequence (decode step).

    Pages for the write position must already be mapped in block_tables
    (host allocator's job). Functional scatter; jit-safe.
    """
    lens = cache.lengths[seq_slots]  # [n]
    page_ids = cache.block_tables[seq_slots, lens // cache.page_size]  # [n]
    offs = lens % cache.page_size  # [n]

    kq, ks = _maybe_quant(cache, jnp.swapaxes(new_k, 0, 1))  # [hkv, n, d]
    vq, vs = _maybe_quant(cache, jnp.swapaxes(new_v, 0, 1))

    k_pages = scatter_token_rows(cache.k_pages, page_ids, offs, kq,
                                 cache.quant_dtype)
    v_pages = scatter_token_rows(cache.v_pages, page_ids, offs, vq,
                                 cache.quant_dtype)
    k_scales = cache.k_scales
    v_scales = cache.v_scales
    if ks is not None:
        k_scales = cache.k_scales.at[:, page_ids, offs].set(ks)
        v_scales = cache.v_scales.at[:, page_ids, offs].set(vs)
    lengths = cache.lengths.at[seq_slots].set(lens + 1)
    return dataclasses.replace(
        cache,
        k_pages=k_pages,
        v_pages=v_pages,
        k_scales=k_scales,
        v_scales=v_scales,
        lengths=lengths,
    )


def write_prompt(
    cache: PagedKVCache,
    seq_slot: int,
    pages: Sequence[int],
    k_prompt: jax.Array,  # [seqlen, hkv, d]
    v_prompt: jax.Array,
) -> PagedKVCache:
    """Write a full prompt's KV into freshly allocated pages (prefill).

    `pages` is the host-allocated page list for this sequence (>=
    ceil(seqlen/page_size) entries). Padded to whole pages with zeros.
    """
    seqlen = k_prompt.shape[0]
    page = cache.page_size
    n_pages = -(-seqlen // page)
    assert len(pages) >= n_pages, "not enough pages allocated for prompt"
    pad = n_pages * page - seqlen
    if pad:
        k_prompt = jnp.pad(k_prompt, ((0, pad), (0, 0), (0, 0)))
        v_prompt = jnp.pad(v_prompt, ((0, pad), (0, 0), (0, 0)))
    # [hkv, n_pages, page, d]
    kq, ks = _maybe_quant(cache, jnp.swapaxes(k_prompt, 0, 1))
    vq, vs = _maybe_quant(cache, jnp.swapaxes(v_prompt, 0, 1))
    kq = pack_pages_payload(cache.quant_dtype, kq, n_pages, page)
    vq = pack_pages_payload(cache.quant_dtype, vq, n_pages, page)
    page_ids = jnp.asarray(list(pages[:n_pages]), jnp.int32)

    k_pages = cache.k_pages.at[:, page_ids].set(kq)
    v_pages = cache.v_pages.at[:, page_ids].set(vq)
    k_scales = cache.k_scales
    v_scales = cache.v_scales
    if ks is not None:
        k_scales = k_scales.at[:, page_ids].set(
            ks.reshape(cache.num_kv_heads, n_pages, page)
        )
        v_scales = v_scales.at[:, page_ids].set(
            vs.reshape(cache.num_kv_heads, n_pages, page)
        )
    table_row = jnp.zeros((cache.pages_per_seq,), jnp.int32)
    table_row = table_row.at[: n_pages].set(page_ids)
    if len(pages) > n_pages:
        table_row = table_row.at[n_pages : len(pages)].set(
            jnp.asarray(list(pages[n_pages:]), jnp.int32)
        )
    block_tables = cache.block_tables.at[seq_slot].set(table_row)
    lengths = cache.lengths.at[seq_slot].set(seqlen)
    return dataclasses.replace(
        cache,
        k_pages=k_pages,
        v_pages=v_pages,
        k_scales=k_scales,
        v_scales=v_scales,
        block_tables=block_tables,
        lengths=lengths,
    )


def map_page(cache: PagedKVCache, seq_slot: int, page_index: int,
             page_id: int) -> PagedKVCache:
    """Map one allocated physical page into a sequence's block table."""
    return dataclasses.replace(
        cache,
        block_tables=cache.block_tables.at[seq_slot, page_index].set(page_id),
    )


def map_pages(cache: PagedKVCache, seq_slots, page_indices, page_ids
              ) -> PagedKVCache:
    """Map many pages in ONE scatter (serving-loop hot path: per-op host
    dispatch costs dominate if pages are mapped one at a time)."""
    slots = jnp.asarray(seq_slots, jnp.int32)
    idxs = jnp.asarray(page_indices, jnp.int32)
    ids = jnp.asarray(page_ids, jnp.int32)
    return dataclasses.replace(
        cache,
        block_tables=cache.block_tables.at[slots, idxs].set(ids),
    )


def release_slot(cache: PagedKVCache, seq_slot: int) -> PagedKVCache:
    """Clear a finished sequence's table row + length (pages freed on host)."""
    return dataclasses.replace(
        cache,
        block_tables=cache.block_tables.at[seq_slot].set(0),
        lengths=cache.lengths.at[seq_slot].set(0),
    )


def release_slots(cache: PagedKVCache, seq_slots) -> PagedKVCache:
    """Batched release_slot: ONE scatter pair for any number of finished
    slots. Per-request eager releases through the remote-dispatch tunnel
    queue ~25-40 ms of RPC each and were measured as ~140 ms of backlog
    the NEXT wave's first sync absorbs (r5 serve-prefill breakdown); the
    engine defers finishes into one flush instead."""
    idx = jnp.asarray(seq_slots, jnp.int32)
    return dataclasses.replace(
        cache,
        block_tables=cache.block_tables.at[idx].set(0),
        lengths=cache.lengths.at[idx].set(0),
    )
