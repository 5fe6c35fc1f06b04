"""Account for int4 paged decode's missing speedup (VERDICT r3 weak #3).

int4 halves int8's payload bytes (64 B + 4 B scales per token at d=128 vs
128 B + 4 B) yet BENCH_r03 captured only 1.14x. Bytes predict ~1.75x
(scales included). This probe decomposes the gap at the bench shapes:

  paged int8 / int4      — the real kernels (baseline + target)
  dma+sum int8 / int4    — copy-kernel floor: stream the same pool
                           through the same per-page DMA, one add per
                           element, no unpack/attention. Separates "DMA
                           of half the bytes" from "what the kernel adds".
  dma+unpack int4        — + the token-pair nibble unpack (two int32
                           shift chains + sublane concat): the VPU cost
                           of the int4 format itself.

If dma+sum int4 ~ 0.5x int8's, the DMA floor scales with bytes and the
gap is VPU work (unpack + fp32 scale multiplies over twice the tokens
per DMA'd byte). If dma+sum int4 >> 0.5x, small-row DMA efficiency is
the culprit (int4 pages have page/2 rows).

MEASURED (v5e, two sessions): paged int4 runs 1.1-1.3x int8 (capture
1.12-1.15x). The serial-DMA floor ratio is 0.75-0.80 vs the 0.50 bytes
predict — per-page transfers are LATENCY-bound, so halving a page's
bytes doesn't halve its transfer time; the nibble unpack adds 5-12%
VPU on top. Bigger pages do NOT fix it: int4 at page=256 (128 packed
rows, int8's exact DMA geometry) measured SLOWER end-to-end (0.466 vs
0.410 ms) — the pipeline loses more to coarser buffering than it gains
per descriptor. Conclusion: ~1.15x is the honest speed ceiling of this
DMA geometry; int4's primary value is 2x KV DENSITY (double the context
per HBM GB), which is what recommend_kv_quant's crossover reflects.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_int4_decode.py
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from mfa_tpu.cache.paged_cache import pack_pages_payload  # noqa: E402
from mfa_tpu.kernels.paged import _unpack_int4, paged_attention  # noqa: E402
from mfa_tpu.kernels.quant import quantize_rows  # noqa: E402
from mfa_tpu.utils.timing import chain, measure_rtt, scan_timeit  # noqa: E402


def build(batch=24, kv_heads=8, d=128, kv_len=8192, page=128):  # noqa
    pps = kv_len // page
    num_pages = batch * pps + 1
    k_pages = jax.random.normal(jax.random.key(1),
                                (kv_heads, num_pages, page, d))
    v_pages = jax.random.normal(jax.random.key(2),
                                (kv_heads, num_pages, page, d))
    out = {}
    for qd in ("int8", "int4"):
        kq, ks = quantize_rows(k_pages, qd)
        vq, vs = quantize_rows(v_pages, qd)
        if qd == "int4":
            kq = pack_pages_payload("int4", kq.reshape(kv_heads, -1, d),
                                    num_pages, page)
            vq = pack_pages_payload("int4", vq.reshape(kv_heads, -1, d),
                                    num_pages, page)
        out[qd] = (kq, vq, ks, vs)
    table = (jax.random.permutation(jax.random.key(3), num_pages - 1)
             [: batch * pps] + 1).reshape(batch, pps).astype(jnp.int32)
    lens = jnp.full((batch,), kv_len, jnp.int32)
    return out, table, lens


def dma_sum_kernel(table_ref, seed_ref, pages, out_ref, buf, sems, *,
                   pps, rows, unpack):
    """Stream every page of one batch row via the same strided per-page
    DMA the decode kernel uses; reduce with adds only. seed (a
    carry-dependent input block) feeds the accumulator so the whole call
    cannot be hoisted out of the timing scan as loop-invariant."""
    b = pl.program_id(0)

    def copy(j, slot):
        page_id = table_ref[b, j]
        return pltpu.make_async_copy(
            pages.at[:, page_id], buf.at[slot, :, j % 2], sems.at[slot % 2]
        )

    acc = seed_ref[0].astype(jnp.float32)

    def body(j, acc):
        copy(j, 0).start()
        copy(j, 0).wait()
        blk = buf[0, :, j % 2]  # [hkv, rows, d]
        x = blk.reshape(-1, blk.shape[-1])
        if unpack:
            x = _unpack_int4(x)
        xs = x.astype(jnp.float32)
        return acc + jnp.sum(xs.reshape(-1, 8, 128), axis=0)

    acc = jax.lax.fori_loop(0, pps, body, acc)
    out_ref[0] = acc


def time_dma_sum(pool, table, rtt, pps, unpack, label):
    hkv, num_pages, rows, d = pool.shape
    batch = table.shape[0]
    kern = functools.partial(dma_sum_kernel, pps=pps, rows=rows,
                             unpack=unpack)
    call = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(batch,),
            in_specs=[pl.BlockSpec((1, 8, 128), lambda b, *_: (0, 0, 0)),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda b, *_: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((1, hkv, 2, rows, d), pool.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((batch, 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )

    def step(c, pool, table):
        seed = jnp.broadcast_to(c, (1, 8, 128))
        o = call(table, seed, pool)
        return chain(c, jnp.sum(o))

    c0 = jnp.zeros((), jnp.float32)
    dt = scan_timeit(step, c0, args=(pool, table), rtt=rtt, iters=48)
    bytes_moved = batch * pps * hkv * rows * d * pool.dtype.itemsize
    print(f"{label}: {dt*1e3:.3f} ms ({bytes_moved/dt/1e9:.0f} GB/s)",
          flush=True)
    return dt


def main():
    rtt = measure_rtt()
    print(f"rtt ~{rtt*1e3:.1f} ms", flush=True)
    pools, table, lens = build()
    q = jax.random.normal(jax.random.key(0), (24, 32, 128), jnp.bfloat16)
    times = {}
    for qd in ("int8", "int4"):
        kq, vq, ks, vs = pools[qd]

        def step(qc, kq, vq, lens, table, ks, vs, qd=qd):
            out = paged_attention(
                qc, kq, vq, lens, table, k_scales=ks, v_scales=vs,
                quant_dtype=("int4" if qd == "int4" else None))
            return chain(qc, out)

        dt = scan_timeit(step, q, args=(kq, vq, lens, table, ks, vs),
                         rtt=rtt, iters=48)
        times[qd] = dt
        print(f"paged {qd}: {dt*1e3:.3f} ms", flush=True)
    print(f"kernel speedup int4 vs int8: {times['int8']/times['int4']:.2f}x",
          flush=True)
    # int4 at page=256: packed pages carry 128 rows — the same DMA
    # geometry as int8's 128-row pages (the serial-DMA floor shows
    # per-page transfers are LATENCY-bound: halving bytes at fixed row
    # count only reaches 0.75x, so give int4 bigger pages instead)
    pools256, table256, lens256 = build(page=256)
    kq, vq, ks, vs = pools256["int4"]

    def step256(qc, kq, vq, lens, table, ks, vs):
        out = paged_attention(qc, kq, vq, lens, table, k_scales=ks,
                              v_scales=vs, quant_dtype="int4")
        return chain(qc, out)

    dt256 = scan_timeit(step256, q, args=(kq, vq, lens256, table256, ks, vs),
                        rtt=rtt, iters=48)
    print(f"paged int4 page=256: {dt256*1e3:.3f} ms "
          f"({times['int8']/dt256:.2f}x vs int8@128)", flush=True)
    pps = 8192 // 128
    t8 = time_dma_sum(pools["int8"][0], table, rtt, pps, False,
                      "dma+sum int8 K-pool")
    t4 = time_dma_sum(pools["int4"][0], table, rtt, pps, False,
                      "dma+sum int4 K-pool")
    t4u = time_dma_sum(pools["int4"][0], table, rtt, pps, True,
                       "dma+unpack int4 K-pool")
    print(f"dma floor ratio int4/int8: {t4/t8:.2f} (bytes predict 0.50); "
          f"unpack adds {((t4u-t4)/t4*100):.0f}%", flush=True)


if __name__ == "__main__":
    main()
