"""Round-4 follow-ups: (1) why did the 1B decode step get SLOWER with
int8 weights (0.542 vs 0.478 ms/layer, first r4 bench) when the 8B-shape
matmul probe shows int8 2x faster? (2) what blew memory in the 8B serve
bench (RESOURCE_EXHAUSTED)?

Part 1 decomposes the 1B layer shapes: per-matmul qmm-xla vs bf16 at
din=2048 (wq 2048x2048, gate/up 2048x8192, down 8192x2048) and the
lm_head 2048x128256, plus an embed qtake gather — all scanned over 8
stacked copies so weights can't stay VMEM-resident.

Part 2 prints device memory stats, then builds the 8B int8 engine pieces
one by one (params -> cache -> prefill -> decode_burst) to find the
allocation that fails.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_r4b.py [mem]
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from mfa_tpu.models.wquant import quantize_weight  # noqa: E402
from mfa_tpu.utils.timing import chain, measure_rtt, scan_timeit  # noqa: E402

L = 8


def time_mm(rtt, batch, din, dout, label, L=L):
    ws = jax.random.normal(jax.random.key(1), (L, din, dout), jnp.bfloat16)
    qw = quantize_weight(ws)
    x0 = jax.random.normal(jax.random.key(0), (batch, din), jnp.bfloat16)

    def f_bf16(x, ws):
        def body(c, w):
            return chain(c, jnp.sum(c @ w, axis=1, keepdims=True)), 0
        return jax.lax.scan(body, x, ws)[0]

    def f_q(x, wq8, scale):
        def body(c, xs):
            w8, s = xs
            o = (c @ w8.astype(c.dtype)) * s.astype(c.dtype)
            return chain(c, jnp.sum(o, axis=1, keepdims=True)), 0
        return jax.lax.scan(body, x, (wq8, scale))[0]

    tb = scan_timeit(f_bf16, x0, args=(ws,), rtt=rtt, iters=48)
    tq = scan_timeit(f_q, x0, args=(qw.qw, qw.scale), rtt=rtt, iters=48)
    bf_bytes = ws.shape[0] * din * dout * 2
    print(f"{label} b={batch} {din}x{dout}: bf16 {tb*1e3:.3f} ms "
          f"({bf_bytes/tb/1e9:.0f} GB/s), int8 {tq*1e3:.3f} ms "
          f"({bf_bytes/2/tq/1e9:.0f} GB/s) -> {tb/tq:.2f}x", flush=True)


def part1():
    rtt = measure_rtt()
    print(f"rtt ~{rtt*1e3:.1f} ms", flush=True)
    for din, dout, label, nl in ((2048, 2048, "wq(1B)", 8),
                                 (2048, 8192, "gate(1B)", 8),
                                 (8192, 2048, "down(1B)", 8),
                                 # lm_head: 2 copies only (8 stacked
                                 # 2048x128256 fp32 transients OOM)
                                 (2048, 128256, "lm_head(1B)", 2)):
        time_mm(rtt, 16, din, dout, label, L=nl)


def part2():
    import dataclasses

    import numpy as np

    from mfa_tpu.models import llama

    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    print("memory_stats:", stats, flush=True)
    cfg = llama.LlamaConfig(
        vocab_size=128256, dim=4096, n_layers=32, n_heads=32,
        n_kv_heads=8, ffn_dim=14336, dtype=jnp.bfloat16)
    print("init int8 params...", flush=True)
    params = llama.init_params(jax.random.key(0), cfg, quantize="int8")
    from mfa_tpu.models.wquant import params_nbytes

    nb = params_nbytes(params)
    jax.block_until_ready(jax.tree.leaves(params)[0])
    print(f"params ok: {nb/1e9:.2f} GB", flush=True)
    stats = getattr(dev, "memory_stats", lambda: None)()
    print("memory_stats after params:", stats, flush=True)
    batch, page, pps = 16, 128, 4
    cache = llama.build_kv_caches(cfg, batch * pps + 1, page, batch,
                                  pages_per_seq=pps, quant_dtype="int8")
    tables = np.zeros((batch, pps), np.int32)
    for b in range(batch):
        tables[b] = 1 + b * pps + np.arange(pps)
    cache = dataclasses.replace(
        cache, block_tables=jnp.asarray(tables),
        lengths=jnp.full((batch,), 300, jnp.int32))
    jax.block_until_ready(cache.k_pages)
    print("cache ok", flush=True)
    toks = jnp.ones((batch,), jnp.int32)
    slots = jnp.arange(batch, dtype=jnp.int32)
    print("decode_burst(8)...", flush=True)
    cache2, out, _ = llama.decode_burst(params, cfg, cache, slots, toks, 8)
    jax.block_until_ready(out)
    print("decode_burst ok", flush=True)
    print("prefill_batch(256)...", flush=True)
    prompts = [list(range(1, 257)) for _ in range(batch)]
    pages_l = [list(tables[i]) for i in range(batch)]
    cache3, logits = llama.prefill_batch(
        params, cfg, cache, slots, pages_l, prompts)
    jax.block_until_ready(logits)
    print("prefill ok", flush=True)


if __name__ == "__main__":
    if "mem" in sys.argv[1:]:
        part2()
    else:
        part1()
