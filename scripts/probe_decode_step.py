"""Decompose the serving DECODE step at the headline shape.

The serve bench measures ~2.3-3.0 ms per layer per decode step at
4L/dim4096/b16/int8 — but the step's weight streaming alone bounds it at
~0.55 ms/layer (0.44 GB of bf16 weights at 819 GB/s) plus ~0.3 ms of
lm_head per step. This probe times decode_burst on-device (N vs 2N
differencing removes everything host-side) and A/Bs the suspects:
int8 vs bf16 cache (append quantize + scales scatter), batch size, and
a no-lm_head variant approximated by vocab=512.

Usage: python scripts/probe_decode_step.py
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from mfa_tpu.models import llama
from mfa_tpu.utils.timing import chain, measure_rtt, scan_timeit


def build(layers, dim, heads, kv_heads, ffn, vocab, batch, quant,
          page=128, pps=4):
    cfg = llama.LlamaConfig(
        vocab_size=vocab, dim=dim, n_layers=layers, n_heads=heads,
        n_kv_heads=kv_heads, ffn_dim=ffn, dtype=jnp.bfloat16)
    params = llama.init_params(jax.random.key(0), cfg)
    num_pages = batch * pps + 1
    cache = llama.build_kv_caches(cfg, num_pages, page, batch,
                                  pages_per_seq=pps, quant_dtype=quant)
    # map pages + set lengths ~ mid-generation (kv ~ 300)
    import numpy as np

    tables = np.zeros((batch, pps), np.int32)
    for b in range(batch):
        tables[b] = 1 + b * pps + np.arange(pps)
    import dataclasses

    cache = dataclasses.replace(
        cache,
        block_tables=jnp.asarray(tables),
        lengths=jnp.full((batch,), 300, jnp.int32))
    return cfg, params, cache


def time_burst(cfg, params, cache, batch, rtt, n_steps=16):
    toks0 = jnp.ones((batch,), jnp.int32)
    slots = jnp.arange(batch, dtype=jnp.int32)

    def step(toks, params, cache, slots, _n=n_steps):
        # lengths reset each iteration (same compiled program, no growth)
        _, out, _ = llama.decode_burst(params, cfg, cache, slots, toks,
                                       _n)
        return chain(toks, out[-1])

    dt = scan_timeit(step, toks0, args=(params, cache, slots), rtt=rtt,
                     iters=8)
    return dt / n_steps


def main():
    rtt = measure_rtt()
    print(f"rtt ~{rtt*1e3:.1f} ms", flush=True)
    base = dict(layers=4, dim=4096, heads=32, kv_heads=8, ffn=14336,
                vocab=32000, batch=16)
    variants = [
        ("serve shape int8", dict(base, quant="int8")),
        ("bf16 cache", dict(base, quant=None)),
        ("vocab512 (no lm_head cost)", dict(base, vocab=512, quant="int8")),
        ("batch64", dict(base, batch=64, quant="int8")),
    ]
    for name, kw in variants:
        batch = kw.pop("batch")
        try:
            cfg, params, cache = build(batch=batch, **kw)
            dt = time_burst(cfg, params, cache, batch, rtt)
            wbytes = sum(x.size * x.dtype.itemsize
                         for x in jax.tree.leaves(params))
            print(f"{name}: {dt*1e3:.3f} ms/step "
                  f"({dt/kw['layers']*1e3:.3f} ms/layer, "
                  f"{batch/dt:.0f} tok/s, weight roofline "
                  f"{wbytes/819e9*1e3:.2f} ms)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
