"""Decompose the 1B decode step against its weight-streaming bound.

BENCH r4 device-only capture: bf16 weights 0.478 ms/layer (48% of the
3.66 ms weight bound); int8 layer weights bring the step to ~6.36 ms
(0.40 ms/layer). This probe attributes the remaining non-weight time by
ablation, all scan-timed (iters>=48):

  full              int8-layer-weights config (the serving default)
  vocab512          drops the lm_head matmul + full-vocab sampling
  bf16-cache        drops append quantize + scales scatter + in-kernel
                    dequant (keeps the same attention shapes)
  attn-only         the 16 paged_attention calls alone at the step's
                    shapes (kv=300) — kernel fixed cost at tiny kv
  mm-only           the 16 layers' matmul stack alone (no attention, no
                    cache) — the pure weight-streaming piece

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_decode_step2.py
"""
import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mfa_tpu.models import llama  # noqa: E402
from mfa_tpu.models.wquant import quantize_params  # noqa: E402
from mfa_tpu.utils.timing import chain, measure_rtt, scan_timeit  # noqa: E402

BATCH, PAGE, PPS, NSTEPS = 16, 128, 4, 8


def build(vocab=128256, quant="int8", wq=True):
    cfg = llama.LlamaConfig(
        vocab_size=vocab, dim=2048, n_layers=16, n_heads=32, n_kv_heads=8,
        ffn_dim=8192, dtype=jnp.bfloat16)
    params = llama.init_params(jax.random.key(0), cfg)
    if wq:
        q = quantize_params(params)
        params = dict(params, layers=q["layers"], embed=q["embed"])
    cache = llama.build_kv_caches(cfg, BATCH * PPS + 1, PAGE, BATCH,
                                  pages_per_seq=PPS, quant_dtype=quant)
    tables = np.zeros((BATCH, PPS), np.int32)
    for b in range(BATCH):
        tables[b] = 1 + b * PPS + np.arange(PPS)
    cache = dataclasses.replace(
        cache, block_tables=jnp.asarray(tables),
        lengths=jnp.full((BATCH,), 300, jnp.int32))
    return cfg, params, cache


def time_step(rtt, cfg, params, cache, label):
    toks0 = jnp.ones((BATCH,), jnp.int32)
    slots = jnp.arange(BATCH, dtype=jnp.int32)

    def step(toks, params, cache, slots):
        _, out, _ = llama.decode_burst(params, cfg, cache, slots, toks,
                                       NSTEPS)
        return chain(toks, out[-1])

    dt = scan_timeit(step, toks0, args=(params, cache, slots), rtt=rtt,
                     iters=48)
    print(f"{label}: {dt/NSTEPS*1e3:.3f} ms/step", flush=True)
    return dt / NSTEPS


def main():
    rtt = measure_rtt()
    print(f"rtt ~{rtt*1e3:.1f} ms", flush=True)
    cfg, params, cache = build()
    t_full = time_step(rtt, cfg, params, cache, "full (int8 layers)")
    cfg5, p5, c5 = build(vocab=512)
    t_v = time_step(rtt, cfg5, p5, c5, "vocab512")
    cfgb, pb, cb = build(quant=None)
    t_bf = time_step(rtt, cfgb, pb, cb, "bf16 cache")

    # attention alone: 16 chained paged_attention calls at the step shape
    from mfa_tpu.kernels.paged import paged_attention

    # StackedKVCache merges layers into one pool — layer 0's pages are
    # physical ids [0, num_pages)
    P = cache.num_pages
    kq = cache.k_pages[:, :P]
    vq = cache.v_pages[:, :P]
    ks, vs = cache.k_scales[:, :P], cache.v_scales[:, :P]
    lens = cache.lengths
    tables = cache.block_tables
    q0 = jax.random.normal(jax.random.key(1), (BATCH, 32, 128),
                           jnp.bfloat16)

    def attn_step(q, kq, vq, lens, tables, ks, vs):
        o = q
        for _ in range(16):
            o = chain(o, paged_attention(o, kq, vq, lens, tables,
                                         k_scales=ks, v_scales=vs))
        return o

    ta = scan_timeit(attn_step, q0, args=(kq, vq, lens, tables, ks, vs),
                     rtt=rtt, iters=48)
    print(f"attn-only (16 calls, kv=300): {ta*1e3:.3f} ms "
          f"({ta/16*1e3:.3f} ms/call)", flush=True)

    # matmul stack alone (int8 layer weights, bf16 activations)
    from mfa_tpu.models.wquant import qmm

    lp = params["layers"]
    x0 = jax.random.normal(jax.random.key(2), (BATCH, 2048), jnp.bfloat16)

    def mm_step(x, lp):
        def body(c, l):
            h = qmm(c, l["wq"])
            h = h + qmm(c, l["wk"]) .sum() * 0  # consume
            g = qmm(c, l["w_gate"])
            u = qmm(c, l["w_up"])
            d = qmm(jax.nn.silu(g) * u, l["w_down"])
            return chain(c, d), 0
        out, _ = jax.lax.scan(body, x, lp)
        return out

    tm = scan_timeit(mm_step, x0, args=(lp,), rtt=rtt, iters=48)
    print(f"mm-approx (16 layers, gate/up/down/wq/wk int8): {tm*1e3:.3f} ms",
          flush=True)
    print(f"decomposition: full {t_full*1e3:.2f} = lm_head+sampling "
          f"{(t_full-t_v)*1e3:.2f} + cache-quant {(t_full-t_bf)*1e3:+.2f} "
          f"+ attn {ta*1e3:.2f} + mm ~{tm*1e3:.2f} + rest", flush=True)


if __name__ == "__main__":
    main()
