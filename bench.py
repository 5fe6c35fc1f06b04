"""Headline benchmark: decode attention HBM roofline with INT8 paged KV.

Prints the full headline as JSON lines (driver captures the tail; the
LAST line is the parsed headline metric):
  {"metric": "prefill_tflops_s2048", ...}
  {"metric": "prefill_tflops_s8192", ...}
  {"metric": "backward_tflops_s2048", ...}
  {"metric": "serve_prefill_tok_s", ...}  (4-layer int8 slice)
  {"metric": "serve_decode_tok_s", ...}
  {"metric": "decode_hbm_roofline_pct", "value": N, "unit": "%",
   "vs_baseline": N/85.0}

North star (BASELINE.json): decode attention at >85% of the HBM roofline
with INT8 KV-cache at KV length 8192, Llama-3-8B-shaped heads (32 q / 8 kv,
head_dim 128). vs_baseline is the achieved fraction of that 85% target, so
1.0 = target met, >1.0 = beaten.

Timing methodology (this environment tunnels to the TPU and
block_until_ready does not truly block; per-sync RTT is ~25ms): each
benchmark runs ITERS chained iterations inside ONE jitted lax.scan (the
carry feeds each step so nothing is CSE'd or overlapped away), reads back a
scalar (a real device->host sync), and subtracts the separately measured
round-trip time of a trivial jitted op. Secondary numbers (bf16 decode,
prefill TFLOP/s) go to stderr.
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

import sys as _sys
import os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

from mfa_tpu.utils.timing import (  # noqa: E402
    chain as _chain,
    device_bw,
    measure_rtt,
    scan_timeit,
)


def bench_decode_int8(rtt, batch=24, heads=32, kv_heads=8, d=128, kv_len=8192,
                      page=128, quant="int8"):
    from mfa_tpu.cache.paged_cache import pack_pages_payload
    from mfa_tpu.kernels.paged import paged_attention
    from mfa_tpu.kernels.quant import quantize_rows

    pps = kv_len // page
    num_pages = batch * pps + 1
    q0 = jax.random.normal(jax.random.key(0), (batch, heads, d), jnp.bfloat16)
    k_pages = jax.random.normal(jax.random.key(1), (kv_heads, num_pages, page, d))
    v_pages = jax.random.normal(jax.random.key(2), (kv_heads, num_pages, page, d))
    kq, ks = quantize_rows(k_pages, quant)
    vq, vs = quantize_rows(v_pages, quant)
    if quant == "int4":  # token-pair nibble-packed pages
        kq = pack_pages_payload("int4", kq.reshape(kv_heads, -1, d),
                                num_pages, page)
        vq = pack_pages_payload("int4", vq.reshape(kv_heads, -1, d),
                                num_pages, page)
    table = (
        jax.random.permutation(jax.random.key(3), num_pages - 1)[: batch * pps] + 1
    ).reshape(batch, pps).astype(jnp.int32)
    lens = jnp.full((batch,), kv_len, jnp.int32)
    jax.block_until_ready((kq, vq, ks, vs))

    def step(q, kq, vq, lens, table, ks, vs):
        out = paged_attention(q, kq, vq, lens, table, k_scales=ks, v_scales=vs,
                              quant_dtype=(quant if quant == "int4" else None))
        return _chain(q, out)

    dt = scan_timeit(step, q0, args=(kq, vq, lens, table, ks, vs), rtt=rtt)

    payload = 2 * batch * kv_heads * kv_len * d  # int8 K+V bytes
    if quant == "int4":
        payload //= 2
    scales = 2 * batch * kv_heads * kv_len * 4  # fp32 row scales
    qo = batch * heads * d * (2 + 4)
    bytes_moved = payload + scales + qo
    gbps = bytes_moved / dt / 1e9
    pct = 100.0 * bytes_moved / dt / device_bw()
    return dt, gbps, pct


def bench_decode_bf16(rtt, batch=24, heads=24, kv_heads=24, d=128, kv_len=8192):
    from mfa_tpu.kernels.decode import decode_attention

    q0 = jax.random.normal(jax.random.key(0), (batch, heads, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (batch, kv_heads, kv_len, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (batch, kv_heads, kv_len, d), jnp.bfloat16)
    lens = jnp.full((batch,), kv_len, jnp.int32)

    def step(q, k, v, lens):
        return _chain(q, decode_attention(q, k, v, lens))

    dt = scan_timeit(step, q0, args=(k, v, lens), rtt=rtt)
    bytes_moved = 2 * batch * kv_heads * kv_len * d * 2
    return dt, bytes_moved / dt / 1e9, 100.0 * bytes_moved / dt / device_bw()


def bench_prefill(rtt, batch=8, seq=2048, heads=24, d=128):
    from mfa_tpu.kernels.prefill import prefill_attention

    q0 = jax.random.normal(jax.random.key(0), (batch, heads, seq, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (batch, heads, seq, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (batch, heads, seq, d), jnp.bfloat16)

    def step(q, k, v):
        return _chain(q, prefill_attention(q, k, v, causal=True))

    dt = scan_timeit(step, q0, args=(k, v), rtt=rtt)
    flops = 4 * batch * heads * seq * seq * d * 0.5  # causal
    return dt, flops / dt / 1e12


def bench_multimodal(rtt, batch=4, seq=1024, heads=8, kv_heads=4, d=128,
                     image_tokens=256):
    """Image-block flash kernel (Gemma3 bidirectional image runs) on chip:
    the BlockSpec class that produced round 2's TPU-only crash now gets
    captured hardware evidence every round (VERDICT r2 weak #6)."""
    import numpy as np

    from mfa_tpu.kernels.blockmask import image_block_prefill

    q0 = jax.random.normal(jax.random.key(0), (batch, heads, seq, d),
                           jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (batch, kv_heads, seq, d),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (batch, kv_heads, seq, d),
                          jnp.bfloat16)
    bids = np.full((batch, seq), -1, np.int32)
    bids[:, seq // 4: seq // 4 + image_tokens] = 0
    bids = jnp.asarray(bids)

    def step(q, k, v, bids):
        return _chain(q, image_block_prefill(q, k, v, bids))

    dt = scan_timeit(step, q0, args=(k, v, bids), rtt=rtt)
    flops = 4 * batch * heads * d * (seq * seq * 0.5
                                     + image_tokens ** 2 * 0.5)
    return dt, flops / dt / 1e12


def bench_backward(rtt, batch=8, seq=2048, heads=24, d=128):
    from mfa_tpu.kernels.autodiff import flash_attention_grad

    q0 = jax.random.normal(jax.random.key(0), (batch, heads, seq, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (batch, heads, seq, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (batch, heads, seq, d), jnp.bfloat16)

    loss = lambda q, k, v: flash_attention_grad(q, k, v, True).astype(  # noqa: E731
        jnp.float32).sum()

    def step(q, k, v):
        dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        return _chain(q, dq + dk + dv)

    dt = scan_timeit(step, q0, args=(k, v), rtt=rtt)
    # fwd recompute (2 matmuls) + bwd (5 matmuls): 3.5x the causal fwd cost
    flops = 3.5 * 4 * batch * heads * seq * seq * d * 0.5
    return dt, flops / dt / 1e12


def bench_decode_step(rtt, layers=16, dim=2048, heads=32, kv_heads=8,
                      ffn=8192, vocab=128256, batch=16, quant="int8",
                      wquant=None, page=128, pps=4, n_steps=8):
    """DEVICE-ONLY full-model decode step at the 1B serve shape: the
    decode_burst scan is timed with N-vs-2N differencing, so the number is
    immune to the tunnel's session drift (VERDICT r3 weak #2 — the serve
    tok/s wall-clock drifted 2.34->3.02 ms/layer across a day on identical
    code). Returns seconds per decode STEP (all layers + lm_head +
    sampling)."""
    import dataclasses

    import numpy as np

    from mfa_tpu.models import llama

    cfg = llama.LlamaConfig(
        vocab_size=vocab, dim=dim, n_layers=layers, n_heads=heads,
        n_kv_heads=kv_heads, ffn_dim=ffn, dtype=jnp.bfloat16)
    params = llama.init_params(jax.random.key(0), cfg, quantize=wquant)
    num_pages = batch * pps + 1
    cache = llama.build_kv_caches(cfg, num_pages, page, batch,
                                  pages_per_seq=pps, quant_dtype=quant)
    tables = np.zeros((batch, pps), np.int32)
    for b in range(batch):
        tables[b] = 1 + b * pps + np.arange(pps)
    cache = dataclasses.replace(
        cache, block_tables=jnp.asarray(tables),
        lengths=jnp.full((batch,), 300, jnp.int32))
    toks0 = jnp.ones((batch,), jnp.int32)
    slots = jnp.arange(batch, dtype=jnp.int32)

    def step(toks, params, cache, slots):
        # lengths reset each iteration: same compiled program, no growth
        _, out, _ = llama.decode_burst(params, cfg, cache, slots, toks,
                                       n_steps)
        return _chain(toks, out[-1])

    dt = scan_timeit(step, toks0, args=(params, cache, slots), rtt=rtt,
                     iters=48)
    from mfa_tpu.models.wquant import params_nbytes

    wbytes = params_nbytes(params)
    return dt / n_steps, wbytes


def _emit(metric, value, unit, baseline):
    print(json.dumps({
        "metric": metric, "value": round(value, 2), "unit": unit,
        "vs_baseline": round(value / baseline, 4),
    }))


def main():
    rtt = measure_rtt()
    print(f"[bench] measured sync RTT: {rtt*1e3:.1f} ms", file=sys.stderr)
    try:
        from benchmark.serve import run_serve

        # THE BASELINE.md NORTH-STAR CONFIG. Runs FIRST on a clean
        # device heap: ~8 GB of int8 weights need a contiguous region
        # the allocator cannot provide after the other benches
        # fragment it (r4: standalone 8B passed while the bench's
        # mid-run attempt hit RESOURCE_EXHAUSTED). First measured in
        # round 4: full Llama-3-8B-shaped serving (32L/4096d/32q/8kv/
        # ffn14336/vocab128256) on ONE 16 GB chip — int8 weights (~8.5 GB,
        # models/wquant.py) + int8 KV.
        res8 = run_serve(layers=32, dim=4096, heads=32, kv_heads=8,
                         ffn=14336, vocab=128256, batch=16, prompt_len=256,
                         gen=32, quant="int8", wquant="int8", burst=16)
        print(
            f"[bench] serve Llama-3-8B-shaped (32L int8 weights + int8 KV) "
            f"b16 prompt256 gen32: prefill {res8['prefill_tps']:.0f} tok/s, "
            f"decode {res8['decode_tps']:.0f} tok/s, per-layer step "
            f"{res8['per_layer_ms']:.3f} ms",
            file=sys.stderr,
        )
        _emit("serve_8b_decode_tok_s", res8["decode_tps"], "tok/s", 100.0)
    except Exception as e:
        print(f"[bench] 8B serve bench failed: {e}", file=sys.stderr)
    import gc

    gc.collect()
    dt, gbps, pct = bench_decode_int8(rtt)
    print(
        f"[bench] int8 paged decode kv=8192 (b24 32q/8kv d128): {dt*1e3:.3f} ms, "
        f"{gbps:.0f} GB/s, {pct:.1f}% of HBM roofline",
        file=sys.stderr,
    )
    # Secondary headline metrics: each emits its own JSON line (captured in
    # the driver tail); failures must not kill the headline metric, which
    # is printed LAST so the driver parses it.
    try:
        dt8, gbps8, pct8 = bench_decode_int8(rtt, quant="fp8")
        print(
            f"[bench] fp8 paged decode kv=8192 (same shapes): {dt8*1e3:.3f} ms, "
            f"{gbps8:.0f} GB/s, {pct8:.1f}% of HBM roofline "
            f"(BASELINE.md north-star FP8-KV config)",
            file=sys.stderr,
        )
        _emit("decode_fp8_roofline_pct", pct8, "%", 85.0)
        dt4, gbps4, pct4 = bench_decode_int8(rtt, quant="int4")
        print(
            f"[bench] int4 paged decode kv=8192 (same shapes): {dt4*1e3:.3f} ms "
            f"({dt/dt4:.2f}x vs int8, 2x KV density), {gbps4:.0f} GB/s, "
            f"{pct4:.1f}% of HBM roofline (real bytes: nibble payload + "
            f"fp32 scales)",
            file=sys.stderr,
        )
        _emit("decode_int4_vs_int8_speedup", dt / dt4, "x", 1.14)
        _emit("decode_int4_roofline_pct", pct4, "%", 85.0)
        dtb, gbpsb, pctb = bench_decode_bf16(rtt)
        print(
            f"[bench] bf16 decode kv=8192 (b24 h24 MHA): {dtb*1e3:.3f} ms, "
            f"{gbpsb:.0f} GB/s, {pctb:.1f}% roofline",
            file=sys.stderr,
        )
    except Exception as e:  # secondary benches must not kill the headline
        print(f"[bench] decode secondary bench failed: {e}", file=sys.stderr)
    try:
        dtp, tflops = bench_prefill(rtt)
        print(
            f"[bench] bf16 causal prefill b8 s2048 h24 d128: {dtp*1e3:.3f} ms, "
            f"{tflops:.1f} TFLOP/s",
            file=sys.stderr,
        )
        _emit("prefill_tflops_s2048", tflops, "TFLOP/s", 79.83)
        dtp8, tflops8 = bench_prefill(rtt, batch=2, seq=8192)
        print(
            f"[bench] bf16 causal prefill b2 s8192 h24 d128: {dtp8*1e3:.3f} ms, "
            f"{tflops8:.1f} TFLOP/s",
            file=sys.stderr,
        )
        _emit("prefill_tflops_s8192", tflops8, "TFLOP/s", 134.96)
    except Exception as e:
        print(f"[bench] prefill bench failed: {e}", file=sys.stderr)
    try:
        dtm, tflopsm = bench_multimodal(rtt)
        print(
            f"[bench] image-block prefill b4 s1024 8q/4kv d128 run256: "
            f"{dtm*1e3:.3f} ms, {tflopsm:.1f} TFLOP/s",
            file=sys.stderr,
        )
        _emit("multimodal_prefill_tflops", tflopsm, "TFLOP/s", 63.11)
    except Exception as e:
        print(f"[bench] multimodal bench failed: {e}", file=sys.stderr)
    try:
        dtw, tflopsw = bench_backward(rtt)
        print(
            f"[bench] bf16 causal fwd+bwd b8 s2048 h24 d128: {dtw*1e3:.3f} ms, "
            f"{tflopsw:.1f} TFLOP/s",
            file=sys.stderr,
        )
        # baselines = LAST CAPTURED values (BENCH_r03) per the CLAUDE.md
        # rule; README/docs tables reconcile to the same captures
        _emit("backward_tflops_s2048", tflopsw, "TFLOP/s", 97.1)
    except Exception as e:
        print(f"[bench] backward bench failed: {e}", file=sys.stderr)
    try:
        from benchmark.serve import run_serve

        res = run_serve(layers=4, batch=16, prompt_len=256, gen=128,
                        quant="int8", burst=16)
        print(
            f"[bench] serve 4-layer int8 slice b16 prompt256 gen128: "
            f"prefill {res['prefill_tps']:.0f} tok/s, "
            f"decode {res['decode_tps']:.0f} tok/s, "
            f"per-layer step {res['per_layer_ms']:.3f} ms",
            file=sys.stderr,
        )
        _emit("serve_prefill_tok_s", res["prefill_tps"], "tok/s", 25204.0)
        _emit("serve_decode_tok_s", res["decode_tps"], "tok/s", 2462.0)
    except Exception as e:
        print(f"[bench] serve bench failed: {e}", file=sys.stderr)
    try:
        # FULL-MODEL serving: Llama-3.2-1B-shaped stack (16 layers,
        # dim 2048, 32q/8kv, head_dim 64, ffn 8192, vocab 128256) — the
        # tok/s number at a real model shape, not only the 4-layer slice
        # (VERDICT r2 missing #2).
        res1 = run_serve(layers=16, dim=2048, heads=32, kv_heads=8,
                         ffn=8192, vocab=128256, batch=16, prompt_len=256,
                         gen=48, quant="int8", burst=16)
        print(
            f"[bench] serve Llama-3.2-1B-shaped (16L int8 KV) b16 "
            f"prompt256 gen48: prefill {res1['prefill_tps']:.0f} tok/s, "
            f"decode {res1['decode_tps']:.0f} tok/s, per-layer step "
            f"{res1['per_layer_ms']:.3f} ms",
            file=sys.stderr,
        )
        _emit("serve_1b_decode_tok_s", res1["decode_tps"], "tok/s", 1088.1)
    except Exception as e:
        print(f"[bench] 1B serve bench failed: {e}", file=sys.stderr)
    try:
        # DEVICE-ONLY decode step at the 1B shape (bf16 vs int8 weights):
        # scan-timed, immune to tunnel session drift — the attributable
        # decode-step metric (VERDICT r3 next #3).
        dts, wb = bench_decode_step(rtt)
        bound = wb / 819e9
        print(
            f"[bench] device decode step 1B-shaped (16L b16 int8 KV, bf16 "
            f"weights): {dts*1e3:.3f} ms/step ({dts/16*1e3:.3f} ms/layer, "
            f"weight-stream bound {bound*1e3:.3f} ms, "
            f"{100*bound/dts:.0f}% of bound)",
            file=sys.stderr,
        )
        _emit("decode_step_per_layer_ms", dts / 16 * 1e3, "ms", 0.9)
        dtsq, wbq = bench_decode_step(rtt, wquant="int8")
        boundq = wbq / 819e9
        print(
            f"[bench] device decode step 1B-shaped INT8 weights: "
            f"{dtsq*1e3:.3f} ms/step ({dtsq/16*1e3:.3f} ms/layer, "
            f"weight-stream bound {boundq*1e3:.3f} ms, "
            f"{100*boundq/dtsq:.0f}% of bound)",
            file=sys.stderr,
        )
        _emit("decode_step_int8w_per_layer_ms", dtsq / 16 * 1e3, "ms", 0.9)
    except Exception as e:
        print(f"[bench] decode-step bench failed: {e}", file=sys.stderr)
    try:
        # Speculative decoding, captured on chip for the first time
        # (VERDICT r3 weak #5): 4-token self-drafted spec at the 4-layer
        # slice shape, reporting acceptance and tok/s vs plain decode.
        ress = run_serve(layers=4, batch=16, prompt_len=256, gen=128,
                         quant="int8", burst=16, spec=4)
        print(
            f"[bench] serve speculative (spec=4, 1-layer draft): decode "
            f"{ress['decode_tps']:.0f} tok/s, acceptance "
            f"{ress['spec_acceptance']:.2f} "
            f"({ress['spec_accepted']}/{ress['spec_proposed']})",
            file=sys.stderr,
        )
        _emit("serve_spec_decode_tok_s", ress["decode_tps"], "tok/s",
              1000.0)
    except Exception as e:
        print(f"[bench] speculative serve bench failed: {e}", file=sys.stderr)
    try:
        from benchmark.train import run_train_bench

        rest = run_train_bench()
        print(
            f"[bench] train step (8L 1B-shaped slice, "
            f"{rest['n_params']/1e9:.2f}B params, b4 s2048, remat, AdamW): "
            f"{rest['step_s']*1e3:.1f} ms, {rest['tokens_per_s']:.0f} "
            f"tok/s/chip, ~{rest['mfu_flops']/1e12:.1f} TFLOP/s",
            file=sys.stderr,
        )
        _emit("train_tok_s_per_chip", rest["tokens_per_s"], "tok/s", 28973.8)
    except Exception as e:
        print(f"[bench] train bench failed: {e}", file=sys.stderr)

    _emit("decode_hbm_roofline_pct", pct, "%", 85.0)


if __name__ == "__main__":
    main()
