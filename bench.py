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

Capture robustness (round 4's failure mode: the in-process 8B serve bench
left ~8.5 GB on the 16 GB chip and the unprotected headline call then died
RESOURCE_EXHAUSTED, zeroing the round's evidence): every heavyweight bench
group (full-model serving, train, decode-step) now runs in its OWN
SUBPROCESS — its own process is its own TPU heap, so nothing it allocates
can fragment the parent. The parent runs only the small kernel-level
benches, measures the headline FIRST on a clean heap, parses each child's
JSON stdout lines, and ALWAYS prints the headline line last (re-running it
in a fresh subprocess if the first attempt failed). Any single group dying
costs only its own metrics.

Timing methodology (this environment tunnels to the TPU and
block_until_ready does not truly block; per-sync RTT is ~25ms): each
benchmark runs ITERS chained iterations inside ONE jitted loop (the
carry feeds each step so nothing is CSE'd or overlapped away), reads back a
scalar (a real device->host sync), and differences N-vs-2N wall times.
Secondary numbers (bf16 decode, prefill TFLOP/s) go to stderr.
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
    sys.stdout.flush()


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr)
    sys.stderr.flush()


# ---------------------------------------------------------------------------
# Bench groups. Each is runnable standalone via `python bench.py --sub NAME`
# (fresh process = fresh TPU heap); each emits its own JSON lines. The
# headline group RETURNS the roofline pct so the parent can hold its line
# back and print it last.
# ---------------------------------------------------------------------------


def grp_headline(rtt):
    dt, gbps, pct = bench_decode_int8(rtt)
    _log(f"int8 paged decode kv=8192 (b24 32q/8kv d128): {dt*1e3:.3f} ms, "
         f"{gbps:.0f} GB/s, {pct:.1f}% of HBM roofline")
    return dt, pct


def grp_headline_kernels(rtt):
    """Headline + kernel secondaries in one subprocess (they share shapes
    and none of them is model-sized). The headline's JSON line is emitted
    here; the parent holds it back and reprints it LAST."""
    dt_int8 = None
    try:
        dt_int8, pct = grp_headline(rtt)
        _emit("decode_hbm_roofline_pct", pct, "%", 85.0)
    except Exception as e:
        _log(f"headline bench failed: {e}")
    grp_kernels(rtt, dt_int8=dt_int8)


def grp_kernels(rtt, dt_int8=None):
    """Kernel-level secondaries: fp8/int4/bf16 decode, prefill, multimodal,
    fused backward. Small arrays only; each metric survives its siblings."""
    if dt_int8 is None:
        try:
            dt_int8, _ = grp_headline(rtt)
        except Exception as e:
            _log(f"int8 reference for speedup ratio failed: {e}")
    try:
        dt8, gbps8, pct8 = bench_decode_int8(rtt, quant="fp8")
        _log(f"fp8 paged decode kv=8192 (same shapes): {dt8*1e3:.3f} ms, "
             f"{gbps8:.0f} GB/s, {pct8:.1f}% of HBM roofline "
             f"(BASELINE.md north-star FP8-KV config)")
        _emit("decode_fp8_roofline_pct", pct8, "%", 85.0)
    except Exception as e:
        _log(f"fp8 decode bench failed: {e}")
    try:
        dt4, gbps4, pct4 = bench_decode_int8(rtt, quant="int4")
        _log(f"int4 paged decode kv=8192 (same shapes): {dt4*1e3:.3f} ms, "
             f"{gbps4:.0f} GB/s, {pct4:.1f}% of HBM roofline (real bytes: "
             f"nibble payload + fp32 scales)")
        if dt_int8:
            _emit("decode_int4_vs_int8_speedup", dt_int8 / dt4, "x", 1.14)
        _emit("decode_int4_roofline_pct", pct4, "%", 85.0)
    except Exception as e:
        _log(f"int4 decode bench failed: {e}")
    try:
        dtb, gbpsb, pctb = bench_decode_bf16(rtt)
        _log(f"bf16 decode kv=8192 (b24 h24 MHA): {dtb*1e3:.3f} ms, "
             f"{gbpsb:.0f} GB/s, {pctb:.1f}% roofline")
    except Exception as e:
        _log(f"bf16 decode bench failed: {e}")
    try:
        dtp, tflops = bench_prefill(rtt)
        _log(f"bf16 causal prefill b8 s2048 h24 d128: {dtp*1e3:.3f} ms, "
             f"{tflops:.1f} TFLOP/s")
        _emit("prefill_tflops_s2048", tflops, "TFLOP/s", 79.83)
        dtp8, tflops8 = bench_prefill(rtt, batch=2, seq=8192)
        _log(f"bf16 causal prefill b2 s8192 h24 d128: {dtp8*1e3:.3f} ms, "
             f"{tflops8:.1f} TFLOP/s")
        _emit("prefill_tflops_s8192", tflops8, "TFLOP/s", 134.96)
    except Exception as e:
        _log(f"prefill bench failed: {e}")
    try:
        dtm, tflopsm = bench_multimodal(rtt)
        _log(f"image-block prefill b4 s1024 8q/4kv d128 run256: "
             f"{dtm*1e3:.3f} ms, {tflopsm:.1f} TFLOP/s")
        _emit("multimodal_prefill_tflops", tflopsm, "TFLOP/s", 63.11)
    except Exception as e:
        _log(f"multimodal bench failed: {e}")
    try:
        dtw, tflopsw = bench_backward(rtt)
        _log(f"bf16 causal fwd+bwd b8 s2048 h24 d128: {dtw*1e3:.3f} ms, "
             f"{tflopsw:.1f} TFLOP/s")
        # baselines = LAST CAPTURED values (BENCH_r03) per the CLAUDE.md
        # rule; README/docs tables reconcile to the same captures
        _emit("backward_tflops_s2048", tflopsw, "TFLOP/s", 97.1)
    except Exception as e:
        _log(f"backward bench failed: {e}")


def grp_decode_step(rtt):
    """DEVICE-ONLY decode step at the 1B shape (bf16 vs int8 weights):
    scan-timed, immune to tunnel session drift (VERDICT r3 next #3)."""
    dts, wb = bench_decode_step(rtt)
    bound = wb / 819e9
    _log(f"device decode step 1B-shaped (16L b16 int8 KV, bf16 weights): "
         f"{dts*1e3:.3f} ms/step ({dts/16*1e3:.3f} ms/layer, weight-stream "
         f"bound {bound*1e3:.3f} ms, {100*bound/dts:.0f}% of bound)")
    _emit("decode_step_per_layer_ms", dts / 16 * 1e3, "ms", 0.9)
    dtsq, wbq = bench_decode_step(rtt, wquant="int8")
    boundq = wbq / 819e9
    _log(f"device decode step 1B-shaped INT8 weights: {dtsq*1e3:.3f} "
         f"ms/step ({dtsq/16*1e3:.3f} ms/layer, weight-stream bound "
         f"{boundq*1e3:.3f} ms, {100*boundq/dtsq:.0f}% of bound)")
    _emit("decode_step_int8w_per_layer_ms", dtsq / 16 * 1e3, "ms", 0.9)


def grp_serve_slice(rtt):
    """4-layer int8 serving slice + speculative decoding (same engine
    shapes, so they share one process's compile cache)."""
    from benchmark.serve import run_serve

    res = run_serve(layers=4, batch=16, prompt_len=256, gen=128,
                    quant="int8", burst=16)
    _log(f"serve 4-layer int8 slice b16 prompt256 gen128: prefill "
         f"{res['prefill_tps']:.0f} tok/s, decode {res['decode_tps']:.0f} "
         f"tok/s, per-layer step {res['per_layer_ms']:.3f} ms")
    _emit("serve_prefill_tok_s", res["prefill_tps"], "tok/s", 25204.0)
    _emit("serve_decode_tok_s", res["decode_tps"], "tok/s", 2462.0)
    try:
        # Speculative decoding at the same slice shape, SELF-DRAFT
        # (draft = target): acceptance ~1.0, so this captures the spec
        # machinery's ceiling — an independently-initialized random draft
        # accepts nothing (0/16128 measured) and benchmarks only the
        # rejection path. vs_baseline is relative to the PLAIN 4-layer
        # decode capture (BENCH_r03 serve_decode_tok_s = 2462), so >1.0
        # would mean spec pays even with a target-sized draft.
        ress = run_serve(layers=4, batch=16, prompt_len=256, gen=128,
                         quant="int8", burst=16, spec=4, spec_draft="self")
        _log(f"serve speculative (spec=4, 1-layer draft): decode "
             f"{ress['decode_tps']:.0f} tok/s, acceptance "
             f"{ress['spec_acceptance']:.2f} "
             f"({ress['spec_accepted']}/{ress['spec_proposed']})")
        _emit("serve_spec_decode_tok_s", ress["decode_tps"], "tok/s",
              2462.0)
    except Exception as e:
        _log(f"speculative serve bench failed: {e}")


def grp_serve_1b(rtt):
    """FULL-MODEL serving: Llama-3.2-1B-shaped stack (16 layers, dim 2048,
    32q/8kv, head_dim 64, ffn 8192, vocab 128256) — tok/s at a real model
    shape, not only the 4-layer slice (VERDICT r2 missing #2)."""
    from benchmark.serve import run_serve

    res1 = run_serve(layers=16, dim=2048, heads=32, kv_heads=8,
                     ffn=8192, vocab=128256, batch=16, prompt_len=256,
                     gen=48, quant="int8", burst=16)
    _log(f"serve Llama-3.2-1B-shaped (16L int8 KV) b16 prompt256 gen48: "
         f"prefill {res1['prefill_tps']:.0f} tok/s, decode "
         f"{res1['decode_tps']:.0f} tok/s, per-layer step "
         f"{res1['per_layer_ms']:.3f} ms")
    _emit("serve_1b_decode_tok_s", res1["decode_tps"], "tok/s", 1088.1)


def grp_serve_8b(rtt):
    """THE BASELINE.md NORTH-STAR CONFIG: full Llama-3-8B-shaped serving
    (32L/4096d/32q/8kv/ffn14336/vocab128256) on ONE 16 GB chip — int8
    weights (~8.5 GB, models/wquant.py) + int8 KV. Runs in its own
    subprocess: the weights need a contiguous region the allocator cannot
    provide after other benches fragment the heap, and nothing after it
    survives the ~8.5 GB it leaves behind (r4's fatal lesson)."""
    from benchmark.serve import run_serve

    res8 = run_serve(layers=32, dim=4096, heads=32, kv_heads=8,
                     ffn=14336, vocab=128256, batch=16, prompt_len=256,
                     gen=32, quant="int8", wquant="int8", burst=16)
    _log(f"serve Llama-3-8B-shaped (32L int8 weights + int8 KV) b16 "
         f"prompt256 gen32: prefill {res8['prefill_tps']:.0f} tok/s, "
         f"decode {res8['decode_tps']:.0f} tok/s, per-layer step "
         f"{res8['per_layer_ms']:.3f} ms")
    _emit("serve_8b_decode_tok_s", res8["decode_tps"], "tok/s", 100.0)


def grp_train(rtt):
    from benchmark.train import run_train_bench

    rest = run_train_bench()
    _log(f"train step (8L 1B-shaped slice, {rest['n_params']/1e9:.2f}B "
         f"params, b4 s2048, remat, AdamW): {rest['step_s']*1e3:.1f} ms, "
         f"{rest['tokens_per_s']:.0f} tok/s/chip, "
         f"~{rest['mfu_flops']/1e12:.1f} TFLOP/s")
    _emit("train_tok_s_per_chip", rest["tokens_per_s"], "tok/s", 28973.8)


GROUPS = {
    "headline": None,  # special-cased: emits only the headline line
    "headline_kernels": grp_headline_kernels,
    "kernels": grp_kernels,
    "decode_step": grp_decode_step,
    "serve_slice": grp_serve_slice,
    "serve_1b": grp_serve_1b,
    "serve_8b": grp_serve_8b,
    "train": grp_train,
}

# EVERY bench runs in a subprocess, in this order; the parent never
# initializes the TPU backend. The remote device heap is shared across ALL
# tunnel clients, so even a "clean subprocess" inherits whatever the
# parent still holds — r5 measured the 8B group dying in its own process
# while the parent kept kernel-bench residue alive. A TPU-free parent is
# the only arrangement where each group truly starts from an empty heap.
SUB_ORDER = ["headline_kernels", "decode_step", "serve_slice", "serve_1b",
             "serve_8b", "train"]

SUB_TIMEOUT_S = {"serve_8b": 3600.0}
DEFAULT_SUB_TIMEOUT_S = 2400.0


_TUNNEL_SUSPECT = False  # set when a group TIMES OUT (vs erroring)


def run_sub(name):
    """Run one bench group in a subprocess; return its parsed JSON records.
    stderr streams through live; stdout is parsed line-by-line (non-JSON
    lines are demoted to stderr). Any failure returns what was captured.

    A group hitting its TIMEOUT (as opposed to erroring) usually means
    the TPU tunnel is wedged — every later group would hang too, so the
    remaining timeouts collapse to 180 s (until an inter-group probe
    passes and lifts the cap) and a dead-link run stays bounded to
    ~45 min instead of burning hours."""
    global _TUNNEL_SUSPECT
    import os
    import subprocess

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/.axon_site:/root/repo:" + env.get(
        "PYTHONPATH", "")
    cmd = [sys.executable, os.path.abspath(__file__), "--sub", name]
    timeout = SUB_TIMEOUT_S.get(name, DEFAULT_SUB_TIMEOUT_S)
    if _TUNNEL_SUSPECT:
        timeout = min(timeout, 180.0)
    _log(f"--- sub[{name}] start (timeout {timeout:.0f}s) ---")
    try:
        proc = subprocess.run(cmd, stdout=subprocess.PIPE, stderr=None,
                              env=env, timeout=timeout, text=True)
        out, rc = proc.stdout, proc.returncode
    except subprocess.TimeoutExpired as e:
        out = e.stdout.decode() if isinstance(e.stdout, bytes) else (
            e.stdout or "")
        rc = "timeout"
        _TUNNEL_SUSPECT = True
    records = []
    for line in out.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            rec = json.loads(line)
            if not isinstance(rec, dict) or "metric" not in rec:
                raise ValueError(line)
            records.append(rec)
        except Exception:
            _log(f"sub[{name}] non-JSON stdout: {line}")
    if rc != 0:
        _log(f"sub[{name}] exited rc={rc} "
             f"({len(records)} metric(s) captured before death)")
    else:
        _log(f"--- sub[{name}] done ({len(records)} metric(s)) ---")
    return records


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--sub":
        name = sys.argv[2]
        rtt = measure_rtt()
        _log(f"sub[{name}] measured sync RTT: {rtt*1e3:.1f} ms")
        try:
            # session-health canary: the shared chip/tunnel slows by
            # 2x+ between sessions (CLAUDE.md drift note) — a fixed
            # matmul reading lets captures be read against chip health.
            # 4096^3 with auto iteration count: a 2048^3 run at fixed
            # iters was differencing noise (read >peak).
            a = jax.random.normal(jax.random.key(0), (4096, 4096),
                                  jnp.bfloat16)
            from mfa_tpu.utils.timing import chain as _ch, scan_timeit \
                as _st
            dtc = _st(lambda c, b: _ch(c, c @ b), a, args=(a,), rtt=rtt)
            _log(f"sub[{name}] canary 4096^3 bf16 matmul: "
                 f"{2 * 4096**3 / dtc / 1e12:.0f} TFLOP/s (peak 197)")
        except Exception as e:
            _log(f"sub[{name}] canary failed: {e}")
        if name == "headline":
            _, pct = grp_headline(rtt)
            _emit("decode_hbm_roofline_pct", pct, "%", 85.0)
        else:
            GROUPS[name](rtt)
        return

    # PARENT = pure orchestrator: no jax backend init, no device state.
    # Every group runs in its own subprocess (its exit is the heap reset);
    # the headline's JSON line is held back and printed LAST.
    import os
    import subprocess
    import time

    global _TUNNEL_SUSPECT

    def _tunnel_probe(timeout_s):
        """A trivial readback in a subprocess; True iff the tunnel answers.
        A healthy handshake alone takes ~40 s (backend init + tunnel
        session), so sub-minute timeouts false-positive."""
        env = dict(os.environ)
        env["PYTHONPATH"] = "/root/.axon_site:/root/repo:" + env.get(
            "PYTHONPATH", "")
        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "print(float(jnp.ones((8, 8)).sum()))"],
                env=env, timeout=timeout_s, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL, check=True)
            return True
        except Exception as e:
            _log(f"tunnel probe failed ({type(e).__name__}, "
                 f"{timeout_s:.0f}s budget)")
            return False

    # Upfront tunnel probe: the tunnel goes down for HOURS at a time (r5
    # observed a 5h+ outage); without this the first group would burn its
    # full timeout before the suspect flag kicks in. ONE slow probe is
    # NOT a dead tunnel (a healthy-chip handshake was measured blowing a
    # 150 s budget once while every canary read 190+ TFLOP/s — and the
    # resulting 180 s caps killed every serve metric of the run), so only
    # two consecutive failures mark the link suspect.
    if not _tunnel_probe(150.0) and not _tunnel_probe(120.0):
        _TUNNEL_SUSPECT = True
        _log("tunnel probe failed twice — TPU link is down or wedged; "
             "group timeouts capped at 180 s until a probe passes")

    headline = None
    for name in SUB_ORDER:
        try:
            if _TUNNEL_SUSPECT and _tunnel_probe(90.0):
                # the link came back (or the earlier timeout was a
                # transient): restore full group timeouts
                _TUNNEL_SUSPECT = False
                _log("tunnel probe recovered — full group timeouts restored")
            recs = run_sub(name)
            if not recs and not _TUNNEL_SUSPECT:
                # One retry after letting the remote heap settle: the
                # previous subprocess's multi-GB allocations release
                # LAZILY after exit, and the 8B init (which needs ~9 GB
                # of a 16 GB chip) can race that release — measured: the
                # same init fails inside the bench sequence and passes
                # standalone seconds later on an empty chip. (Skipped
                # when a timeout marked the tunnel suspect.)
                _log(f"sub[{name}] produced no metrics — retrying once "
                     f"after a 30 s heap-settle pause")
                time.sleep(30.0)
                recs = run_sub(name)
            for rec in recs:
                if rec.get("metric") == "decode_hbm_roofline_pct":
                    headline = rec
                else:
                    print(json.dumps(rec))
                    sys.stdout.flush()
        except Exception as e:
            _log(f"sub[{name}] runner failed: {e}")

    if headline is None:
        _log("headline missing — retrying in a fresh subprocess")
        try:
            recs = [r for r in run_sub("headline")
                    if r.get("metric") == "decode_hbm_roofline_pct"]
            if recs:
                headline = recs[-1]
        except Exception as e:
            _log(f"headline subprocess retry failed: {e}")
    if headline is None:
        _log("headline unrecoverable after retry; emitting 0.0 so the "
             "capture schema stays intact")
        headline = {"metric": "decode_hbm_roofline_pct", "value": 0.0,
                    "unit": "%", "vs_baseline": 0.0}
    print(json.dumps(headline))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
