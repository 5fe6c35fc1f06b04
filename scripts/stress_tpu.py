"""Adversarial-shape stress for the DMA kernels on REAL TPU.

Interpret-mode tests can't catch semaphore/pipeline discipline bugs (the
CPU path serializes all DMA); this sweeps ragged batches, empty sequences,
sliding windows, speculative spans, and multi-q-block geometries against
fp32 oracles on the chip.

Tolerance note: fp32 matmul inputs go through the MXU at its default
(bf16-mantissa) multiply precision, so fp32-vs-fp32 comparisons on TPU see
~1e-3 relative noise — NOT an indexing bug (interpret-mode CPU tests are
exact). The 1e-2 gate here detects structural errors, which are O(1).

Usage: PYTHONPATH=/root/.axon_site:. python scripts/stress_tpu.py
"""
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

from mfa_tpu.kernels.paged import paged_attention
from mfa_tpu.kernels.paged_prefill import paged_prefill_attention
from mfa_tpu.ref.oracle import paged_decode_ref

def oracle_prefill(q, pk, pv, lens, qs, qlens, table, window=-1, causal=True):
    b, sq, h, d = q.shape
    hkv, _, page, _ = pk.shape
    group = h // hkv
    pps = table.shape[1]
    k = pk[:, table].reshape(hkv, b, pps * page, d)
    v = pv[:, table].reshape(hkv, b, pps * page, d)
    k = jnp.repeat(k, group, axis=0); v = jnp.repeat(v, group, axis=0)
    qf = q.astype(jnp.float32)
    sc = jnp.einsum("bshd,hbSd->bhsS", qf, k.astype(jnp.float32)) * d ** -0.5
    pos = qs[:, None] + jnp.arange(sq)[None]
    col = jnp.arange(pps * page)
    vis = col[None, None] < lens[:, None, None]
    if causal:
        vis &= col[None, None] <= pos[..., None]
        if window >= 0:
            vis &= col[None, None] >= pos[..., None] - window
    sc = jnp.where(vis[:, None], sc, -jnp.inf)
    p = jax.nn.softmax(sc, axis=-1)
    p = jnp.where(jnp.isnan(p), 0.0, p)
    return jnp.einsum("bhsS,hbSd->bshd", p, v.astype(jnp.float32))

rng = np.random.RandomState(0)
fails = 0

# ---- paged prefill stress ----
for trial in range(8):
    b = int(rng.choice([1, 2, 3, 5]))
    hkv = int(rng.choice([1, 2, 4]))
    group = int(rng.choice([1, 2, 4]))
    d = 128
    page = int(rng.choice([64, 128]))
    pps = int(rng.choice([2, 4, 6]))
    sq = int(rng.choice([64, 128, 256, 512]))
    causal = bool(rng.rand() < 0.8)
    window = int(rng.choice([-1, 63, 127])) if causal else -1
    h = hkv * group
    num_pages = b * pps + 1
    pk = jax.random.normal(jax.random.key(trial), (hkv, num_pages, page, d), jnp.float32)
    pv = jax.random.normal(jax.random.key(trial + 100), (hkv, num_pages, page, d), jnp.float32)
    table = jnp.asarray(rng.permutation(num_pages - 1)[: b * pps] + 1,
                        jnp.int32).reshape(b, pps)
    cap = pps * page
    qs_np, lens_np, qlens_np = [], [], []
    for i in range(b):
        if rng.rand() < 0.2:
            qs_np.append(0); lens_np.append(0); qlens_np.append(0)  # empty
        else:
            ql = int(rng.randint(1, sq + 1))
            start = int(rng.randint(0, max(1, cap - ql)))
            start = (start // page) * page
            qs_np.append(start); qlens_np.append(ql)
            lens_np.append(min(start + ql, cap))
    q = jax.random.normal(jax.random.key(trial + 200), (b, sq, h, d), jnp.float32)
    qs = jnp.asarray(qs_np, jnp.int32); lens = jnp.asarray(lens_np, jnp.int32)
    qlens = jnp.asarray(qlens_np, jnp.int32)
    out = paged_prefill_attention(q, pk, pv, lens, qs, table, q_lens=qlens,
                                  causal=causal, window_left=window)
    ref = oracle_prefill(q, pk, pv, lens, qs, qlens, table, window, causal)
    ok = True
    for i in range(b):
        n = qlens_np[i]
        if n == 0:
            continue
        dmax = float(jnp.abs(out[i, :n].astype(jnp.float32) - ref[i, :n]).max())
        if dmax > 1e-2:
            ok = False
            print(f"PF trial {trial} row {i}: maxdiff {dmax:.5f} "
                  f"(b={b} hkv={hkv} g={group} page={page} pps={pps} sq={sq} "
                  f"causal={causal} w={window} qs={qs_np} lens={lens_np} "
                  f"qlens={qlens_np})", flush=True)
    fails += 0 if ok else 1
    print(f"prefill trial {trial}: {'OK' if ok else 'FAIL'}", flush=True)

# ---- multiquery decode stress ----
for trial in range(6):
    b = int(rng.choice([1, 2, 4]))
    hkv = int(rng.choice([1, 2, 4]))
    group = int(rng.choice([1, 2, 4]))
    span = int(rng.choice([1, 2, 4, 8]))
    d = 128
    page = 128
    pps = int(rng.choice([2, 4]))
    window = int(rng.choice([-1, 200]))
    h = hkv * group
    num_pages = b * pps + 1
    pk = jax.random.normal(jax.random.key(trial + 300), (hkv, num_pages, page, d), jnp.float32)
    pv = jax.random.normal(jax.random.key(trial + 400), (hkv, num_pages, page, d), jnp.float32)
    table = jnp.asarray(rng.permutation(num_pages - 1)[: b * pps] + 1,
                        jnp.int32).reshape(b, pps)
    cap = pps * page
    lens_np = [0 if rng.rand() < 0.15 else int(rng.randint(span, cap + 1))
               for _ in range(b)]
    lens = jnp.asarray(lens_np, jnp.int32)
    q = jax.random.normal(jax.random.key(trial + 500), (b, span, h, d), jnp.float32)
    out = paged_attention(q, pk, pv, lens, table, window_left=window)
    pool_k = jnp.transpose(pk, (1, 2, 0, 3)); pool_v = jnp.transpose(pv, (1, 2, 0, 3))
    ok = True
    for si in range(span):
        eff = jnp.maximum(lens - (span - 1 - si), 0)
        ref = paged_decode_ref(q[:, si:si+1], pool_k, pool_v, eff, table,
                               window_left=window)
        for i in range(b):
            if lens_np[i] == 0:
                continue
            dmax = float(jnp.abs(out[i, si].astype(jnp.float32) - ref[i, 0]).max())
            if dmax > 1e-2:
                ok = False
                print(f"DC trial {trial} row {i} si {si}: maxdiff {dmax:.5f} "
                      f"(b={b} hkv={hkv} g={group} span={span} pps={pps} "
                      f"w={window} lens={lens_np})", flush=True)
    fails += 0 if ok else 1
    print(f"decode trial {trial}: {'OK' if ok else 'FAIL'}", flush=True)

# ---- int4 paired pages + narrow-head_dim (128-lane padded) stress ----
# Regression guards for two hardware constraint classes found on v5e:
# strided page DMA needs 128-lane rows (narrow d served via padded
# storage) and int4 pages are token-pair nibble-packed with a permuted
# in-kernel order.
from mfa_tpu.cache.paged_cache import pack_pages_payload, stored_width
from mfa_tpu.kernels.quant import dequantize_rows, quantize_rows

for trial in range(4):
    b = int(rng.choice([1, 2, 3]))
    hkv = int(rng.choice([1, 2]))
    group = int(rng.choice([1, 4]))
    d = int(rng.choice([128, 256]))
    page = 128
    pps = int(rng.choice([2, 4]))
    h = hkv * group
    num_pages = b * pps + 1
    pk = jax.random.normal(jax.random.key(trial + 600),
                           (hkv, num_pages, page, d), jnp.float32)
    pv = jax.random.normal(jax.random.key(trial + 700),
                           (hkv, num_pages, page, d), jnp.float32)
    kq, ks = quantize_rows(pk, "int4")
    vq, vs = quantize_rows(pv, "int4")
    kq_p = pack_pages_payload("int4", kq.reshape(hkv, -1, d), num_pages, page)
    vq_p = pack_pages_payload("int4", vq.reshape(hkv, -1, d), num_pages, page)
    table = jnp.asarray(rng.permutation(num_pages - 1)[: b * pps] + 1,
                        jnp.int32).reshape(b, pps)
    lens_np = [int(rng.randint(1, pps * page + 1)) for _ in range(b)]
    lens = jnp.asarray(lens_np, jnp.int32)
    q = jax.random.normal(jax.random.key(trial + 800), (b, h, d), jnp.bfloat16)
    out = paged_attention(q, kq_p, vq_p, lens, table, k_scales=ks,
                          v_scales=vs, quant_dtype="int4")
    kd = dequantize_rows(kq, ks); vd = dequantize_rows(vq, vs)
    ref = paged_decode_ref(q[:, None].astype(jnp.float32),
                           jnp.transpose(kd, (1, 2, 0, 3)),
                           jnp.transpose(vd, (1, 2, 0, 3)), lens, table)[:, 0]
    dmax = float(jnp.abs(out.astype(jnp.float32) - ref).max())
    ok = dmax < 1e-2
    fails += 0 if ok else 1
    print(f"int4 trial {trial} (d={d}): {'OK' if ok else f'FAIL {dmax:.5f}'}",
          flush=True)

for trial in range(3):
    # narrow head_dim through the ENGINE path (padded cache storage)
    d = int(rng.choice([32, 64, 96]))
    hkv, group = 2, 2
    page, pps = 64, 4
    b = 2
    num_pages = b * pps + 1
    W = stored_width(d)
    pk = jnp.zeros((hkv, num_pages, page, W), jnp.float32)
    pk = pk.at[..., :d].set(jax.random.normal(
        jax.random.key(trial + 900), (hkv, num_pages, page, d)))
    pv = jnp.zeros((hkv, num_pages, page, W), jnp.float32)
    pv = pv.at[..., :d].set(jax.random.normal(
        jax.random.key(trial + 950), (hkv, num_pages, page, d)))
    table = jnp.asarray(rng.permutation(num_pages - 1)[: b * pps] + 1,
                        jnp.int32).reshape(b, pps)
    lens_np = [int(rng.randint(1, pps * page + 1)) for _ in range(b)]
    lens = jnp.asarray(lens_np, jnp.int32)
    q = jax.random.normal(jax.random.key(trial + 980), (b, hkv * group, d),
                          jnp.float32)
    out = paged_attention(q, pk, pv, lens, table)
    ref = paged_decode_ref(q[:, None],
                           jnp.transpose(pk[..., :d], (1, 2, 0, 3)),
                           jnp.transpose(pv[..., :d], (1, 2, 0, 3)),
                           lens, table)[:, 0]
    dmax = float(jnp.abs(out.astype(jnp.float32) - ref).max())
    ok = dmax < 1e-2
    fails += 0 if ok else 1
    print(f"narrow-d trial {trial} (d={d}): {'OK' if ok else f'FAIL {dmax:.5f}'}",
          flush=True)


# ---- image-block (multimodal) flash kernel stress ----
# Fresh BlockSpec class (per-(b, i) scalar-prefetched run bounds + a
# (1, 1, bk) bid_k block) -- exactly the class that produced round 2's
# TPU-only flag crash; smoke it on hardware with adversarial run
# placements (VERDICT r2 weak #6). Oracle: dense masked softmax.
from mfa_tpu.kernels.blockmask import image_block_prefill

def oracle_blockmask(q, k, v, bids):
    b, h, s, d = q.shape
    hkv = k.shape[1]
    kf = jnp.repeat(k, h // hkv, axis=1).astype(jnp.float32)
    vf = jnp.repeat(v, h // hkv, axis=1).astype(jnp.float32)
    sc = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), kf) * d ** -0.5
    col = jnp.arange(s)
    vis = col[None, :] <= jnp.arange(s)[:, None]
    same = (bids[:, :, None] == bids[:, None, :]) & (bids[:, :, None] >= 0)
    vis = vis[None] | same
    sc = jnp.where(vis[:, None], sc, -jnp.inf)
    p = jax.nn.softmax(sc, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, vf)

for trial in range(4):
    b = int(rng.choice([1, 2, 3]))
    hkv = int(rng.choice([1, 2]))
    group = int(rng.choice([1, 2]))
    s = int(rng.choice([512, 768, 1024]))
    run_len = int(rng.choice([128, 256]))
    h = hkv * group
    d = 128
    bids_np = np.full((b, s), -1, np.int32)
    for i in range(b):
        nruns = int(rng.randint(0, 3))
        for r in range(nruns):
            # disjoint halves: image runs are contiguous by construction
            lo, hi = r * (s // 2), r * (s // 2) + s // 2 - run_len
            start = int(rng.randint(lo, max(lo + 1, hi)))
            bids_np[i, start:start + run_len] = r
    q = jax.random.normal(jax.random.key(trial + 1200), (b, h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.key(trial + 1300), (b, hkv, s, d), jnp.float32)
    v = jax.random.normal(jax.random.key(trial + 1400), (b, hkv, s, d), jnp.float32)
    bids = jnp.asarray(bids_np)
    out = image_block_prefill(q, k, v, bids)
    ref = oracle_blockmask(q, k, v, bids)
    dmax = float(jnp.abs(out.astype(jnp.float32) - ref).max())
    ok = dmax < 1e-2
    fails += 0 if ok else 1
    print(f"blockmask trial {trial} (b={b} h={h} s={s} run={run_len}): "
          f"{'OK' if ok else f'FAIL {dmax:.5f}'}", flush=True)

# ---- packed varlen stress (VERDICT r3 weak #6) ----
# kernels/varlen.py carries its own BlockSpec class (segment-id side
# arrays, per-sequence bounds via scalar prefetch); exercise ragged
# cu_seqlens (zero-length sequences, non-tile-multiple totals), causal,
# sliding windows, and sinks against a per-sequence dense oracle.
from mfa_tpu.kernels.varlen import varlen_attention
from mfa_tpu.ref.oracle import attention_ref

for trial in range(6):
    hkv = int(rng.choice([1, 2, 4]))
    group = int(rng.choice([1, 2, 4]))
    h = hkv * group
    d = 128
    nseq = int(rng.randint(2, 6))
    lens_q = []
    for _ in range(nseq):
        lens_q.append(0 if rng.rand() < 0.2
                      else int(rng.randint(1, 700)))
    lens_k = list(lens_q)  # self-attention packing (q len == k len)
    causal = bool(rng.rand() < 0.7)
    window = int(rng.choice([-1, 63, 250])) if causal else -1
    sinks = int(rng.choice([0, 8])) if window >= 0 else 0
    cu_q = np.concatenate([[0], np.cumsum(lens_q)]).astype(np.int32)
    total = int(cu_q[-1])
    if total == 0:
        continue
    q = jax.random.normal(jax.random.key(trial + 2000), (total, h, d),
                          jnp.float32)
    k = jax.random.normal(jax.random.key(trial + 2100), (total, hkv, d),
                          jnp.float32)
    v = jax.random.normal(jax.random.key(trial + 2200), (total, hkv, d),
                          jnp.float32)
    out = varlen_attention(
        q, k, v, jnp.asarray(cu_q), jnp.asarray(cu_q),
        int(max(lens_q) or 1), int(max(lens_k) or 1), causal=causal,
        window_size=(window, -1 if not causal else 0),
        sink_tokens=sinks)
    ok = True
    for i in range(nseq):
        n = lens_q[i]
        if n == 0:
            continue
        qi = q[cu_q[i]:cu_q[i + 1]][None]
        ki = k[cu_q[i]:cu_q[i + 1]][None]
        vi = v[cu_q[i]:cu_q[i + 1]][None]
        if sinks:
            sc = jnp.einsum("qhd,khd->hqk", qi[0], jnp.repeat(
                ki[0], group, 1)) * d ** -0.5
            row = jnp.arange(n)[:, None]
            col = jnp.arange(n)[None, :]
            vis = (col <= row) & ((col >= row - window) | (col < sinks))
            sc = jnp.where(vis[None], sc, -jnp.inf)
            ref = jnp.einsum("hqk,khd->qhd", jax.nn.softmax(sc, -1),
                             jnp.repeat(vi[0], group, 1))[None]
        else:
            ref = attention_ref(qi, ki, vi, causal=causal,
                                window_size=(window, 0 if causal else -1))
        dmax = float(jnp.abs(out[cu_q[i]:cu_q[i + 1]].astype(jnp.float32)
                             - ref[0]).max())
        # 2e-2: window+sinks fp32 configs measured up to 0.011 of pure
        # MXU bf16-mantissa noise (the same config is 1e-6-exact in
        # interpret mode); structural errors are O(1)
        if dmax > 2e-2:
            ok = False
            print(f"VL trial {trial} seq {i}: maxdiff {dmax:.5f} "
                  f"(lens={lens_q} causal={causal} w={window} "
                  f"sinks={sinks} hkv={hkv} g={group})", flush=True)
    fails += 0 if ok else 1
    print(f"varlen trial {trial} (lens={lens_q} causal={causal} "
          f"w={window} sinks={sinks}): {'OK' if ok else 'FAIL'}",
          flush=True)

# ---- deferred-repair (flagged) prefill adversarial stress ----
# Round-4 kernel class: ANY-space k/v aliases + SMEM poison flag +
# repair-cell manual DMA. Adversarial magnitudes force the repair; the
# three engines must agree bit-exactly on chip (the oracle drifts by MXU
# fp32 precision, so the gate is kernel-vs-kernel).
from mfa_tpu.kernels.prefill import prefill_attention

for trial in range(4):
    b = int(rng.choice([1, 2]))
    hkv = int(rng.choice([1, 2]))
    group = int(rng.choice([1, 2]))
    s = int(rng.choice([256, 387, 512, 1024]))
    std = float(rng.choice([1.0, 300.0, 1e3]))
    h = hkv * group
    q = jax.random.normal(jax.random.key(trial + 3000), (b, h, s, 128)) * std
    k = jax.random.normal(jax.random.key(trial + 3100), (b, hkv, s, 128)) * std
    v = jax.random.normal(jax.random.key(trial + 3200), (b, hkv, s, 128)) * std
    out_f = prefill_attention(q, k, v, causal=True)
    out_c = prefill_attention(q, k, v, causal=True, bound_softmax=False)
    dmax = float(jnp.abs(out_f - out_c).max())
    rel = dmax / (float(jnp.abs(out_c).max()) + 1e-9)
    # adversarial std: repair IS the classic algorithm -> near-bit-equal.
    # benign std: zero-shift vs max-shift round differently on the fp32
    # MXU (bf16 mantissa) -> structural gate only.
    gate = 1e-6 if std >= 300.0 else 1e-2
    ok = rel < gate and bool(jnp.all(jnp.isfinite(out_f)))
    fails += 0 if ok else 1
    print(f"flagged trial {trial} (b={b} h={h} s={s} std={std}): "
          f"{'OK' if ok else f'FAIL rel={rel:.2e}'}", flush=True)

print(f"STRESS {'PASS' if fails == 0 else f'FAIL ({fails})'}")
