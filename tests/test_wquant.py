"""INT8 weight quantization (models/wquant.py).

The reference has no weight-quant story (fp16/bf16 kernels only,
csrc/mfa/api.cpp dtype checks); this is the BASELINE.md north-star
extension that lets the 8B-shaped serving config fit one 16 GB chip.
Covers: quantize/dequantize bounds, the scale-commutation identity qmm
relies on, full-model forward parity, the serving engine end-to-end on
quantized params (decode path == full-forward rollout), TP sharding via
adapt_shardings, quantize-on-load through from_safetensors, and
checkpoint save/load of QWeight pytrees.
"""

import json

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pytest

from mfa_tpu.models import llama
from mfa_tpu.models.wquant import (
    QWeight,
    adapt_shardings,
    dequantize_weight,
    params_nbytes,
    qmm,
    qtake,
    quantize_params,
    quantize_weight,
)


def test_quantize_roundtrip_bound():
    w = jax.random.normal(jax.random.key(0), (64, 48), jnp.float32) * 0.3
    qw = quantize_weight(w)
    assert qw.qw.dtype == jnp.int8 and qw.scale.shape == (48,)
    deq = dequantize_weight(qw, jnp.float32)
    # symmetric absmax int8: error <= scale/2 per entry, per column
    colmax = np.abs(np.asarray(w)).max(axis=0)
    assert np.all(np.abs(np.asarray(deq - w)) <= colmax / 127.0 * 0.5 + 1e-7)


def test_qmm_scale_commutes():
    # qmm computes (x @ qw) * scale — identical to x @ dequantize(qw)
    # because the per-output-column scale commutes with the contraction.
    x = jax.random.normal(jax.random.key(1), (4, 64), jnp.float32)
    w = jax.random.normal(jax.random.key(2), (64, 32), jnp.float32)
    qw = quantize_weight(w)
    ref = x @ dequantize_weight(qw, jnp.float32)
    out = qmm(x, qw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # plain-array passthrough
    np.testing.assert_allclose(np.asarray(qmm(x, w)), np.asarray(x @ w),
                               rtol=1e-6)


def test_qtake_rows():
    w = jax.random.normal(jax.random.key(3), (96, 64), jnp.float32)
    qw = quantize_weight(w, axis=-1)
    assert qw.scale.shape == (96,)
    idx = jnp.asarray([[0, 5], [95, 7]])
    got = qtake(qw, idx)
    ref = dequantize_weight(qw, jnp.bfloat16)[idx]
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), rtol=1e-2,
                               atol=1e-2)


def _tiny(dtype=jnp.bfloat16, **kw):
    cfg = llama.LlamaConfig.tiny(dtype=dtype, **kw)
    params = llama.init_params(jax.random.key(0), cfg)
    return cfg, params


def test_forward_parity_quantized():
    cfg, params = _tiny()
    qp = quantize_params(params)
    # memory: the big projections halve (bf16 -> int8 + small scales)
    assert params_nbytes(qp) < 0.62 * params_nbytes(params)
    toks = jax.random.randint(jax.random.key(1), (2, 24), 0, cfg.vocab_size)
    # QWeight forward vs forward on explicitly dequantized params: the
    # same math up to bf16 rounding order ((x@qw)*scale vs
    # x@(round_bf16(qw*scale))), which compounds over layers — loose
    # numeric band here; the exact per-op identity is
    # test_qmm_scale_commutes (fp32).
    deq = jax.tree.map(
        lambda p: dequantize_weight(p, cfg.dtype)
        if isinstance(p, QWeight) else p,
        qp, is_leaf=lambda x: isinstance(x, QWeight))
    lq = llama.forward(qp, toks, cfg)
    ld = llama.forward(deq, toks, cfg)
    assert jnp.isfinite(lq).all()
    assert np.abs(np.asarray(lq) - np.asarray(ld)).max() < 0.5
    # and the quantization itself keeps next-token choices close to bf16
    lo = llama.forward(params, toks, cfg)
    agree = (np.asarray(lq).argmax(-1) == np.asarray(lo).argmax(-1)).mean()
    assert agree > 0.8


def test_engine_serves_quantized_params():
    # decode/prefill paths on QWeight params: Engine greedy generation
    # must equal the full-forward greedy rollout on the SAME params.
    from mfa_tpu.serve.engine import Engine

    cfg, params = _tiny()
    qp = quantize_params(params)
    eng = Engine(qp, cfg, num_pages=32, page_size=8, max_seqs=4,
                 pages_per_seq=8, quant_dtype="int8")
    prompt = [3, 11, 7, 2, 9]
    req = eng.submit(prompt, max_new_tokens=6)
    eng.run()
    got = req.generated
    assert len(got) == 6
    toks = list(prompt)
    for _ in range(6):
        logits = llama.forward(qp, jnp.asarray([toks]), cfg)
        toks.append(int(jnp.argmax(logits[0, -1])))
    assert got == toks[len(prompt):]


def test_adapt_shardings_tp_forward():
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs, ("model",))
    cfg, params = _tiny(heads=4, kv_heads=4, dim=128, ffn=256)
    qp = quantize_params(params)
    sh = adapt_shardings(llama.param_shardings(cfg, mesh), qp)
    assert isinstance(sh["layers"]["wq"], QWeight)
    placed = jax.device_put(qp, sh)
    toks = jax.random.randint(jax.random.key(2), (2, 16), 0, cfg.vocab_size)
    ref = llama.forward(qp, toks, cfg)
    out = llama.forward(placed, toks, cfg, mesh=mesh)
    # sharded all-reduce changes bf16 summation order: small abs band
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=8e-2)


def test_moe_quantized_forward():
    cfg, params = _tiny(n_experts=4, n_active_experts=2)
    qp = quantize_params(params, include_experts=True)
    assert isinstance(qp["layers"]["we_gate"], QWeight)
    toks = jax.random.randint(jax.random.key(4), (2, 16), 0, cfg.vocab_size)
    lq = llama.forward(qp, toks, cfg)
    lo = llama.forward(params, toks, cfg)
    assert jnp.isfinite(lq).all()
    # random-init routing sits near decision boundaries, so a few tokens
    # flip experts under quantization noise — bound the bulk, not the max
    diff = np.abs(np.asarray(lq) - np.asarray(lo))
    assert np.quantile(diff, 0.9) < 1.0 and np.median(diff) < 0.25


def test_checkpoint_roundtrip_qweight(tmp_path):
    from mfa_tpu.utils.checkpoint import load_params, save_params

    cfg, params = _tiny()
    qp = quantize_params(params)
    save_params(str(tmp_path / "ck"), qp)
    like = quantize_params(llama.init_params(jax.random.key(9), cfg))
    back = load_params(str(tmp_path / "ck"), like)
    for a, b in zip(jax.tree.leaves(qp), jax.tree.leaves(back)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_from_safetensors_quantize(tmp_path):
    # quantize-on-load == quantize-after-load (per-tensor absmax is
    # independent of stacking order)
    from tests.test_safetensors import HF_CFG, _tiny_state_dict
    from mfa_tpu.models.convert import from_safetensors
    from mfa_tpu.models.safetensors_io import write_safetensors

    sd = _tiny_state_dict()
    write_safetensors(
        str(tmp_path / "model.safetensors"),
        {k: v.astype(ml_dtypes.bfloat16) for k, v in sd.items()})
    with open(tmp_path / "config.json", "w") as f:
        json.dump(HF_CFG, f)
    params, cfg = from_safetensors(str(tmp_path))
    qparams, qcfg = from_safetensors(str(tmp_path), quantize="int8")
    assert qcfg == cfg
    want = quantize_params(params, include_embed=False)
    assert isinstance(qparams["layers"]["wq"], QWeight)
    assert not isinstance(qparams["embed"], QWeight)  # per-tensor path
    for a, b in zip(jax.tree.leaves(want["layers"]),
                    jax.tree.leaves(qparams["layers"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError):
        from_safetensors(str(tmp_path), quantize="int3")


def test_int8_matmul_kernel_parity():
    # kernels/wmatmul.int8_matmul (the TPU qmm backend): parity with the
    # jnp dequant graph across shapes incl. ragged m and vocab-like N
    # (N % 512 != 0 exercises the divisor-tile fallback).
    from mfa_tpu.kernels.wmatmul import int8_matmul

    for m, K, N in ((3, 256, 384), (16, 512, 1152), (130, 384, 256)):
        x = jax.random.normal(jax.random.key(m), (m, K), jnp.bfloat16)
        w = jax.random.normal(jax.random.key(m + 1), (K, N), jnp.bfloat16)
        qw = quantize_weight(w)
        ref = ((x @ qw.qw.astype(jnp.bfloat16))
               * qw.scale.astype(jnp.bfloat16))
        out = int8_matmul(x, qw.qw, qw.scale)
        d = np.abs(np.asarray(out, np.float32)
                   - np.asarray(ref, np.float32))
        s = np.abs(np.asarray(ref, np.float32)).max()
        assert d.max() / s < 2e-2, (m, K, N, d.max() / s)


def test_moe_dense_int8_matches_ragged():
    # The decode-path dense-per-expert int8 MoE (llama._moe_dense_int8,
    # T <= _MOE_DENSE_MAX_T) must match the ragged dequantize-at-entry
    # path bit-for-bit up to summation order on the SAME quantized bank
    # (in fp32 both dequants are exact). Forcing the threshold to 0
    # eagerly reruns _mlp through the ragged branch.
    cfg, params = _tiny(dtype=jnp.float32, n_experts=4,
                        n_active_experts=2)
    qp = quantize_params(params, include_experts=True)
    lp = jax.tree.map(lambda a: a[0], qp["layers"])
    x = jax.random.normal(jax.random.key(9), (1, 32, cfg.dim),
                          jnp.float32) * 0.5
    assert 32 <= llama._MOE_DENSE_MAX_T
    out_dense = llama._mlp(x, lp, cfg)
    old = llama._MOE_DENSE_MAX_T
    try:
        llama._MOE_DENSE_MAX_T = 0
        out_ragged = llama._mlp(x, lp, cfg)
    finally:
        llama._MOE_DENSE_MAX_T = old
    np.testing.assert_allclose(np.asarray(out_dense),
                               np.asarray(out_ragged),
                               rtol=1e-4, atol=1e-4)
