"""Deferred-repair bound softmax (the round-4 default prefill path).

The default kernel runs the zero-shift (max-free) body and detects
poisoned q blocks AFTER the fact from values already in registers
(row sums outside (_L_MIN, finite), non-finite output rows), then
recomputes exactly those blocks with a classic in-kernel repair cell
(kernels/prefill.py:_repair_block). These tests drive the repair on
inputs that genuinely poison the zero-shift sums — overflow (inf),
underflow (all-flush), and near-flush significant-weight loss — and pin
every mode against the dense oracle:

- flagged (default, True) == oracle on adversarial inputs,
- "unchecked" DIFFERS on the same inputs (proves the repair actually
  executed rather than the input being accidentally benign),
- "prepass" (the pre-round-4 design) stays available and agrees.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mfa_tpu.kernels.prefill import prefill_attention
from mfa_tpu.ref.oracle import attention_ref
from tests.utils import assert_close, make_qkv


def _bhsd(key, b, sq, sk, h, hkv, d, std=1.0, dtype=jnp.float32):
    q, k, v = make_qkv(key, b, sq, sk, h, hkv, d, dtype=dtype, std=std)
    return tuple(jnp.swapaxes(x, 1, 2) for x in (q, k, v))


def _oracle(q, k, v, **kw):
    # q/k/v in [b, h, s, d]
    args = tuple(jnp.swapaxes(x, 1, 2) for x in (q, k, v))
    return jnp.swapaxes(attention_ref(*args, **kw), 1, 2)


def test_repair_fires_and_fixes_overflow():
    # std 1e3 fp32 inputs: |scores|*scale ~ 1e5 >> 128 — the zero-shift
    # sums overflow to inf (and whole rows flush to 0 on the negative
    # side). The flagged default must match the oracle; "unchecked" must
    # NOT (that difference proves the repair cell executed).
    q, k, v = _bhsd(jax.random.key(0), 1, 256, 256, 2, 2, 128, std=1e3)
    out = prefill_attention(q, k, v, causal=True)
    ref = _oracle(q, k, v, causal=True)
    assert_close(out, ref, tol=3e-3, msg="flagged adversarial == oracle")
    raw = prefill_attention(q, k, v, causal=True,
                            bound_softmax="unchecked")
    assert not bool(
        jnp.all(jnp.abs(jnp.nan_to_num(raw.astype(jnp.float32), nan=1e9)
                        - ref.astype(jnp.float32)) < 1e-2)
    ), "unchecked agreed with the oracle — inputs did not poison the sums"


def test_repair_near_flush_weight_loss():
    # All-negative score rows past the fp32 flush horizon WITHOUT any
    # inf: every winner flushes, l drops below _L_MIN, the block must be
    # flagged and repaired (zero-shift alone would return garbage zeros).
    key = jax.random.key(1)
    q, k, v = _bhsd(key, 1, 128, 128, 2, 2, 128)
    bias = jnp.ones((1, 1, 1, 128), q.dtype)
    # scores shift by -40*40*128*scale ~ -18100: far below exp2's -126
    q = q + 40.0 * bias
    k = k - 40.0 * bias
    out = prefill_attention(q, k, v, causal=True)
    ref = _oracle(q, k, v, causal=True)
    assert_close(out, ref, tol=3e-3, msg="near-flush rows repaired")


def test_repair_mixed_batch_and_lse():
    # one poisoned batch element + one benign: per-(b, h, block) flags
    # repair only what needs it; LSE comes back repaired too.
    qa, ka, va = _bhsd(jax.random.key(2), 1, 320, 320, 2, 2, 128, std=1e3)
    qb, kb, vb = _bhsd(jax.random.key(3), 1, 320, 320, 2, 2, 128)
    q = jnp.concatenate([qa, qb])
    k = jnp.concatenate([ka, kb])
    v = jnp.concatenate([va, vb])
    out, lse = prefill_attention(q, k, v, causal=True, return_lse=True)
    ref = _oracle(q, k, v, causal=True)
    assert_close(out, ref, tol=3e-3, msg="mixed batch")
    scale = 1.0 / np.sqrt(128.0)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    mask = jnp.arange(320)[None, :] <= jnp.arange(320)[:, None]
    s = jnp.where(mask, s, -jnp.inf)
    ref_lse = jax.nn.logsumexp(s, axis=-1)
    # adversarial magnitudes: compare LSE at a relative tolerance
    diff = np.abs(np.asarray(lse) - np.asarray(ref_lse))
    rel = diff / np.maximum(np.abs(np.asarray(ref_lse)), 1.0)
    assert rel.max() < 1e-3, f"lse rel err {rel.max()}"


def test_repair_window_sinks_adversarial():
    q, k, v = _bhsd(jax.random.key(4), 1, 384, 384, 2, 2, 128, std=300.0)
    out = prefill_attention(q, k, v, causal=True, window_size=(127, 0),
                            sink_tokens=16)
    sc = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                    k.astype(jnp.float32)) / np.sqrt(128.0)
    row = jnp.arange(384)[:, None]
    col = jnp.arange(384)[None, :]
    vis = (col <= row) & ((col >= row - 127) | (col < 16))
    sc = jnp.where(vis, sc, -jnp.inf)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(sc, -1),
                     v.astype(jnp.float32))
    assert_close(out, ref, tol=3e-3, msg="window+sinks adversarial")


def test_repair_ragged_tail():
    # non-tile-multiple seqlens: repair masks the sequence tail too
    q, k, v = _bhsd(jax.random.key(5), 1, 200, 173, 2, 2, 128, std=1e3)
    out = prefill_attention(q, k, v, causal=True)
    ref = _oracle(q, k, v, causal=True)
    assert_close(out, ref, tol=3e-3, msg="ragged adversarial")


def test_modes_agree_on_benign():
    q, k, v = _bhsd(jax.random.key(6), 2, 256, 256, 4, 2, 64,
                    dtype=jnp.bfloat16)
    ref = _oracle(q, k, v, causal=True)
    for mode in (True, "prepass", "unchecked", False):
        out = prefill_attention(q, k, v, causal=True, bound_softmax=mode)
        assert_close(out, ref, msg=f"mode {mode}")


def test_prepass_mode_still_guards():
    q, k, v = _bhsd(jax.random.key(7), 1, 256, 256, 2, 2, 128, std=1e3)
    out = prefill_attention(q, k, v, causal=True, bound_softmax="prepass")
    assert_close(out, _oracle(q, k, v, causal=True), tol=3e-3,
                 msg="prepass adversarial")


def test_narrow_head_dim_falls_back_safely():
    # head_dim % 128 != 0 cannot run the repair cell's manual DMA
    # (128-lane memref tiling); the default must silently take the
    # prepass guard and stay exact on adversarial inputs.
    q, k, v = _bhsd(jax.random.key(8), 1, 256, 256, 2, 2, 64, std=1e3)
    out = prefill_attention(q, k, v, causal=True)
    assert_close(out, _oracle(q, k, v, causal=True), tol=3e-3,
                 msg="narrow-d adversarial fallback")


def test_flag_rate_zero_on_benign():
    # Benign bench-shaped inputs must flag ZERO q blocks: a nonzero rate
    # here means the serving path silently pays the repair recompute on
    # every call (bound_softmax="flag_debug" returns the raw flags).
    q, k, v = _bhsd(jax.random.key(5), 2, 256, 256, 2, 2, 128)
    out, flags = prefill_attention(q, k, v, causal=True,
                                   bound_softmax="flag_debug")
    assert int(jnp.sum(flags)) == 0, (
        f"benign causal inputs flagged {int(jnp.sum(flags))} blocks")
    assert_close(out, _oracle(q, k, v, causal=True), tol=2e-5,
                 msg="flag_debug output == oracle")


def test_flag_rate_zero_on_empty_band_geometries():
    # Window + kv_position_offset edge geometries leave some rows with
    # STRUCTURALLY empty mask bands (ring attention shards, clamped raw
    # bands). Those rows legitimately have l == 0 and must NOT flag —
    # before r5 they sent their block to the repair kernel on every call.
    q, k, v = _bhsd(jax.random.key(6), 1, 128, 128, 2, 2, 128)
    # kv_off 100, window 16: rows >= 44 have lo = r + 84 >= 128 = sk
    out, flags = prefill_attention(
        q, k, v, window_size=(16, 0), kv_position_offset=100,
        bound_softmax="flag_debug")
    assert int(jnp.sum(flags)) == 0, (
        f"empty-band geometry flagged {int(jnp.sum(flags))} blocks")
    ref = _oracle(q, k, v, window_size=(16, 0), q_offset=100)
    assert_close(out, ref, tol=2e-5, msg="empty-band output == oracle")
    # fully-empty shard: EVERY row's band is past this KV shard
    out2, flags2 = prefill_attention(
        q, k, v, window_size=(8, 0), kv_position_offset=4096,
        bound_softmax="flag_debug")
    assert int(jnp.sum(flags2)) == 0, "all-dead shard flagged blocks"
    assert not bool(jnp.any(jnp.isnan(out2))), "all-dead shard NaN"


def test_flag_rate_nonzero_on_adversarial():
    # The structural-empty pass must not swallow REAL poison: overflow
    # inputs still flag (and the repaired output matches the oracle).
    q, k, v = _bhsd(jax.random.key(7), 1, 256, 256, 2, 2, 128, std=1e3)
    out, flags = prefill_attention(q, k, v, causal=True,
                                   bound_softmax="flag_debug")
    assert int(jnp.sum(flags)) > 0, "adversarial inputs did not flag"
    assert_close(out, _oracle(q, k, v, causal=True), tol=3e-3,
                 msg="flag_debug adversarial == oracle")
