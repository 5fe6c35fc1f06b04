"""Round-4 prefill gap attribution at the BENCH shapes.

VERDICT r3 weak #1: captured s2048 = 79.8 TFLOP/s vs the clean-room
monolith's 87-91 at identical tiles (scripts/probe_overlap.py). Hypothesis
tested and CONFIRMED: the gap is NOT cell-stream alternation (the
clean-room causal probe has the same d/f/d stream and hits 87) but the
RISKY-BITS PREPASS — a serial 2-array HBM reduction over q and k
(b8/s2048: 2 x 100.7 MB at ~819 GB/s = ~0.25 ms = the whole gap;
measured prepass-alone 0.243 ms, default-vs-unchecked delta 0.33 ms).

RESOLUTION (round 4): deferred repair. The zero-shift kernel emits a
free per-q-block poison flag from its own epilogue values; a separate
near-empty kernel repairs flagged blocks in place. One-session A/B
(iters=48): s2048 flagged 85.3 vs unchecked 87.3 vs prepass ~79.8-80.5;
s8192 flagged 139.0 vs unchecked 140.9. Rejected designs, measured:
unchecked+cond (never-taken lax.cond repair) 67.8-69.8 — the cond
round-trips operands; in-kernel trailing repair cells 68.8-70.3 — ~1.9
us pipeline stall per extra grid cell even with unchanged BlockSpec
indices and no DMA.

Cell-order note (VERDICT's other suggested lever): at s2048 the per-(b,h)
stream is [diag(0,0), full(1,0), diag(1,1)] — 3 cells, 1 full between 2
diags. ANY permutation has 2 alternating transitions out of 3 (d->d can be
made uniform exactly once per period), so reordering cannot de-alternate
this shape even with multi-slot scratch; the lever only exists at long
seqlen, where the kernel already runs at the clean-room executed rate
(135 useful ~= 152 effective at s8192). Measured variants:

  default            merged kernel (prepass + embedded classic branch)
  unchecked          zero-shift only, NO prepass (r4: bits = zeros)
  prepass            the risky-bits reduction alone, scan-timed
  unchecked+cond     unchecked + a never-taken lax.cond into the classic
                     kernel (cost of a device-side repair dispatch)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_r4.py
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from mfa_tpu.kernels.prefill import (  # noqa: E402
    _LOG2E,
    _bound_risky,
    prefill_attention,
)
from mfa_tpu.utils.timing import chain, measure_rtt, scan_timeit  # noqa: E402

SHAPES = [(8, 2048), (2, 8192)]


def _prepass_bits(q, k, scale_log2e, bq):
    b, h, s, d = q.shape
    nq = s // bq
    kf32 = k.astype(jnp.float32)
    maxk = jnp.max(jnp.sqrt(jnp.sum(kf32 * kf32, axis=-1)), axis=-1)
    qf32 = q.astype(jnp.float32)
    qn = jnp.sqrt(jnp.sum(qf32 * qf32, axis=-1))
    qn_blk = jnp.max(qn.reshape(b, h, nq, bq), axis=-1)
    return _bound_risky(qn_blk, maxk[:, :, None], scale_log2e) \
        .reshape(-1).astype(jnp.int32)


def main():
    h, d = 24, 128
    rtt = measure_rtt()
    print(f"rtt ~{rtt*1e3:.1f} ms", flush=True)
    scale_log2e = (1.0 / d ** 0.5) * _LOG2E
    for b, s in SHAPES:
        q = jax.random.normal(jax.random.key(0), (b, h, s, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (b, h, s, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), (b, h, s, d), jnp.bfloat16)
        flops = 4 * b * h * s * s * d * 0.5
        bq = min(1024, s)

        def report(name, t):
            print(f"b={b} s={s} {name}: {t*1e3:.3f} ms "
                  f"{flops/t/1e12:.1f} TFLOP/s", flush=True)

        def step_default(qc, k, v):
            # round 4+: deferred-repair flagged kernel
            return chain(qc, prefill_attention(qc, k, v, causal=True))

        def step_prepass(qc, k, v):
            return chain(qc, prefill_attention(
                qc, k, v, causal=True, bound_softmax="prepass"))

        def step_unchecked(qc, k, v):
            return chain(qc, prefill_attention(
                qc, k, v, causal=True, bound_softmax="unchecked"))

        def step_prepass_alone(qc, k, v):
            bits = _prepass_bits(qc, k, scale_log2e, bq)
            return chain(qc, jnp.sum(bits.astype(jnp.float32)))

        def step_cond(qc, k, v):
            o = prefill_attention(qc, k, v, causal=True,
                                  bound_softmax="unchecked")
            flag = o[0, 0, 0, 0].astype(jnp.float32) > 1e30  # never fires
            o = jax.lax.cond(
                flag,
                lambda a, b_, c_, _o: prefill_attention(
                    a, b_, c_, causal=True, bound_softmax=False),
                lambda a, b_, c_, _o: _o,
                qc, k, v, o)
            return chain(qc, o)

        for name, fn in (("default(flagged)", step_default),
                         ("prepass", step_prepass),
                         ("unchecked", step_unchecked),
                         ("prepass-alone", step_prepass_alone),
                         ("unchecked+cond", step_cond)):
            try:
                t = scan_timeit(fn, q, args=(k, v), iters=48, rtt=rtt)
                report(name, t)
            except Exception as e:
                print(f"b={b} s={s} {name}: FAILED {type(e).__name__} "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
