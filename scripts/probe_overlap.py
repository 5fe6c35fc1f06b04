"""Clean-room flash-tile variants: where the prefill s=2048 time goes.

Round-3 investigation record (all numbers v5e, iters=48, b8/h24/s2048/
d128, bq=bk=1024, slab 256). The production kernel captures ~79-80
TFLOP/s useful at this shape vs a 95 target; this probe isolates the
ceiling with minimal kernels:

  full tiles (non-causal):   value-acc 155.9 / scratch-rmw 148.5 /
                             two-phase 157.7 / NO-EXP2 155.0 TFLOP/s
      -> the exp2 softmax is FREE (no-exp2 == value-acc): MXU/VPU do
         overlap; an earlier additivity estimate was wrong.
  clean causal, same tiles:  monolith 87.1 useful; raw-store (no
                             normalize epilogue) 91.5; MXU-matmul
                             lane-reduce store 85.0 (loses).
      -> the causal CELL STRUCTURE (3 cells/(b,h), diag/full bodies
         alternating in the stream) is what halves the rate, not the
         softmax, the store (~5%), or the kernel's table machinery
         (with_classic/bits measured free; bht == flat grid).
  real kernel A/B:           default 79-82; smaller tiles LOSE
                             (512: 68, 256: 39 — per-cell overhead
                             dominates the saved diagonal flops).
  s8192 comparison:          the same kernel hits ~135 useful = ~150
                             effective = the clean-room full-tile rate;
                             long sequences amortize the cell-stream
                             nonuniformity that s2048 cannot.

Conclusion: at b8/s2048 the realistic ceiling for THIS decomposition is
~87-91; passing it needs uniform cell streams (e.g. separate diag/full
kernels combined additively — blocked by ~0.6 ms of fp32 partial HBM
traffic at this size). Kept: value-acc in _step (simpler, +0-1%).

Round-5 closure of the remaining gap: the flagged DEFAULT now measures
87.2 TFLOP/s == flag_presence (the flag is free; the old 83-85 readings
were the isfinite(output) sweep re-reading [bq, d] per store plus
empty-band iota arithmetic, both now removed/gated — kernels/prefill.py
store epilogue). The raw-store epilogue is NOT worth lifting into the
real kernel at this shape, by arithmetic: the clean-room win is
2.365 ms -> 2.251 ms (~0.11 ms saved in-kernel) but a separate
normalize pass must re-read the fp32 un-normalized O (402 MB) + row
sums and write the bf16 result (201 MB) = ~0.74 ms at 819 GB/s — a
net ~0.6 ms LOSS unless the normalize fuses into the next consumer
(o-projection), which is a model-level fusion outside a kernel
benchmark's scope. s8192 already runs at the clean-room full-tile rate.

Usage: python scripts/probe_overlap.py
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, ".")

from mfa_tpu.utils.timing import chain, measure_rtt, scan_timeit  # noqa: E402

B, H, S, D = 8, 24, 2048, 128
BQ = BK = 1024
SLAB = 256


def _lpart(p):
    acc = p[:, :128]
    for c0 in range(128, p.shape[1], 128):
        acc = acc + p[:, c0:c0 + 128]
    return acc


def _dot(a, b_t):
    return jax.lax.dot_general(a, b_t, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _pv(p, v):
    return jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _body(q_ref, k_ref, v_ref, o_ref, l_scr, acc_scr, *, variant):
    j = pl.program_id(2)
    nk = S // BK

    @pl.when(j == 0)
    def _init():
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    if variant == "scratch-rmw":
        for c in range(BK // SLAB):
            ksl = slice(c * SLAB, (c + 1) * SLAB)
            s = _dot(q, k_ref[0, ksl])
            p = jnp.exp2(s * 0.085)
            l_scr[...] = l_scr[...] + _lpart(p)
            acc_scr[...] = acc_scr[...] + _pv(p, v_ref[0, ksl])
    elif variant in ("value-acc", "no-exp2"):
        l = jnp.zeros((BQ, 128), jnp.float32)
        acc = jnp.zeros((BQ, D), jnp.float32)
        for c in range(BK // SLAB):
            ksl = slice(c * SLAB, (c + 1) * SLAB)
            s = _dot(q, k_ref[0, ksl])
            if variant == "no-exp2":
                p = s * 0.085
            else:
                p = jnp.exp2(s * 0.085)
            l = l + _lpart(p)
            acc = acc + _pv(p, v_ref[0, ksl])
        l_scr[...] = l_scr[...] + l
        acc_scr[...] = acc_scr[...] + acc
    elif variant == "two-phase":
        ss = []
        for c in range(BK // SLAB):
            ksl = slice(c * SLAB, (c + 1) * SLAB)
            ss.append(_dot(q, k_ref[0, ksl]))
        l = jnp.zeros((BQ, 128), jnp.float32)
        acc = jnp.zeros((BQ, D), jnp.float32)
        for c, s in enumerate(ss):
            ksl = slice(c * SLAB, (c + 1) * SLAB)
            p = jnp.exp2(s * 0.085)
            l = l + _lpart(p)
            acc = acc + _pv(p, v_ref[0, ksl])
        l_scr[...] = l_scr[...] + l
        acc_scr[...] = acc_scr[...] + acc

    @pl.when(j == nk - 1)
    def _store():
        lsum = jnp.sum(l_scr[...], axis=1, keepdims=True)
        o_ref[0] = (acc_scr[...] /
                    jnp.maximum(lsum, 1e-9)).astype(o_ref.dtype)


def _causal_body(q_ref, k_ref, v_ref, o_ref, l_scr, acc_scr, *, variant):
    """Clean-room causal tile: same value-acc loop, j > i cells fully
    skipped, diagonal masked (monolith) or column-subtiled."""
    i, j = pl.program_id(1), pl.program_id(2)
    nk = S // BK

    @pl.when(j == 0)
    def _init():
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(j < i)
    def _full():
        q = q_ref[0]
        l = jnp.zeros((BQ, 128), jnp.float32)
        acc = jnp.zeros((BQ, D), jnp.float32)
        for c in range(BK // SLAB):
            ksl = slice(c * SLAB, (c + 1) * SLAB)
            p = jnp.exp2(_dot(q, k_ref[0, ksl]) * 0.085)
            l = l + _lpart(p)
            acc = acc + _pv(p, v_ref[0, ksl])
        l_scr[...] = l_scr[...] + l
        acc_scr[...] = acc_scr[...] + acc

    @pl.when(j == i)
    def _diag():
        q = q_ref[0]
        l = jnp.zeros((BQ, 128), jnp.float32)
        acc = jnp.zeros((BQ, D), jnp.float32)
        if not variant.startswith("causal-diagsub"):
            s = _dot(q, k_ref[0])
            row = jax.lax.broadcasted_iota(jnp.int32, (BQ, 1), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (1, BK), 1)
            s = jnp.where(col <= row, s, -1e30)
            p = jnp.exp2(s * 0.085)
            l = l + _lpart(p)
            acc = acc + _pv(p, v_ref[0])
            l_scr[...] = l_scr[...] + l
            acc_scr[...] = acc_scr[...] + acc
        else:  # causal-diagsub: tall column slabs, dead triangle dropped
            for c in range(BK // SLAB):
                c0 = c * SLAB
                qs = q[c0:]
                s = _dot(qs, k_ref[0, c0:c0 + SLAB])
                row = jax.lax.broadcasted_iota(
                    jnp.int32, (BQ - c0, 1), 0)
                col = jax.lax.broadcasted_iota(jnp.int32, (1, SLAB), 1)
                s = jnp.where(col <= row, s, -1e30)
                p = jnp.exp2(s * 0.085)
                l = l.at[c0:].add(_lpart(p))
                acc = acc.at[c0:].add(_pv(p, v_ref[0, c0:c0 + SLAB]))
            l_scr[...] = l_scr[...] + l
            acc_scr[...] = acc_scr[...] + acc

    @pl.when(j == jnp.minimum(i, nk - 1))
    def _store():
        if variant.endswith("rawstore"):
            o_ref[0] = acc_scr[...].astype(o_ref.dtype)
        elif variant.endswith("mxustore"):
            ones = jnp.ones((128, D), jnp.float32)
            lb = jax.lax.dot_general(
                l_scr[...], ones, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0] = (acc_scr[...] /
                        jnp.maximum(lb, 1e-9)).astype(o_ref.dtype)
        else:
            lsum = jnp.sum(l_scr[...], axis=1, keepdims=True)
            o_ref[0] = (acc_scr[...] /
                        jnp.maximum(lsum, 1e-9)).astype(o_ref.dtype)


def run(variant, q, k, v, rtt):
    nq, nk = S // BQ, S // BK
    body = _causal_body if variant.startswith("causal") else _body
    f = pl.pallas_call(
        functools.partial(body, variant=variant),
        grid=(B * H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, BQ, D), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((1, BK, D), lambda bh, i, j: (bh, j, 0)),
            pl.BlockSpec((1, BK, D), lambda bh, i, j: (bh, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, BQ, D), lambda bh, i, j: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, S, D), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((BQ, 128), jnp.float32),
                        pltpu.VMEM((BQ, D), jnp.float32)],
    )

    def step(qc, k, v):
        return chain(qc, f(qc, k, v))

    t = scan_timeit(step, q, args=(k, v), iters=48, rtt=rtt)
    fl = 4 * B * H * S * S * D  # full (non-causal)
    if variant.startswith("causal"):
        fl //= 2  # useful causal flops
    print(f"{variant}: {t*1e3:.3f} ms  {fl/t/1e12:.1f} TFLOP/s", flush=True)


from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def main():
    rtt = measure_rtt()
    print(f"rtt ~{rtt*1e3:.1f} ms", flush=True)
    q = jax.random.normal(jax.random.key(0), (B * H, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (B * H, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (B * H, S, D), jnp.bfloat16)
    for variant in ("causal-monolith", "causal-monolith-rawstore",
                    "causal-monolith-mxustore"):
        try:
            run(variant, q, k, v, rtt)
        except Exception as ex:
            print(f"{variant}: FAILED {type(ex).__name__}: {str(ex)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
