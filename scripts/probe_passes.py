"""Probe: per-op cost inside the prefill flash tile (NONCAUSAL stream).

Rect grid (b,h,i,j) exactly like prefill's plain path, s=4096, 1024x1024
tiles, measuring RAW TFLOP/s. Variants strip one op each to expose its
cost; v_dots is the MXU-only ceiling for this memory pattern.

  v0    current update (s*c - m*c inside exp2)
  v1    pre-scaled q (scale*log2e folded into q before the kernel)
  v2    v1 + no max tracking (m fixed at 0; UNSAFE, perf probe only)
  v3    v1 + no sum/l update
  v4    v1 + exp2 computed on bf16 input (cast s first)
  v5    v1 + no exp2 (p = s cast)
  v6    v1 + 2 kv blocks per grid cell, dots issued before updates
  dots  s=QK; acc += cast(s) @ V (no softmax at all)
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mfa_tpu.utils.timing import chain, measure_rtt, scan_timeit

C = 0.08838834764831845 * 1.4426950408889634
MASK = -1e30


def _dot(a, b, tdims=(((1,), (1,)), ((), ()))):
    return jax.lax.dot_general(a, b, tdims, preferred_element_type=jnp.float32)


def _pv(p, v):
    return jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def make_kernel(variant, bq, bk, nkv):
    def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
        j = pl.program_id(3)

        @pl.when(j == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, MASK if variant != "v2" else 0.0)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]

        if variant == "dots":
            s = _dot(q, k)
            acc_scr[...] += _pv(s, v)
        elif variant == "v0":
            s = _dot(q, k)
            m_prev = m_scr[...]
            m_next = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp2((m_prev - m_next) * C)
            p = jnp.exp2(s * C - m_next[:, :1] * C)
            l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
            m_scr[...] = m_next
            acc_scr[...] = acc_scr[...] * alpha[:, :1] + _pv(p, v)
        elif variant in ("v1", "v2", "v3", "v4", "v5"):
            # q arrives pre-scaled by C: s is already the exp2 argument
            s = _dot(q, k)
            if variant == "v2":
                p = jnp.exp2(s)  # fixed m=0: no max, no alpha
                l_scr[...] += jnp.sum(p, axis=1, keepdims=True)
                acc_scr[...] += _pv(p, v)
            else:
                m_prev = m_scr[...]
                m_next = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
                alpha = jnp.exp2(m_prev - m_next)
                if variant == "v4":
                    p = jnp.exp2((s - m_next[:, :1]).astype(jnp.bfloat16))
                elif variant == "v5":
                    p = (s - m_next[:, :1]) * 1e-4  # no exp2
                else:
                    p = jnp.exp2(s - m_next[:, :1])
                if variant != "v3":
                    l_scr[...] = (alpha * l_scr[...]
                                  + jnp.sum(p, axis=1, keepdims=True))
                m_scr[...] = m_next
                acc_scr[...] = acc_scr[...] * alpha[:, :1] + _pv(p, v)
        elif variant == "v6":
            # two kv blocks per cell: both dots issued before the updates
            k2 = k_ref[0, 1] if k_ref.shape[1] > 1 else k
            v2 = v_ref[0, 1] if v_ref.shape[1] > 1 else v
            s_a = _dot(q, k)
            s_b = _dot(q, k2)
            for s, vv in ((s_a, v), (s_b, v2)):
                m_prev = m_scr[...]
                m_next = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
                alpha = jnp.exp2(m_prev - m_next)
                p = jnp.exp2(s - m_next[:, :1])
                l_scr[...] = (alpha * l_scr[...]
                              + jnp.sum(p, axis=1, keepdims=True))
                m_scr[...] = m_next
                acc_scr[...] = acc_scr[...] * alpha[:, :1] + _pv(p, vv)

        @pl.when(j == nkv - 1)
        def _store():
            l = l_scr[:, :1]
            l = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, 0] = (acc_scr[...] / l).astype(o_ref.dtype)

    return kernel


def run(variant, seq=4096, bq=1024, bk=1024, b=2, h=24, d=128):
    prescale = variant not in ("v0", "dots")
    q0 = jax.random.normal(jax.random.key(0), (b, h, seq, d), jnp.bfloat16)
    if prescale:
        q0 = (q0.astype(jnp.float32) * C).astype(jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, h, seq, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, h, seq, d), jnp.bfloat16)
    nkv = seq // bk
    call = pl.pallas_call(
        make_kernel(variant, bq, bk, nkv),
        grid=(b, h, seq // bq, nkv),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda b, h, i, j: (b, h, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b, h, i, j: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, seq, d), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )

    kk, vv = k, v

    def step(q, kk, vv):
        return chain(q, call(q, kk, vv))

    dt = scan_timeit(step, q0, args=(kk, vv), rtt=RTT)
    raw = 4 * b * h * seq * seq * d
    print(f"{variant}: {dt*1e3:.3f} ms  raw {raw/dt/1e12:.1f} TFLOP/s",
          flush=True)


def run_shapes():
    """Bench-shape sweep: same minimal kernels at b8/s2048 vs b2/s4096 —
    isolates per-(b,h)-boundary cost from kernel machinery."""
    for b, seq in ((8, 2048), (2, 4096), (2, 8192)):
        for variant in ("dots", "v2", "v0"):
            print(f"b={b} s={seq} ", end="", flush=True)
            try:
                run(variant, seq=seq, b=b)
            except Exception as e:
                print(f"{variant}: FAILED {e}", flush=True)



if __name__ == "__main__":
    RTT = measure_rtt()
    print(f"rtt {RTT*1e3:.1f} ms", file=sys.stderr)
    if len(sys.argv) > 1 and sys.argv[1] == "shapes":
        run_shapes()
        sys.exit(0)
    for variant in ("dots", "v0", "v1", "v2", "v3", "v4", "v5"):
        try:
            run(variant)
        except Exception as e:
            print(f"{variant}: FAILED {type(e).__name__}: {e}", flush=True)
