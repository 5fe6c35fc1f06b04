"""Probe: lagged-max online softmax (take the cross-lane rowmax off the
MXU critical path).

Standard update chains dot -> rowmax -> exp2 -> pv: the [bq] cross-lane
max reduce (~0.5us/tile, probe_passes v1 vs v2) serializes between the
two MXU ops. Lagged variant computes p with the PREVIOUS running max
(known before the dot issues), so the chain is dot -> exp2 -> pv (max
runs concurrently with pv and only feeds the cheap [bq,d] rescale):

  p~_j  = exp2(s_j - m_{j-1})
  m_j   = max(m_{j-1}, rowmax s_j)       # off critical path
  alpha = exp2(m_{j-1} - m_j)
  acc_j = (acc_{j-1} + p~_j V_j) * alpha
  l_j   = (l_{j-1} + rowsum p~_j) * alpha

First block (j==0) runs the standard path (m_prev is -inf).
Variants: lag (no overflow guard — fine for N(0,1) probe data),
lag_clamp (clamped exponent + jnp.any fixup branch — compile check).
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


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _pv(p, v):
    return jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def make_kernel(variant, bq, bk, nkv):
    def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
        j = pl.program_id(3)
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = _dot(q, k)

        @pl.when(j == 0)
        def _first():
            m0 = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp2(s - m0)
            m_scr[...] = jnp.broadcast_to(m0, m_scr.shape)
            l_scr[...] = jnp.broadcast_to(
                jnp.sum(p, axis=1, keepdims=True), l_scr.shape)
            acc_scr[...] = _pv(p, v)

        @pl.when(j > 0)
        def _lagged():
            m_prev = m_scr[...]
            arg = s - m_prev[:, :1]
            if variant == "lag_clamp":
                arg = jnp.minimum(arg, 60.0)
            p = jnp.exp2(arg)
            pv = _pv(p, v)
            m_next = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp2(m_prev - m_next)
            l_scr[...] = (l_scr[...]
                          + jnp.sum(p, axis=1, keepdims=True)) * alpha
            m_scr[...] = m_next
            acc_scr[...] = (acc_scr[...] + pv) * alpha[:, :1]
            if variant == "lag_clamp":
                overflow = jnp.max(s) > m_prev[0, 0] + 60.0

                @pl.when(overflow)
                def _fixup():
                    # exact recompute with the true running max
                    pe = jnp.exp2(s - m_next[:, :1])
                    l_scr[...] = (l_scr[...] * 0.0
                                  + jnp.sum(pe, axis=1, keepdims=True))
                    acc_scr[...] = _pv(pe, v)

        @pl.when(j == nkv - 1)
        def _store():
            l = l_scr[:, :1]
            l = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, 0] = (acc_scr[...] / l).astype(o_ref.dtype)

    return kernel


def run(name, variant, seq=4096, bq=1024, bk=1024, b=2, h=24, d=128):
    q0 = jax.random.normal(jax.random.key(0), (b, h, seq, d), jnp.bfloat16)
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

    def step(q, k, v):
        return chain(q, call(q, k, v))

    dt = scan_timeit(step, q0, args=(k, v), rtt=RTT)
    raw = 4 * b * h * seq * seq * d
    print(f"{name}: {dt*1e3:.3f} ms  raw {raw/dt/1e12:.1f} TFLOP/s",
          flush=True)
    return call(q0, k, v), q0, k, v


if __name__ == "__main__":
    RTT = measure_rtt()
    print(f"rtt {RTT*1e3:.1f} ms", file=sys.stderr)
    o, q0, k, v = run("lag       bq=1024 bk=1024", "lag")
    try:
        run("lag_clamp bq=1024 bk=1024", "lag_clamp")
    except Exception as e:
        print(f"lag_clamp FAILED {type(e).__name__}: {e}", flush=True)
    run("lag       bq=1024 bk=2048", "lag", bk=2048)
    run("lag       bq=512  bk=1024", "lag", bq=512)
    s = jnp.einsum("bhqd,bhkd->bhqk", q0.astype(jnp.float32),
                   k.astype(jnp.float32))
    p = jax.nn.softmax(s * 0.6931471805599453, axis=-1)
    ref = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    print("maxdiff vs oracle:",
          float(jnp.abs(o.astype(jnp.float32) - ref).max()))
