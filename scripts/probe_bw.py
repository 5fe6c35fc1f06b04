"""Probe: is the flash tile VMEM-bandwidth bound? Halve the score-tile
traffic by materializing s in bf16 (dot preferred_element_type=bfloat16).

Per-tile VMEM traffic (1024x1024, d=128):
  v0 fp32 s:  s w+r 8MB, p w+r 4MB(2w+2r), m/l/acc rw 3MB  -> ~4TB/s obs
  bf16 s:     s w+r 4MB                                    -> expect +20-25%
Variants:
  dots32 / dots16 : no softmax, s fp32 / bf16 (ceiling pair)
  v0_16           : full online softmax, s bf16 (exp arg in f32 in-reg)
  v2_16           : no-max variant, s bf16
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


def _dot(a, b, prec=jnp.float32):
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=prec)


def _pv(p, v):
    return jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def make_kernel(variant, nkv):
    def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
        j = pl.program_id(3)

        @pl.when(j == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, MASK)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]

        if variant == "dots32":
            s = _dot(q, k)
            acc_scr[...] += _pv(s, v)
        elif variant == "dots16":
            s = _dot(q, k, jnp.bfloat16)
            acc_scr[...] += _pv(s, v)
        elif variant == "v0_16":
            s = _dot(q, k, jnp.bfloat16)
            m_prev = m_scr[...]
            m_next = jnp.maximum(
                m_prev, jnp.max(s, axis=1, keepdims=True).astype(jnp.float32))
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s.astype(jnp.float32) - m_next[:, :1]).astype(
                jnp.bfloat16)
            l_scr[...] = (alpha * l_scr[...]
                          + jnp.sum(p.astype(jnp.float32), axis=1,
                                    keepdims=True))
            m_scr[...] = m_next
            acc_scr[...] = acc_scr[...] * alpha[:, :1] + _pv(p, v)
        elif variant == "v2_16":
            s = _dot(q, k, jnp.bfloat16)
            p = jnp.exp2(s.astype(jnp.float32)).astype(jnp.bfloat16)
            l_scr[...] += jnp.sum(p.astype(jnp.float32), axis=1,
                                  keepdims=True)
            acc_scr[...] += _pv(p, v)

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
        make_kernel(variant, nkv),
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
    for name, variant in (("dots32", "dots32"), ("dots16", "dots16"),
                          ("v2_16 ", "v2_16")):
        try:
            run(name, variant)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
    try:
        o, q0, k, v = run("v0_16 ", "v0_16")
        s = jnp.einsum("bhqd,bhkd->bhqk", q0.astype(jnp.float32),
                       k.astype(jnp.float32))
        p = jax.nn.softmax(s * 0.6931471805599453, axis=-1)
        ref = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
        print("v0_16 maxdiff vs oracle:",
              float(jnp.abs(o.astype(jnp.float32) - ref).max()))
    except Exception as e:
        print(f"v0_16: FAILED {type(e).__name__}: {e}", flush=True)
