"""Probe: software-pipelined flash tile (scores double-buffered in VMEM
scratch so block j+1's QK dot overlaps block j's softmax update).

Rect noncausal grid (b, h, i, nkv+1): step j issues dot_j into
s_scr[j%2]; step j>0 applies the online-softmax update for block j-1 from
s_scr[(j-1)%2]; step nkv stores. Compare vs v0 (serial) and dots ceiling
from probe_passes (159.5).
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


def make_kernel(bq, bk, nkv, masked=False):
    def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, s_scr):
        j = pl.program_id(3)

        @pl.when(j == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, MASK)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        # issue this block's dot FIRST (MXU runs it while the VPU below
        # processes the previous block's scores)
        @pl.when(j < nkv)
        def _dot_step():
            s_scr[j % 2] = _dot(q_ref[0, 0], k_ref[0, 0])

        @pl.when(j > 0)
        def _update():
            s = s_scr[(j - 1) % 2]
            if masked:
                row = jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
                col = jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
                s = jnp.where(col <= row, s, MASK)
            m_prev = m_scr[...]
            m_next = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - m_next[:, :1])
            l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
            m_scr[...] = m_next
            acc_scr[...] = acc_scr[...] * alpha[:, :1] + _pv(p, v_ref[0, 0])

        @pl.when(j == nkv)
        def _store():
            l = l_scr[:, :1]
            l = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, 0] = (acc_scr[...] / l).astype(o_ref.dtype)

    return kernel


def run(name, seq=4096, bq=1024, bk=1024, b=2, h=24, d=128, masked=False):
    q0 = jax.random.normal(jax.random.key(0), (b, h, seq, d), jnp.bfloat16)
    q0 = (q0.astype(jnp.float32) * C).astype(jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, h, seq, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, h, seq, d), jnp.bfloat16)
    nkv = seq // bk
    call = pl.pallas_call(
        make_kernel(bq, bk, nkv, masked=masked),
        grid=(b, h, seq // bq, nkv + 1),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bk, d),
                         lambda b, h, i, j: (b, h, jnp.minimum(j, nkv - 1), 0)),
            pl.BlockSpec((1, 1, bk, d),
                         lambda b, h, i, j: (b, h, jnp.maximum(j - 1, 0), 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b, h, i, j: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, seq, d), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((2, bq, bk), jnp.float32),
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
    o, q0, k, v = run("pipe bq=1024 bk=1024")
    run("pipe bq=1024 bk=1024 all-masked", masked=True)
    run("pipe bq=512  bk=1024", bq=512)
    run("pipe bq=1024 bk=2048", bk=2048)
    run("pipe bq=512  bk=512", bq=512, bk=512)
    # correctness vs jnp oracle (noncausal, q pre-scaled by C -> softmax
    # base-2 over s equals standard softmax with scale)
    s = jnp.einsum("bhqd,bhkd->bhqk", q0.astype(jnp.float32),
                   k.astype(jnp.float32))
    p = jax.nn.softmax(s * 0.6931471805599453, axis=-1)  # ln2: 2^s = e^(s ln2)
    ref = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    print("maxdiff vs oracle:",
          float(jnp.abs(o.astype(jnp.float32) - ref).max()))
