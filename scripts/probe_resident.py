"""Probe: resident-KV causal prefill kernel (grid parallel over q blocks,
full K/V in VMEM, dynamic fori over unmasked kv blocks + one masked diag
step). Compare vs current triangular-grid prefill_attention."""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mfa_tpu.utils.timing import chain, measure_rtt, scan_timeit

LOG2E = 1.4426950408889634
MASK = -1e30


def kernel(q_ref, k_ref, v_ref, o_ref, *, bq, bk, d, scale):
    i = pl.program_id(2)
    q = q_ref[0, 0]  # [bq, d]
    c = scale * LOG2E

    def update(carry, s, ksl):
        m, l, acc = carry
        m_next = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp2((m - m_next) * c)
        p = jnp.exp2(s * c - m_next[:, :1] * c)
        l = alpha * l + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0, 0, ksl]
        pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return m_next, l, acc * alpha[:, :1] + pv

    def body(j, carry):
        ksl = pl.ds(j * bk, bk)
        k = k_ref[0, 0, ksl]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return update(carry, s, ksl)

    init = (jnp.full((bq, 128), MASK, jnp.float32),
            jnp.zeros((bq, 128), jnp.float32),
            jnp.zeros((bq, d), jnp.float32))
    # unmasked full blocks below the diagonal
    n_full = i * bq // bk
    carry = jax.lax.fori_loop(0, n_full, body, init)
    # masked diagonal region: blocks n_full .. last
    last = ((i + 1) * bq - 1) // bk

    def mbody(j, carry):
        ksl = pl.ds(j * bk, bk)
        k = k_ref[0, 0, ksl]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0) + i * bq
        col = jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1) + j * bk
        s = jnp.where(col <= row, s, MASK)
        return update(carry, s, ksl)

    m, l, acc = jax.lax.fori_loop(n_full, last + 1, mbody, carry)
    l = l[:, :1]
    l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


def run_resident(name, seq, bq, bk, b, h, d=128):
    q0 = jax.random.normal(jax.random.key(0), (b, h, seq, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, h, seq, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, h, seq, d), jnp.bfloat16)
    nq = seq // bq
    call = pl.pallas_call(
        functools.partial(kernel, bq=bq, bk=bk, d=d, scale=d ** -0.5),
        grid=(b, h, nq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, seq, d), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, seq, d), lambda b, h, i: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b, h, i: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, seq, d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )

    def step(q, k, v):
        return chain(q, call(q, k, v))

    dt = scan_timeit(step, q0, args=(k, v), rtt=RTT)
    useful = 4 * b * h * seq * seq * d * 0.5
    print(f"{name}: {dt*1e3:.3f} ms  {useful/dt/1e12:.1f} TFLOP/s", flush=True)
    return call(q0, k, v), q0, k, v


if __name__ == "__main__":
    RTT = measure_rtt()
    print(f"rtt {RTT*1e3:.1f} ms", file=sys.stderr)
    from mfa_tpu.kernels.prefill import prefill_attention

    for seq, b, h in ((2048, 8, 24), (8192, 1, 24)):
        outs = {}
        for bq, bk in ((512, 512), (1024, 1024), (512, 1024), (1024, 512),
                       (256, 512)):
            o, q0, k, v = run_resident(
                f"s={seq} resident bq={bq} bk={bk}", seq, bq, bk, b, h)
            outs[(bq, bk)] = o
        ref = prefill_attention(q0, k, v, causal=True)
        for key, o in outs.items():
            diff = float(jnp.abs(o.astype(jnp.float32)
                                 - ref.astype(jnp.float32)).max())
            print(f"  s={seq} {key} maxdiff vs current: {diff:.2e}")
