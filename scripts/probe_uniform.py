"""Probe: WHY causal band cells run slower than the noncausal stream.

probe_passes showed a noncausal max-free 1024^2 stream at ~158 raw
TFLOP/s; the production causal kernel's cells execute at ~87-132. This
probe rebuilds the causal band grid (scalar-prefetched cell tables, same
as prefill) with minimal kernels to isolate the cause:

  dots  band cells, dots only (ceiling for this grid)
  u1    UNIFORM body: every cell applies the causal mask, no when-branch
        between masked/plain bodies, monolithic tiles, max-free update
  u2    two `when` bodies (masked iff needs_mask) — isolates branch cost
  u3    u1 with q pre-scaled by scale*log2e (drops the s*c - m*c FMA)
  u4    u3 + diag column-subtiling (the production fast path shape)

Usage: python scripts/probe_uniform.py
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from mfa_tpu.utils.timing import chain, measure_rtt, scan_timeit  # noqa: E402

C = 0.08838834764831845 * 1.4426950408889634
MASK = -1e30


def _dot(a, b, tdims=(((1,), (1,)), ((), ()))):
    return jax.lax.dot_general(a, b, tdims, preferred_element_type=jnp.float32)


def _pv(p, v):
    return jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def make_kernel(variant, bq, bk, nkv, dsub=512):
    prescaled = variant in ("u3", "u4", "dots")

    def kernel(im_ref, jm_ref, q_ref, k_ref, v_ref, o_ref,
               m_scr, l_scr, acc_scr):
        t = pl.program_id(2)
        i = im_ref[t]
        j = jm_ref[t]
        last_j = jnp.minimum(i, nkv - 1)

        @pl.when(j == 0)
        def _init():
            qf = q_ref[0, 0].astype(jnp.float32)
            qn = jnp.sqrt(jnp.sum(qf * qf, axis=1, keepdims=True))
            bound = qn * 12.0  # stand-in maxk
            m_scr[...] = jnp.broadcast_to(
                bound if prescaled else bound, m_scr.shape)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        q = q_ref[0, 0]

        def update(s, qsl, v):
            if prescaled:
                p = jnp.exp2(s - m_scr[qsl, :1])
            else:
                p = jnp.exp2(s * C - m_scr[qsl, :1] * C)
            acc = p[:, :128]
            for c0 in range(128, s.shape[1], 128):
                acc = acc + p[:, c0:c0 + 128]
            l_scr[qsl, :] = l_scr[qsl, :] + acc
            acc_scr[qsl, :] = acc_scr[qsl, :] + _pv(p, v)

        def masked_step():
            s = _dot(q, k_ref[0, 0])
            row = jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0) + i * bq
            col = jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1) + j * bk
            s = jnp.where(col <= row, s, MASK)
            update(s, slice(None), v_ref[0, 0])

        def plain_step():
            s = _dot(q, k_ref[0, 0])
            update(s, slice(None), v_ref[0, 0])

        if variant == "dots":
            s = _dot(q, k_ref[0, 0])
            acc_scr[...] += _pv(s, v_ref[0, 0])
        elif variant in ("u1", "u3"):
            masked_step()  # uniform: ALWAYS masked, single body
        elif variant == "u2":
            pl.when(j == i)(masked_step)
            pl.when(j != i)(plain_step)
        elif variant == "u4":
            def diag_step():
                for cs in range(bk // dsub):
                    c0 = cs * dsub
                    qsl = slice(c0, bq)
                    ss = _dot(q_ref[0, 0, qsl], k_ref[0, 0, c0:c0 + dsub])
                    rowa = jax.lax.broadcasted_iota(
                        jnp.int32, (bq - c0, 1), 0)
                    cola = jax.lax.broadcasted_iota(
                        jnp.int32, (1, dsub), 1)
                    ss = jnp.where(cola <= rowa, ss, MASK)
                    update(ss, qsl, v_ref[0, 0, c0:c0 + dsub])
            pl.when(j == i)(diag_step)
            pl.when(j != i)(plain_step)

        @pl.when(j == last_j)
        def _store():
            l = jnp.sum(l_scr[...], axis=1, keepdims=True)
            l = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, 0] = (acc_scr[...] / l).astype(o_ref.dtype)

    return kernel


def run(variant, seq, b, bq=1024, bk=1024, h=24, d=128):
    q0 = jax.random.normal(jax.random.key(0), (b, h, seq, d), jnp.bfloat16)
    if variant in ("u3", "u4", "dots"):
        q0 = (q0.astype(jnp.float32) * C).astype(jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, h, seq, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, h, seq, d), jnp.bfloat16)
    nq, nkv = seq // bq, seq // bk
    cells_i, cells_j, executed = [], [], 0
    for i in range(nq):
        for j in range(i + 1):
            cells_i.append(i)
            cells_j.append(j)
            if variant == "u4" and i == j:
                executed += sum(2 * 2 * (bq - cs * 512) * 512 * d
                                for cs in range(bk // 512))
            else:
                executed += 2 * 2 * bq * bk * d
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, h, len(cells_i)),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b, h, t, im, jm: (b, h, im[t], 0)),
            pl.BlockSpec((1, 1, bk, d), lambda b, h, t, im, jm: (b, h, jm[t], 0)),
            pl.BlockSpec((1, 1, bk, d), lambda b, h, t, im, jm: (b, h, jm[t], 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d),
                               lambda b, h, t, im, jm: (b, h, im[t], 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )
    call = pl.pallas_call(
        make_kernel(variant, bq, bk, nkv),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, seq, d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )
    im = jnp.asarray(cells_i, jnp.int32)
    jm = jnp.asarray(cells_j, jnp.int32)

    def step(qc, k, v, im, jm):
        return chain(qc, call(im, jm, qc, k, v))

    dt = scan_timeit(step, q0, args=(k, v, im, jm), rtt=RTT)
    useful = 4 * b * h * seq * seq * d * 0.5
    print(f"b={b} s={seq} {variant}: {dt*1e3:.3f} ms  "
          f"useful {useful/dt/1e12:.1f}  "
          f"executed {executed*b*h/dt/1e12:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    RTT = measure_rtt()
    print(f"rtt {RTT*1e3:.1f} ms", file=sys.stderr)
    for b, seq in ((8, 2048), (2, 8192)):
        for variant in ("dots", "u1", "u2", "u3", "u4"):
            try:
                run(variant, seq, b)
            except Exception as e:
                print(f"b={b} s={seq} {variant}: FAILED "
                      f"{type(e).__name__}: {e}", flush=True)
