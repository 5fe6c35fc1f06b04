"""Probe: resident-KV causal prefill with the BOUND softmax (max-free).

probe_resident.py measured the resident-KV design SLOWER than the
triangular-grid monolith — but that variant carried the online m/l chain,
which serializes every inner step through the VPU. The bound softmax
(prefill.py:_bound_body) removes the cross-block dependency entirely:
each kv block contributes an independent `acc += exp2(s*c - bound) @ V`,
so the inner loop is pure accumulate and the MXU can pipeline freely.

Variants (all exact on random normal inputs; l-underflow impossible here):
  base   current prefill_attention default (bound + triangular grid)
  res    grid (b, h, nq); K/V resident [sk, d] in VMEM; fori over full kv
         blocks at BKI granularity + one masked diag block of bq
  res_d  res, but the diag block is sub-tiled at DSUB with trace-time
         skipping of dead upper-triangle sub-tiles (waste bq/2 -> DSUB/2
         per row, with no per-grid-cell overhead since it is all inside
         one cell)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_bound_resident.py
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mfa_tpu.utils.timing import chain, measure_rtt, scan_timeit

LOG2E = 1.4426950408889634
MASK = -1e30


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _pv(p, v):
    return jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def make_kernel(bq, bk, bki, d, scale, dsub):
    c = scale * LOG2E

    def kernel(q_ref, k_ref, v_ref, maxk_ref, o_ref):
        i = pl.program_id(2)
        q = q_ref[0, 0]  # [bq, d]
        qf = q.astype(jnp.float32)
        qn = jnp.sqrt(jnp.sum(qf * qf, axis=1, keepdims=True))
        bc = qn * maxk_ref[0, 0, :1, :1] * c  # [bq, 1], exp2 domain

        def body(j, carry):
            l, acc = carry
            ksl = pl.ds(j * bki, bki)
            s = _dot(q, k_ref[0, 0, ksl])
            p = jnp.exp2(s * c - bc)
            l = l + jnp.sum(p, axis=1, keepdims=True)
            return l, acc + _pv(p, v_ref[0, 0, ksl])

        nfull = (i * bq) // bki  # kv blocks fully below the diagonal
        l0 = jnp.zeros((bq, 1), jnp.float32)
        acc0 = jnp.zeros((bq, d), jnp.float32)
        l, acc = jax.lax.fori_loop(0, nfull, body, (l0, acc0))

        # diagonal block: rows [i*bq, (i+1)*bq) x cols [i*bq, (i+1)*bq)
        if dsub == 0:
            ksl = pl.ds(i * (bq // bki) * bki, bq)
            s = _dot(q, k_ref[0, 0, ksl])
            row = jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (1, bq), 1)
            s = jnp.where(col <= row, s, MASK)
            p = jnp.exp2(s * c - bc)
            l = l + jnp.sum(p, axis=1, keepdims=True)
            acc = acc + _pv(p, v_ref[0, 0, ksl])
        else:
            nsub = bq // dsub
            lt, at = [], []
            for qi in range(nsub):
                qsl = slice(qi * dsub, (qi + 1) * dsub)
                qs = q[qsl]
                bcs = bc[qsl]
                ls = jnp.zeros((dsub, 1), jnp.float32)
                as_ = jnp.zeros((dsub, d), jnp.float32)
                for kj in range(qi + 1):

                    def kidx(kj=kj):
                        return pl.ds(i * bq + kj * dsub, dsub)

                    s = _dot(qs, k_ref[0, 0, kidx()])
                    if kj == qi:
                        row = jax.lax.broadcasted_iota(jnp.int32, (dsub, 1), 0)
                        col = jax.lax.broadcasted_iota(jnp.int32, (1, dsub), 1)
                        s = jnp.where(col <= row, s, MASK)
                    p = jnp.exp2(s * c - bcs)
                    ls = ls + jnp.sum(p, axis=1, keepdims=True)
                    as_ = as_ + _pv(p, v_ref[0, 0, kidx()])
                lt.append(ls)
                at.append(as_)
            l = l + jnp.concatenate(lt, axis=0)
            acc = acc + jnp.concatenate(at, axis=0)

        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc / l_safe).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("bq", "bki", "dsub", "interpret"))
def resident_prefill(q, k, v, bq=1024, bki=1024, dsub=0, interpret=False):
    b, h, s, d = q.shape
    scale = d ** -0.5
    kf = k.astype(jnp.float32)
    maxk = jnp.max(jnp.sqrt(jnp.sum(kf * kf, axis=-1)), axis=-1)  # [b,h]
    maxk_in = jnp.broadcast_to(maxk[:, :, None, None], (b, h, 8, 128))
    nq = s // bq
    kern = make_kernel(bq, bq, bki, d, scale, dsub)
    return pl.pallas_call(
        kern,
        grid=(b, h, nq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, s, d), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 8, 128), lambda b, h, i: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b, h, i: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * b * h * s * s * d * 0.5),
            bytes_accessed=int(q.size * 2 * 2 + k.size * 2 * 2),
            transcendentals=int(b * h * s * s * 0.5),
        ),
        interpret=interpret,
    )(q, k, v, maxk_in)


def main():
    from mfa_tpu.kernels.prefill import prefill_attention

    rtt = measure_rtt()
    print(f"rtt {rtt*1e3:.1f} ms", file=sys.stderr)
    for seq in (1024, 2048, 4096, 8192):
        batch = 16384 // seq
        heads, d = 24, 128
        q0 = jax.random.normal(jax.random.key(0), (batch, heads, seq, d),
                               jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (batch, heads, seq, d),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), (batch, heads, seq, d),
                              jnp.bfloat16)
        flops = 4 * batch * heads * seq * seq * d * 0.5

        # correctness spot-check vs the shipping kernel
        ref = prefill_attention(q0[:1, :2], k[:1, :2], v[:1, :2], causal=True)
        got = resident_prefill(q0[:1, :2], k[:1, :2], v[:1, :2],
                               bq=min(1024, seq))
        err = jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))
        print(f"s={seq}: max|res - base| = {float(err):.5f}", flush=True)

        def base(q, k, v):
            return chain(q, prefill_attention(q, k, v, causal=True))

        dt = scan_timeit(base, q0, args=(k, v), rtt=rtt)
        print(f"s={seq} base: {dt*1e3:.3f} ms, {flops/dt/1e12:.1f} TFLOP/s",
              flush=True)
        for bki in (512, 1024):
            for dsub in (0, 256, 512):
                bq = min(1024, seq)
                if dsub >= bq:
                    continue

                def res(q, k, v, bki=bki, dsub=dsub, bq=bq):
                    return chain(q, resident_prefill(q, k, v, bq=bq, bki=bki,
                                                     dsub=dsub))

                try:
                    dt = scan_timeit(res, q0, args=(k, v), rtt=rtt)
                    print(f"s={seq} res bki={bki} dsub={dsub}: {dt*1e3:.3f} ms, "
                          f"{flops/dt/1e12:.1f} TFLOP/s", flush=True)
                except Exception as e:
                    print(f"s={seq} res bki={bki} dsub={dsub}: FAILED "
                          f"{type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
