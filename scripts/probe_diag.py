"""Probe kernel variants for the causal diagonal cell (perf experiment).

Shape: s=1024 single 1024x1024 diagonal cell per (b,h); b=8, h=24 -> 192
cells. Useful FLOPs = half the tile. Variants:
  v0 monolith, iota+where mask (current)
  v1 monolith, precomputed 0/1 mask plane: max over FULL row (exact —
     softmax is m-invariant), p *= mask after exp2
  v2 strip-512: per 512-row slab, one full-width dot, mask plane on tail
  v3 subtile-512 dots-first: all QK dots, then all updates (tests whether
     Mosaic overlaps independent MXU/VPU work)
  v4 strip-256 with mask plane
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mfa_tpu.utils.timing import chain, measure_rtt, scan_timeit

C = 0.08838834764831845 * 1.4426950408889634  # scale(d=128) * log2e
MASK = -1e30


def _update(m_scr, l_scr, acc_scr, qsl, s, v, pmask=None):
    m_prev = m_scr[qsl, :]
    l_prev = l_scr[qsl, :]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2((m_prev - m_next) * C)
    p = jnp.exp2(s * C - m_next[:, :1] * C)
    if pmask is not None:
        p = p * pmask
    l_scr[qsl, :] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_scr[qsl, :] = m_next
    pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_scr[qsl, :] = acc_scr[qsl, :] * alpha[:, :1] + pv


def _store(o_ref, m_scr, l_scr, acc_scr):
    l = l_scr[:, :1]
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)


def _dot(q, k):
    return jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def kernel_v0(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, bq):
    m_scr[...] = jnp.full_like(m_scr, MASK)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)
    s = _dot(q_ref[0, 0], k_ref[0, 0])
    row = jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, bq), 1)
    s = jnp.where(col <= row, s, MASK)
    _update(m_scr, l_scr, acc_scr, slice(None), s, v_ref[0, 0])
    _store(o_ref, m_scr, l_scr, acc_scr)


def kernel_v1(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, mask_scr,
              *, bq):
    m_scr[...] = jnp.full_like(m_scr, MASK)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)
    row = jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, bq), 1)
    mask_scr[...] = (col <= row).astype(jnp.float32)
    s = _dot(q_ref[0, 0], k_ref[0, 0])
    _update(m_scr, l_scr, acc_scr, slice(None), s, v_ref[0, 0],
            pmask=mask_scr[...])
    _store(o_ref, m_scr, l_scr, acc_scr)


def kernel_v2(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, mask_scr,
              *, bq, sub):
    m_scr[...] = jnp.full_like(m_scr, MASK)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)
    row = jax.lax.broadcasted_iota(jnp.int32, (sub, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, sub), 1)
    mask_scr[...] = (col <= row).astype(jnp.float32)
    for qi in range(bq // sub):
        qsl = slice(qi * sub, (qi + 1) * sub)
        w = (qi + 1) * sub
        s = _dot(q_ref[0, 0, qsl], k_ref[0, 0, :w])
        # rect part unmasked; diagonal tail masked via plane multiply
        if qi == 0:
            _update(m_scr, l_scr, acc_scr, qsl, s, v_ref[0, 0, :w],
                    pmask=mask_scr[...])
        else:
            pm = jnp.concatenate(
                [jnp.ones((sub, qi * sub), jnp.float32), mask_scr[...]],
                axis=1)
            _update(m_scr, l_scr, acc_scr, qsl, s, v_ref[0, 0, :w], pmask=pm)
    _store(o_ref, m_scr, l_scr, acc_scr)


def kernel_v3(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, mask_scr,
              *, bq, sub):
    m_scr[...] = jnp.full_like(m_scr, MASK)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)
    row = jax.lax.broadcasted_iota(jnp.int32, (sub, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, sub), 1)
    mask_scr[...] = (col <= row).astype(jnp.float32)
    dots = []
    for qi in range(bq // sub):
        qsl = slice(qi * sub, (qi + 1) * sub)
        for kj in range(qi + 1):
            ksl = slice(kj * sub, (kj + 1) * sub)
            dots.append((qsl, ksl, _dot(q_ref[0, 0, qsl], k_ref[0, 0, ksl]),
                         kj == qi))
    for qsl, ksl, s, diag in dots:
        _update(m_scr, l_scr, acc_scr, qsl, s, v_ref[0, 0, ksl],
                pmask=mask_scr[...] if diag else None)
    _store(o_ref, m_scr, l_scr, acc_scr)


def run(name, kernel, bq, extra_mask=None, d=128, b=8, h=24):
    q0 = jax.random.normal(jax.random.key(0), (b, h, bq, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, h, bq, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, h, bq, d), jnp.bfloat16)
    scratch = [
        pltpu.VMEM((bq, 128), jnp.float32),
        pltpu.VMEM((bq, 128), jnp.float32),
        pltpu.VMEM((bq, d), jnp.float32),
    ]
    if extra_mask:
        scratch.append(pltpu.VMEM(extra_mask, jnp.float32))
    call = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[pl.BlockSpec((1, 1, bq, d), lambda b, h: (b, h, 0, 0))] * 3,
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, bq, d), jnp.bfloat16),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )

    def step(q, k, v):
        return chain(q, call(q, k, v))

    dt = scan_timeit(step, q0, args=(k, v), rtt=RTT)
    useful = 4 * b * h * bq * bq * d * 0.5
    raw = 4 * b * h * bq * bq * d
    print(f"{name}: {dt*1e3:.3f} ms  useful {useful/dt/1e12:.1f} "
          f"raw-if-full {raw/dt/1e12:.1f} TFLOP/s", flush=True)
    # correctness vs v0 output on one sample
    return call(q0, k, v)


if __name__ == "__main__":
    RTT = measure_rtt()
    print(f"rtt {RTT*1e3:.1f} ms", file=sys.stderr)
    bq = 1024
    o0 = run("v0 monolith where-mask   ", functools.partial(kernel_v0, bq=bq), bq)
    o1 = run("v1 monolith mask-plane   ", functools.partial(kernel_v1, bq=bq), bq,
             extra_mask=(bq, bq))
    o2 = run("v2 strip-512 mask-plane  ", functools.partial(kernel_v2, bq=bq, sub=512), bq,
             extra_mask=(512, 512))
    o2b = run("v2 strip-256 mask-plane  ", functools.partial(kernel_v2, bq=bq, sub=256), bq,
              extra_mask=(256, 256))
    o3 = run("v3 sub-512 dots-first    ", functools.partial(kernel_v3, bq=bq, sub=512), bq,
             extra_mask=(512, 512))
    o3b = run("v3 sub-256 dots-first    ", functools.partial(kernel_v3, bq=bq, sub=256), bq,
              extra_mask=(256, 256))
    for nm, o in [("v1", o1), ("v2", o2), ("v2b", o2b), ("v3", o3), ("v3b", o3b)]:
        print(f"{nm} maxdiff vs v0: {float(jnp.abs(o.astype(jnp.float32) - o0.astype(jnp.float32)).max()):.2e}")
