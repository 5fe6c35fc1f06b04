"""MoE expert-bank int8 streaming at decode shapes (VERDICT r4 next #5).

The shipped path (wquant.ragged_qmm) dequantizes int8 expert banks to
bf16 at entry because lax.ragged_dot needs matching operand dtypes —
capacity-only win, and it re-materializes the bf16 bank every step.

Candidates at the Mixtral-shaped decode step (E=8, d=4096, ffn=14336,
T = batch*top_k = 32 expert-token rows):

  A  bf16 bank + ragged_dot            (no weight quant at all)
  B  int8 bank, dequantize-at-entry + ragged_dot   (shipped)
  D  int8 bank, DENSE per-expert masked compute: every expert runs all
     T rows through the fused int8 qmm (x @ qw[e] * scale[e]) and the
     router mask selects rows after. At decode T the extra flops are
     noise next to the bank stream, XLA keeps the int8->bf16 convert
     fused into the dot operand stream (HBM reads stay int8), and the
     bank is read ONCE per step.

All three are timed as the full gate/up/down SwiGLU triple inside one
scan (iters>=48). Roofline floor: 3 banks of int8 = 1.41 GB -> 1.72 ms
at 819 GB/s; bf16 doubles that.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_moe_int8.py
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from mfa_tpu.models.wquant import quantize_weight  # noqa: E402
from mfa_tpu.utils.timing import chain, measure_rtt, scan_timeit  # noqa: E402

E, D, F, T = 8, 4096, 14336, 32


def main():
    rtt = measure_rtt()
    print(f"rtt {rtt*1e3:.1f} ms", flush=True)
    ks = jax.random.split(jax.random.key(0), 4)
    wg = jax.random.normal(ks[0], (E, D, F), jnp.bfloat16) * 0.02
    wu = jax.random.normal(ks[1], (E, D, F), jnp.bfloat16) * 0.02
    wd = jax.random.normal(ks[2], (E, F, D), jnp.bfloat16) * 0.02
    qg, qu, qd = (quantize_weight(w, axis=-2) for w in (wg, wu, wd))
    x0 = jax.random.normal(ks[3], (T, D), jnp.bfloat16)
    # balanced routing for the ragged paths
    gs = jnp.full((E,), T // E, jnp.int32)
    bank_int8 = 3 * E * D * F
    floor_ms = bank_int8 / 819e9 * 1e3
    print(f"int8 bank stream floor: {floor_ms:.2f} ms "
          f"(bf16 {2*floor_ms:.2f} ms)", flush=True)

    def swiglu_ragged(x, wg, wu, wd):
        g = jax.nn.silu(jax.lax.ragged_dot(x, wg, gs))
        u = jax.lax.ragged_dot(x, wu, gs)
        return jax.lax.ragged_dot(g * u, wd, gs)

    def run(label, step, args):
        dt = scan_timeit(lambda x, *a: chain(x, step(x, *a)), x0,
                         args=args, rtt=rtt, iters=48)
        print(f"{label}: {dt*1e3:.3f} ms ({floor_ms/dt/1e3*100:.0f}% of "
              f"int8 floor)", flush=True)
        return dt

    run("A bf16 ragged_dot        ",
        lambda x, a, b, c: swiglu_ragged(x, a, b, c), (wg, wu, wd))

    def b_step(x, qg, qu, qd):
        from mfa_tpu.models.wquant import dequantize_weight
        return swiglu_ragged(x, dequantize_weight(qg, x.dtype),
                             dequantize_weight(qu, x.dtype),
                             dequantize_weight(qd, x.dtype))

    run("B int8 dequant-at-entry  ", b_step, (qg, qu, qd))

    def d_step(x, qg, qu, qd):
        # dense per-expert: [E, T, F] = x @ qw[e]; scale applies to the
        # small output; selection happens in the caller (here: sum over
        # a one-hot mask to keep the data dependence honest)
        g = jnp.einsum("td,edf->etf", x, qg.qw.astype(x.dtype))
        g = jax.nn.silu(g * qg.scale[:, None, :].astype(x.dtype))
        u = jnp.einsum("td,edf->etf", x, qu.qw.astype(x.dtype))
        u = u * qu.scale[:, None, :].astype(x.dtype)
        h = g * u
        o = jnp.einsum("etf,efd->etd", h, qd.qw.astype(x.dtype))
        o = o * qd.scale[:, None, :].astype(x.dtype)
        # balanced one-hot routing mask [E, T]
        m = (jnp.arange(T)[None, :] // (T // E)
             == jnp.arange(E)[:, None]).astype(x.dtype)
        return jnp.einsum("etd,et->td", o, m)

    run("D int8 dense-per-expert  ", d_step, (qg, qu, qd))


if __name__ == "__main__":
    main()
