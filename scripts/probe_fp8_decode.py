"""Pick the fastest EXACT e4m3->bf16 in-kernel decode on this chip.

Variants (all consume int8-bit pools; DMA path held constant):
  select32  — current fp8_bits_to_bf16 (int32 ops + subnormal select)
  select16  — same logic, int16 intermediates
  uniform   — bitcast16(sign<<8 | (bits&0x7f)<<4) * 2^120 (no select;
              exact iff bf16-subnormal multiply isn't flushed)
  native    — in-kernel bitcast int8->float8 + astype (exact iff Mosaic
              has a real convert; fast iff it's one instruction)

Each variant is (1) exactness-checked on-chip against float8 astype over
all 256 bit patterns (NaNs excluded) and (2) timed in a copy kernel.

Usage: python scripts/probe_fp8_decode.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

sys.path.insert(0, ".")

from mfa_tpu.kernels.quant import fp8_bits_to_bf16  # noqa: E402
from mfa_tpu.utils.timing import chain, measure_rtt, scan_timeit  # noqa: E402

FP8 = jnp.float8_e4m3fn


def _select16(b):
    b16 = b.astype(jnp.int16)
    sign = jnp.left_shift(jnp.bitwise_and(b16, jnp.int16(0x80)), 8)
    norm16 = (sign + jnp.left_shift(jnp.bitwise_and(b16, jnp.int16(0x7F)), 4)
              + jnp.int16(120 << 7))
    normal = jax.lax.bitcast_convert_type(norm16, jnp.bfloat16)
    m = jnp.bitwise_and(b16, jnp.int16(7))
    sgn = jnp.where(b16 < 0, jnp.bfloat16(-(2.0 ** -9)),
                    jnp.bfloat16(2.0 ** -9))
    sub = m.astype(jnp.bfloat16) * sgn
    e_zero = jnp.bitwise_and(b16, jnp.int16(0x78)) == 0
    return jnp.where(e_zero, sub, normal)


def _uniform(b):
    b16 = b.astype(jnp.int16)
    sign = jnp.left_shift(jnp.bitwise_and(b16, jnp.int16(0x80)), 8)
    raw = sign + jnp.left_shift(jnp.bitwise_and(b16, jnp.int16(0x7F)), 4)
    x = jax.lax.bitcast_convert_type(raw, jnp.bfloat16)
    return (x.astype(jnp.float32) * (2.0 ** 120)).astype(jnp.bfloat16)


def _native(b):
    return jax.lax.bitcast_convert_type(b, FP8).astype(jnp.bfloat16)


VARIANTS = [("select32", fp8_bits_to_bf16), ("select16", _select16),
            ("uniform", _uniform), ("native", _native)]


def check_exact():
    bits = jnp.tile(jnp.arange(256, dtype=jnp.uint8).astype(jnp.int8), 4)
    rows = jnp.broadcast_to(bits.reshape(8, 128), (8, 128))
    want = np.asarray(jax.jit(
        lambda x: jax.lax.bitcast_convert_type(x, FP8).astype(jnp.bfloat16)
    )(rows))
    keep = (np.asarray(rows).astype(np.uint8) & 0x7F) != 0x7F
    for name, fn in VARIANTS:
        def kern(x_ref, o_ref, fn=fn):
            o_ref[...] = fn(x_ref[...])

        try:
            got = np.asarray(pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.bfloat16),
            )(rows))
            bad = (got != want) & keep
            print(f"{name}: exact={not bad.any()} "
                  f"(mismatches {int(bad.sum())})", flush=True)
        except Exception as ex:
            print(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:140]}",
                  flush=True)


def bench(rtt):
    rows = 64 * 1024
    x = jnp.ones((rows, 128), jnp.int8)
    for name, fn in VARIANTS + [("int8-astype",
                                 lambda b: b.astype(jnp.bfloat16))]:
        def kern(x_ref, o_ref, fn=fn):
            o_ref[...] = fn(x_ref[...])

        f = pl.pallas_call(
            kern,
            grid=(rows // 512,),
            in_specs=[pl.BlockSpec((512, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((512, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.bfloat16),
        )

        def step(c, x, f=f):
            return chain(c, f(x)[0])

        try:
            t = scan_timeit(step, jnp.zeros((128,), jnp.bfloat16), args=(x,),
                            rtt=rtt)
            print(f"{name}: {t*1e3:.3f} ms ({x.size/t/1e9:.0f} GB/s)",
                  flush=True)
        except Exception as ex:
            print(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:140]}",
                  flush=True)


def main():
    rtt = measure_rtt()
    print(f"rtt ~{rtt*1e3:.1f} ms", flush=True)
    check_exact()
    bench(rtt)


if __name__ == "__main__":
    main()
