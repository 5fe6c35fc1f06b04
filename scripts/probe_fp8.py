"""Locate the fp8 paged-decode slowdown (captured: 8.2% roofline vs int8's
92%). Suspects: (a) fp8->bf16 astype lowering on a chip without native
fp8, (b) Mosaic DMA/layout of 1-byte float8 arrays in BlockSpecs,
(c) something else in the kernel. Times plain XLA conversions and a
minimal Pallas copy kernel on both dtypes, plus a bit-decode variant
(int8-bits pool + manual e4m3->bf16 arithmetic).

Usage: python scripts/probe_fp8.py
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, ".")

from mfa_tpu.utils.timing import chain, measure_rtt, scan_timeit  # noqa: E402

FP8 = jnp.float8_e4m3fn
SHAPE = (8, 64, 128, 128)  # ~8.4 MB of payload


def probe_astype(rtt):
    for name, dt in (("int8", jnp.int8), ("fp8", FP8)):
        if dt == jnp.int8:
            x = jnp.ones(SHAPE, dt)
        else:
            x = jnp.ones(SHAPE, jnp.float32).astype(dt)

        def step(c, x):
            y = x.astype(jnp.bfloat16)
            return chain(c, y.sum(axis=(0, 1, 2)))

        t = scan_timeit(step, jnp.zeros((128,), jnp.float32), args=(x,),
                        rtt=rtt)
        gbs = x.size / t / 1e9
        print(f"XLA astype {name}->bf16: {t*1e3:.3f} ms ({gbs:.0f} GB/s)",
              flush=True)


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...].astype(jnp.bfloat16)


def _bits_kernel(x_ref, o_ref):
    bits = x_ref[...].astype(jnp.int32)
    s = jnp.where(bits < 0, -1.0, 1.0).astype(jnp.float32)
    e = jnp.right_shift(jnp.bitwise_and(bits, 0x78), 3)
    m = jnp.bitwise_and(bits, 0x7)
    norm16 = (
        jnp.where(bits < 0, 1 << 15, 0)
        + jnp.left_shift(e + 120, 7)
        + jnp.left_shift(m, 4)
    ).astype(jnp.uint16)
    normal = jax.lax.bitcast_convert_type(norm16, jnp.bfloat16)
    sub = (s * m.astype(jnp.float32) * (2.0 ** -9)).astype(jnp.bfloat16)
    o_ref[...] = jnp.where(e == 0, sub, normal)


def probe_pallas(rtt):
    rows = SHAPE[0] * SHAPE[1] * SHAPE[2]
    for name, dt, kern in (("int8", jnp.int8, _copy_kernel),
                           ("fp8", FP8, _copy_kernel),
                           ("fp8-bits(int8)", jnp.int8, _bits_kernel)):
        if dt == jnp.int8:
            x = jnp.ones((rows, 128), dt)
        else:
            x = jnp.ones((rows, 128), jnp.float32).astype(dt)
        fn = pl.pallas_call(
            kern,
            grid=(rows // 512,),
            in_specs=[pl.BlockSpec((512, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((512, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.bfloat16),
        )

        def step(c, x, fn=fn):
            y = fn(x)
            return chain(c, y[0])

        try:
            t = scan_timeit(step, jnp.zeros((128,), jnp.bfloat16), args=(x,),
                            rtt=rtt)
            gbs = x.size / t / 1e9
            print(f"pallas copy+cast {name}: {t*1e3:.3f} ms ({gbs:.0f} GB/s)",
                  flush=True)
        except Exception as ex:
            print(f"pallas copy+cast {name}: FAILED "
                  f"{type(ex).__name__}: {str(ex)[:160]}", flush=True)


def probe_paged(rtt):
    from mfa_tpu.kernels.paged import paged_attention
    from mfa_tpu.kernels.quant import quantize_rows

    batch, heads, kv_heads, d, kv_len, page = 24, 32, 8, 128, 8192, 128
    pps = kv_len // page
    num_pages = batch * pps + 1
    q0 = jax.random.normal(jax.random.key(0), (batch, heads, d), jnp.bfloat16)
    kf = jax.random.normal(jax.random.key(1), (kv_heads, num_pages, page, d))
    vf = jax.random.normal(jax.random.key(2), (kv_heads, num_pages, page, d))
    table = jnp.arange(1, batch * pps + 1, dtype=jnp.int32).reshape(batch, pps)
    lens = jnp.full((batch,), kv_len, jnp.int32)
    for quant in ("int8", "fp8"):
        kq, ks = quantize_rows(kf, quant)
        vq, vs = quantize_rows(vf, quant)

        def step(q, kq, vq, lens, table, ks, vs):
            out = paged_attention(q, kq, vq, lens, table,
                                  k_scales=ks, v_scales=vs)
            return chain(q, out)

        t = scan_timeit(step, q0, args=(kq, vq, lens, table, ks, vs),
                        rtt=rtt)
        print(f"paged_attention {quant}: {t*1e3:.3f} ms", flush=True)


def main():
    rtt = measure_rtt()
    print(f"rtt ~{rtt*1e3:.1f} ms", flush=True)
    probe_astype(rtt)
    probe_pallas(rtt)
    probe_paged(rtt)


if __name__ == "__main__":
    main()
