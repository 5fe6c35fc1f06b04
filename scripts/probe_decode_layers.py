"""Marginal per-layer cost of the decode step (fixed vs per-layer split).

probe_decode_step measured 4.34 ms/step at 4L/dim4096/b16/int8 vs a 2.77 ms
weight roofline. Timing layers=2/4/8 separates the fixed per-step cost
(embed, lm_head, sampling, dispatch) from the marginal per-layer cost, and
an ffn-halved variant tests whether the marginal cost tracks weight bytes
(bandwidth-bound, good) or op count (overhead-bound, bad).

Usage: python scripts/probe_decode_layers.py
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from scripts.probe_decode_step import build, time_burst  # noqa: E402
from mfa_tpu.utils.timing import measure_rtt  # noqa: E402


def main():
    rtt = measure_rtt()
    print(f"rtt ~{rtt*1e3:.1f} ms", flush=True)
    base = dict(dim=4096, heads=32, kv_heads=8, ffn=14336,
                vocab=32000, batch=16, quant="int8")
    variants = [
        ("L2", dict(base, layers=2)),
        ("L4", dict(base, layers=4)),
        ("L8", dict(base, layers=8)),
        ("L4 ffn/2", dict(base, layers=4, ffn=7168)),
    ]
    for name, kw in variants:
        batch = kw.pop("batch")
        cfg, params, cache = build(batch=batch, **kw)
        dt = time_burst(cfg, params, cache, batch, rtt)
        wbytes = sum(x.size * x.dtype.itemsize
                     for x in jax.tree.leaves(params))
        print(f"{name}: {dt*1e3:.3f} ms/step (roofline "
              f"{wbytes/819e9*1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
