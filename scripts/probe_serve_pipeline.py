"""A/B the pipelined serving loop vs the synchronous burst loop on chip.

Both arms run in ONE process (serve tok/s comparisons are only valid
within a session — CLAUDE.md drift note), same engine shapes as the
bench headline. Expectation: pipelining hides the per-burst host RTT
(~30-50 ms through the tunnel), which is roughly half the serve decode
wall time at burst=16.

Usage: python scripts/probe_serve_pipeline.py [--layers 4]
"""
import argparse
import sys

sys.path.insert(0, ".")

from benchmark.serve import run_serve  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--gen", type=int, default=128)
    ap.add_argument("--burst", type=int, default=16)
    args = ap.parse_args()

    for name, pipe in (("sync", False), ("pipelined", True),
                       ("sync2", False), ("pipelined2", True)):
        res = run_serve(layers=args.layers, batch=16, prompt_len=256,
                        gen=args.gen, quant="int8", burst=args.burst,
                        pipeline=pipe)
        print(f"{name}: decode {res['decode_tps']:.0f} tok/s, "
              f"prefill {res['prefill_tps']:.0f} tok/s, "
              f"per-layer step {res['per_layer_ms']:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
