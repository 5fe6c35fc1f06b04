"""Profiler integration (TPU analog of the reference's scripts/run_ncu.sh).

Captures XLA/xplane traces viewable in TensorBoard or Perfetto; the
reference uses Nsight Compute with warp sampling (run_ncu.sh:1-11), which
has no TPU equivalent — kernel-level visibility comes from the trace's
per-op device timeline plus the roofline accounting in utils.timing.
"""

from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mfa_tpu_trace"):
    """Capture a device trace around a block:

        with profiling.trace("/tmp/trace"):
            out = flash_attn_func(q, k, v)
            jax.block_until_ready(out)
    """
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up on the xplane timeline)."""
    return jax.profiler.TraceAnnotation(name)
