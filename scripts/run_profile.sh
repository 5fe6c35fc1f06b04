#!/usr/bin/env bash
# Kernel-level profiling driver (reference: scripts/run_ncu.sh — Nsight
# Compute has no TPU analog; the TPU equivalent is a jax.profiler trace,
# viewable in TensorBoard's profile plugin or Perfetto).
#
# Usage: scripts/run_profile.sh [prefill|decode] [extra benchmark args...]
set -euo pipefail
cd "$(dirname "$0")/.."

KIND="${1:-prefill}"
shift || true
OUT="/tmp/mfa_tpu_trace_${KIND}"
rm -rf "$OUT"

python "benchmark/${KIND}.py" --trace "$OUT" "$@"
echo "open with: tensorboard --logdir ${OUT}  (Profile tab)"
