"""Device-mesh construction helpers.

The reference has no distributed layer at all (SURVEY.md §2.8); the
TPU-native communication backend is XLA collectives over ICI/DCN driven by
`jax.sharding.Mesh` + `shard_map`. Conventions used across mfa_tpu:

- axis "data":  batch / continuous-batching parallelism (DP). Maps to DCN
  across hosts and ICI within a host — per-sequence work never crosses it.
- axis "model": KV-head tensor parallelism (TP) for attention; also the
  all-reduce axis for o-proj/MLP partials in the model layer.
- axis "ctx":   KV-sequence context parallelism (CP) for long-KV decode,
  combined with the same LSE algebra as split-KV (SURVEY.md §2.8).
- axis "expert": expert parallelism (EP) for MoE layers — the expert bank
  is sharded across the axis, routing is computed replicated, and each
  shard runs grouped matmuls for its local experts only
  (mfa_tpu/shard/expert.py).
- axis "pipe":  pipeline parallelism (PP) — contiguous layer blocks per
  stage, GPipe microbatch schedule as one lax.scan with ppermute
  activation rotation (mfa_tpu/shard/pipeline.py).
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
CTX_AXIS = "ctx"
EXPERT_AXIS = "expert"


def make_mesh(
    axis_sizes: Optional[Mapping[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a named mesh. Default: all devices on the "data" axis.

    Example: make_mesh({"data": 2, "model": 4}).
    """
    devices = list(devices if devices is not None else jax.devices())
    if not axis_sizes:
        axis_sizes = {DATA_AXIS: len(devices)}
    names = tuple(axis_sizes.keys())
    sizes = tuple(int(s) for s in axis_sizes.values())
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(
            f"mesh {dict(axis_sizes)} needs {total} devices, got {len(devices)}"
        )
    arr = np.array(devices[:total]).reshape(sizes)
    return Mesh(arr, names)


def sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
