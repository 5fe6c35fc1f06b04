"""Multi-host serving: process init, hybrid meshes, request routing.

The reference has no distributed layer at all (SURVEY.md §2.8). The
TPU-native scale-out recipe implemented here:

- WITHIN a host (ICI): tensor parallelism — Engine(mesh=serving_mesh(tp))
  shards params + paged KV by kv head (zero-communication decode).
- ACROSS hosts (DCN): data parallelism at the *engine* level — each host
  runs a full engine replica over its local chips and serves a disjoint
  request subset (requests never share KV, so no cross-host traffic is
  needed in the serving hot loop; DCN latency never touches the token
  loop). `route_requests` makes the partition deterministic so any
  front-end can compute it without coordination.
- For TRAINING across hosts, `make_hybrid_mesh` builds the standard
  DCN-outer x ICI-inner device mesh for pjit/GSPMD (data axis on DCN,
  model axes on ICI), following the scaling-book recipe.

All helpers degrade gracefully to single-process so the same code runs in
tests (8-device virtual CPU mesh) and on real pods.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Mapping, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from mfa_tpu.shard.mesh import DATA_AXIS, MODEL_AXIS


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Initialize jax.distributed from args or environment (JAX_COORDINATOR
    etc.); a no-op when the runtime is already initialized or single-host.
    Returns the process index.

    NOTE: must be called BEFORE anything touches a jax backend — even
    jax.process_count() initializes it, after which distributed.initialize
    cannot take effect (that was a latent bug here: the old guard queried
    process_count() first and silently froze every run single-process)."""
    if coordinator_address is None and num_processes is None:
        return jax.process_index()  # single host, nothing to do
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # Swallow ONLY the benign re-init case. A blanket pass here would
        # eat real failures (wrong coordinator address, backend already
        # touched) and silently degrade every host to its own
        # single-process fleet.
        if "already" not in str(e).lower():
            raise
    return jax.process_index()


def serving_mesh(tp: Optional[int] = None) -> Mesh:
    """Model-only mesh over THIS host's local chips for TP serving.

    Serving meshes deliberately stay within one host: decode attention and
    the model matmul all-reduce ride ICI only; DCN never enters the token
    loop. tp defaults to all local devices."""
    local = jax.local_devices()
    tp = tp or len(local)
    if tp > len(local):
        raise ValueError(
            f"tp={tp} exceeds {len(local)} local devices — cross-host TP "
            "would put DCN in the decode loop; use engine replicas instead"
        )
    return Mesh(np.array(local[:tp]), (MODEL_AXIS,))


def make_hybrid_mesh(dcn_axes: Mapping[str, int],
                     ici_axes: Mapping[str, int]) -> Mesh:
    """DCN-outer x ICI-inner mesh for multi-host training (pjit/GSPMD).

    Example: make_hybrid_mesh({"data": 2}, {"model": 4}) on 2 hosts x 4
    chips. Falls back to a plain reshape in single-process runs (tests)."""
    names = tuple(dcn_axes.keys()) + tuple(ici_axes.keys())
    sizes = tuple(dcn_axes.values()) + tuple(ici_axes.values())
    if jax.process_count() > 1:
        from jax.experimental import mesh_utils

        try:
            devices = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=tuple(ici_axes.values()),
                dcn_mesh_shape=tuple(dcn_axes.values()),
            )
            return Mesh(devices.reshape(sizes), names)
        except ValueError:
            # Non-TPU multi-process (CPU pods, tests): devices carry no
            # slice_index, so group by process instead — process-major
            # ordering keeps DCN axes outermost.
            devs = sorted(jax.devices(),
                          key=lambda d: (d.process_index, d.id))
            return Mesh(np.array(devs).reshape(sizes), names)
    devices = jax.devices()
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f"mesh {dict(zip(names, sizes))} needs {total} "
                         f"devices, got {len(devices)}")
    return Mesh(np.array(devices[:total]).reshape(sizes), names)


def route_requests(request_ids: Sequence[int], process_index: int,
                   process_count: int) -> List[int]:
    """Deterministic disjoint partition of a request stream across engine
    replicas (uid mod hosts). Every host — and any front-end — computes the
    same assignment with zero coordination traffic."""
    return [r for r in request_ids if r % process_count == process_index]


@dataclasses.dataclass
class FleetStats:
    """Aggregated engine stats across hosts."""

    prefill_tokens: int
    decode_tokens: int
    recoveries: int
    wall_s: float

    @property
    def decode_tokens_per_s(self) -> float:
        return self.decode_tokens / self.wall_s if self.wall_s else 0.0


def aggregate_stats(stats) -> FleetStats:
    """Sum EngineStats across processes (max of wall clocks). Uses a DCN
    allgather when distributed; identity on one host."""
    local = np.asarray(
        [stats.prefill_tokens, stats.decode_tokens, stats.recoveries,
         stats.wall_s],
        np.float64,
    )
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        gathered = np.asarray(multihost_utils.process_allgather(local))
    else:
        gathered = local[None]
    return FleetStats(
        prefill_tokens=int(gathered[:, 0].sum()),
        decode_tokens=int(gathered[:, 1].sum()),
        recoveries=int(gathered[:, 2].sum()),
        wall_s=float(gathered[:, 3].max()),
    )
