"""Multi-host serving helpers (single-process degradation paths).

Real DCN behavior needs a pod; these tests pin the deterministic routing,
mesh construction, and stats aggregation logic that every host runs
identically (the design makes the multi-host path coordination-free, so
single-process correctness of these functions is most of the story).
"""

import jax
import numpy as np

from mfa_tpu.serve.multihost import (
    FleetStats,
    aggregate_stats,
    init_distributed,
    make_hybrid_mesh,
    route_requests,
    serving_mesh,
)
from mfa_tpu.shard.mesh import DATA_AXIS, MODEL_AXIS


def test_route_requests_disjoint_and_total():
    ids = list(range(37))
    parts = [route_requests(ids, p, 4) for p in range(4)]
    flat = sorted(x for part in parts for x in part)
    assert flat == ids  # total
    for p in range(4):
        for q in range(p + 1, 4):
            assert not set(parts[p]) & set(parts[q])  # disjoint


def test_serving_mesh_local_model_axis():
    mesh = serving_mesh(4)
    assert mesh.axis_names == (MODEL_AXIS,)
    assert mesh.shape[MODEL_AXIS] == 4
    try:
        serving_mesh(1024)
        assert False, "oversubscribed tp must raise"
    except ValueError:
        pass


def test_hybrid_mesh_single_process_fallback():
    mesh = make_hybrid_mesh({DATA_AXIS: 2}, {MODEL_AXIS: 4})
    assert mesh.axis_names == (DATA_AXIS, MODEL_AXIS)
    assert mesh.shape[DATA_AXIS] == 2 and mesh.shape[MODEL_AXIS] == 4


def test_init_distributed_single_host_noop():
    assert init_distributed() == jax.process_index()


def test_aggregate_stats_single():
    from mfa_tpu.serve.engine import EngineStats

    s = EngineStats(prefill_tokens=10, decode_tokens=20, recoveries=1,
                    wall_s=2.0)
    agg = aggregate_stats(s)
    assert isinstance(agg, FleetStats)
    assert agg.prefill_tokens == 10 and agg.decode_tokens == 20
    assert agg.decode_tokens_per_s == 10.0
