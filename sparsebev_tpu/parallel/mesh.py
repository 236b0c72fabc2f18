"""Device-mesh data parallelism (the TPU-native replacement for the
reference's NCCL DDP stack — SURVEY.md section 2.6).

One 1-D mesh over all chips with a ``data`` axis: the batch shards over it,
parameters replicate, and jitting the global-batch train step makes XLA
insert the gradient all-reduces the reference got from
MMDistributedDataParallel (train.py:131). Multi-host extends this by calling
``jax.distributed.initialize`` before ``make_mesh`` — the same code then runs
over ICI + DCN.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_for_batch(batch_size: int,
                        devices: Optional[Sequence] = None,
                        axis_name: str = "data") -> Mesh:
    """Mesh over the largest device count that divides ``batch_size`` (a
    global batch must shard evenly)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def make_hybrid_mesh(dp: int, sp: int,
                     devices: Optional[Sequence] = None) -> Mesh:
    """dp x sp mesh: 'data' shards the batch, 'q' shards the query axis
    (parallel/query_parallel.py) through the decoder — hybrid-parallel
    training for when per-chip memory or step latency (the sampling-gather
    wall scales 1/sp) matters more than pure DP throughput."""
    from .query_parallel import QUERY_AXIS
    devices = list(devices if devices is not None else jax.devices())
    if dp * sp > len(devices):
        raise ValueError(f"dp*sp={dp * sp} exceeds {len(devices)} devices")
    arr = np.asarray(devices[:dp * sp]).reshape(dp, sp)
    return Mesh(arr, ("data", QUERY_AXIS))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Place every array in ``batch`` with its leading dim sharded over the
    mesh (replaces DistributedGroupSampler sharding, loaders/builder.py:22-27)."""
    sharding = data_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def gather_results(x: Any) -> Any:
    """Bring sharded eval outputs to host (replaces ``gpu_collect``-style NCCL
    gather, val.py:132): with jit output already global, this is just
    device_get."""
    return jax.tree_util.tree_map(lambda a: np.asarray(jax.device_get(a)), x)
