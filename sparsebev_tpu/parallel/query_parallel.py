"""Query-sharded (tensor-parallel) inference over a device mesh.

The TPU-native way past the decoder's sampling-gather wall (~14-17 ns per
gather index on one chip, flat in everything — see docs/ROADMAP.md): the
2.76M gather indices per sample are per-QUERY independent, so sharding the
query axis over chips divides the gather time by the mesh size. The only
cross-query computation is scale-adaptive self-attention, whose per-layer
collectives are tiny ([B, Q, 2] box centers + [B, heads, Q, head_dim]
attention keys/values — ~1 MB over ICI at r50 scale).

No model changes are needed: constraining the head outputs to a
``P(None, None, "q")`` sharding makes GSPMD propagate the partition through
the whole decoder. Verified on a virtual CPU mesh (tests/test_query_parallel
.py): the per-level sampling gathers compile to K/n_devices-row gathers per
device and outputs equal the single-device forward.

This addresses single-sample LATENCY (the streaming FPS metric). For
throughput over many samples, plain data parallelism (parallel/mesh.py,
evaluation/offline eval) is the better fit — use query sharding when one
stream must run faster than a single chip allows.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


QUERY_AXIS = "q"


def query_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for head outputs [num_layers, B, Q, D]: Q over the mesh."""
    return NamedSharding(mesh, P(None, None, QUERY_AXIS))


def constrain_preds(preds: dict, mesh: Optional[Mesh]) -> dict:
    """Pin every [L, B, Q, D] prediction tensor to the query sharding —
    GSPMD back-propagates the partition through the decoder. No-op when
    ``mesh`` is None or single-device."""
    if mesh is None or mesh.size == 1:
        return preds
    qs = query_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, qs), preds)
