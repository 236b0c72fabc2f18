from .mesh import (  # noqa: F401
    make_mesh, make_mesh_for_batch, make_hybrid_mesh, shard_batch, replicate,
    data_sharding, gather_results)
