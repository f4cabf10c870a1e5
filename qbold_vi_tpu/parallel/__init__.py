from . import mesh
from .mesh import (DATA_AXIS, batch_sharding, host_local_rows,
                   initialize_distributed, make_mesh, replicate,
                   replicated_sharding, shard_batch, shard_batch_local)

__all__ = [
    "mesh",
    "DATA_AXIS",
    "batch_sharding",
    "host_local_rows",
    "initialize_distributed",
    "make_mesh",
    "replicate",
    "replicated_sharding",
    "shard_batch",
    "shard_batch_local",
]
