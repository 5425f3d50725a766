from .mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    local_batch_size,
)
from .spatial import spatial_sharded_apply
from . import distributed

__all__ = [
    "spatial_sharded_apply",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "local_batch_size",
]
