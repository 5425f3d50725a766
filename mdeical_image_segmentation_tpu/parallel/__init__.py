from .mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    local_batch_size,
)
from .spatial import make_spatial_train_step, spatial_sharded_apply
from . import distributed

__all__ = [
    "make_spatial_train_step",
    "spatial_sharded_apply",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "local_batch_size",
]
