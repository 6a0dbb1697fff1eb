from . import distributed
from .mesh import batch_sharding, make_mesh, shard_batch, transform_batch_sharded

__all__ = [
    "batch_sharding",
    "distributed",
    "make_mesh",
    "shard_batch",
    "transform_batch_sharded",
]
