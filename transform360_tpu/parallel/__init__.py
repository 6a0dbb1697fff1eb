from . import distributed
from .latency import band_plans, transform_frame_banded
from .mesh import batch_sharding, make_mesh, shard_batch, transform_batch_sharded

__all__ = [
    "band_plans",
    "batch_sharding",
    "distributed",
    "make_mesh",
    "shard_batch",
    "transform_batch_sharded",
    "transform_frame_banded",
]
