"""Batch-parallel execution over a TPU device mesh.

The reference's only parallelism is a pthread per prefilter segment within
one frame (``VideoFrameTransform.cpp:592-604``).  Frames are embarrassingly
parallel, so the TPU-native strategy (SURVEY §5) is a 1-D data-parallel mesh
over the frame-batch axis: shard ``[B, H, W]`` planes on ``B``, and every
pipeline stage — prefilter shifts, remap gathers (shared indices, per-lane
data), INTER_AREA matmuls — stays device-local.  No collectives appear in
the math path; input scatter / output gather are the only transfers.
Multi-host scale-out over DCN is the same sharding with a global mesh
(:mod:`.distributed`), verified byte-identical to single-process by
``tests/test_multihost.py`` (2 processes x 4 virtual CPU devices).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pipeline import transform_batch
from ..plan import TransformPlan

BATCH_AXIS = "batch"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (BATCH_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [B, H, W] planes: batch split across the mesh."""
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *planes):
    """Place [B, H, W] planes with the batch axis sharded over the mesh.

    B must be divisible by the mesh size (pad the final partial batch).
    """
    s = batch_sharding(mesh)
    out = tuple(jax.device_put(np.asarray(p), s) for p in planes)
    return out if len(out) > 1 else out[0]


def transform_batch_sharded(
    mesh: Mesh, plan: TransformPlan, y, u, v
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run the full-frame transform with the batch sharded over the mesh.

    Accepts [B, H, W] uint8 planes, shards B over the mesh, and returns
    batch-sharded outputs.  The plan's constants (warp windows, tap
    indices, filter taps) are replicated by XLA; only frame data is
    sharded.  The pipeline partitions with zero cross-device communication
    in the compute (verified by tests/test_parallel.py on a virtual
    8-device CPU mesh).
    """
    from ..pipeline import transform_planes

    ym, um, vm = shard_batch(mesh, y, u, v)
    return transform_planes(plan, ym, um, vm)
