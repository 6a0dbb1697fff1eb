"""Multi-host (multi-process) scale-out over DCN.

The reference has no distributed anything (SURVEY §5) — its only
parallelism is a pthread per prefilter segment
(``VideoFrameTransform.cpp:592-604``).  The TPU-native scale-out is the
SAME 1-D batch mesh as single-host (:mod:`.mesh`), built over the
*global* device set after ``jax.distributed.initialize``: no collectives
run in the math path, so DCN carries only the coordination handshake and
every frame stays on the host that fed it.

Two feeding patterns, both exercised by ``tests/test_multihost.py``
(2 processes x 4 virtual CPU devices, byte-identical to single-process):

* every process passes the SAME full batch to
  :func:`..mesh.shard_batch` / ``Transform360.transform`` — JAX scatters
  each process's addressable slice locally (simple; decode is
  replicated);
* each process passes only ITS slice via :func:`shard_batch_local`
  (scalable: decode is sharded too).

Outputs are globally-sharded arrays; each process reads back its own
frames with :func:`local_output_frames`.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

from .mesh import batch_sharding, make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Bring up the JAX multi-process runtime (idempotent).

    Arguments default to the standard environment variables
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``); on managed TPU pods ``jax.distributed.initialize``
    auto-detects everything and all arguments may stay None.
    """
    import jax

    if is_initialized():
        return
    env = os.environ
    if coordinator_address is None:
        coordinator_address = env.get("JAX_COORDINATOR_ADDRESS") or None
    if num_processes is None and env.get("JAX_NUM_PROCESSES"):
        num_processes = int(env["JAX_NUM_PROCESSES"])
    if process_id is None and env.get("JAX_PROCESS_ID"):
        process_id = int(env["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def is_initialized() -> bool:
    import jax

    try:
        return jax.distributed.is_initialized()
    except AttributeError:  # older jax: probe the client handle
        from jax._src import distributed as _d

        return _d.global_state.client is not None


def global_mesh():
    """1-D batch mesh over the GLOBAL device set (all processes).

    Device order follows ``jax.devices()`` — processes own contiguous
    runs of the global batch axis, which :func:`shard_batch_local` and
    :func:`local_output_frames` rely on.
    """
    return make_mesh()


def shard_batch_local(mesh, *planes):
    """Build globally-sharded [B, H, W] planes from per-process slices.

    Each process passes only ITS contiguous slice of the global batch
    (process p owns frames ``[p*B/P, (p+1)*B/P)`` in ``jax.process_index``
    order); nothing crosses DCN.
    """
    import jax

    s = batch_sharding(mesh)
    out = tuple(
        jax.make_array_from_process_local_data(s, np.asarray(p))
        for p in planes
    )
    return out if len(out) > 1 else out[0]


def local_output_frames(arr) -> Tuple[np.ndarray, np.ndarray]:
    """This process's frames of a globally batch-sharded output.

    Returns ``(global_indices, frames)``: the global batch positions this
    process holds and the corresponding host numpy frames, in ascending
    order.  Purely local — no DCN traffic.
    """
    pairs = []
    for sh in arr.addressable_shards:
        i0 = sh.index[0].start or 0
        data = np.asarray(sh.data)
        pairs.append((np.arange(i0, i0 + data.shape[0]), data))
    pairs.sort(key=lambda t: t[0][0])
    idx = np.concatenate([p[0] for p in pairs])
    frames = np.concatenate([p[1] for p in pairs], axis=0)
    # a frame can appear in several addressable shards only when the mesh
    # replicates it; keep first occurrence
    _, keep = np.unique(idx, return_index=True)
    return idx[keep], frames[keep]
