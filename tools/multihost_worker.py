"""Multi-host worker: one JAX process of an N-process batch-parallel run.

Spawned by tests/test_multihost.py and __graft_entry__.dryrun_multichip's
multiprocess mode.  Each process owns ``local_devices`` virtual CPU
devices; together they form one global 1-D batch mesh and run the full
frame transform, then each process dumps ITS output frames (with their
global batch indices) for the parent to assemble and compare against a
single-process reference.

argv: pid nproc coordinator outdir mode local_devices
  mode 'local'  — each process feeds only its slice of the batch
                  (parallel.distributed.shard_batch_local);
  mode 'full'   — every process passes the same full batch through the
                  ordinary single-host entry (mesh.shard_batch), proving
                  the api surface is multi-host-transparent.
  mode 'banded' — single-frame LATENCY sharding across hosts: each
                  process runs its contiguous group of the global output
                  row-bands (parallel.latency.local_band_range) on its
                  own devices and dumps its row slice; the parent
                  stitches slices in process order.
"""

import os
import sys


def main() -> int:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coord, outdir, mode = sys.argv[3], sys.argv[4], sys.argv[5]
    local_devices = int(sys.argv[6])

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags
            + f" --xla_force_host_platform_device_count={local_devices}"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from transform360_tpu import TransformConfig, build_plan, chroma_dims
    from transform360_tpu.config import Interpolation, StereoFormat
    from transform360_tpu.parallel import distributed as dist
    from transform360_tpu.parallel import shard_batch
    from transform360_tpu.pipeline import transform_planes

    dist.initialize(coord, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert dist.is_initialized()

    mesh = dist.global_mesh()
    assert mesh.size == nproc * local_devices, mesh.size

    IN_W, IN_H, OUT_W, OUT_H = 256, 128, 96, 64
    B = mesh.size * 2
    cfg = TransformConfig(
        input_stereo_format=StereoFormat.MONO,
        output_stereo_format=StereoFormat.MONO,
        interpolation_alg=Interpolation.CUBIC,
        enable_low_pass_filter=1,
    )
    plan = build_plan(cfg, IN_W, IN_H, OUT_W, OUT_H)
    rng = np.random.default_rng(0)
    cw, ch = chroma_dims(IN_W, IN_H)
    y = rng.integers(0, 256, (B, IN_H, IN_W), dtype=np.uint8)
    u = rng.integers(0, 256, (B, ch, cw), dtype=np.uint8)
    v = rng.integers(0, 256, (B, ch, cw), dtype=np.uint8)

    if mode == "banded":
        from transform360_tpu.parallel.latency import (
            local_band_range,
            transform_frame_banded,
        )

        n_bands = mesh.size
        bslice = local_band_range(n_bands)
        parts = transform_frame_banded(
            plan, (y[0], u[0], v[0]), devices=jax.local_devices(),
            n=n_bands, row_costs="auto", bands_slice=bslice,
        )
        for name, p in zip("yuv", parts):
            np.savez(os.path.join(outdir, f"p{pid}_{name}.npz"), rows=p)
        print(f"worker {pid} OK", flush=True)
        return 0

    if mode == "local":
        lo, hi = pid * B // nproc, (pid + 1) * B // nproc
        ym, um, vm = dist.shard_batch_local(
            mesh, y[lo:hi], u[lo:hi], v[lo:hi]
        )
    else:
        ym, um, vm = shard_batch(mesh, y, u, v)

    out = transform_planes(plan, ym, um, vm)
    for name, o in zip("yuv", out):
        idx, frames = dist.local_output_frames(o)
        np.savez(
            os.path.join(outdir, f"p{pid}_{name}.npz"),
            idx=idx,
            frames=frames,
        )
    print(f"worker {pid} OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
