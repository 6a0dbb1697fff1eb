"""Multi-chip batch sharding on the virtual 8-device CPU mesh: results must
be identical to single-device execution and the batch must actually be
distributed (one shard per device, no replication of frame data)."""

import numpy as np
import pytest

import jax

from transform360_tpu import TransformConfig, build_plan, transform_batch
from transform360_tpu.config import Interpolation, StereoFormat
from transform360_tpu.parallel import (
    batch_sharding,
    make_mesh,
    shard_batch,
    transform_batch_sharded,
)
from transform360_tpu.pipeline import device_put_plan

MONO = dict(
    input_stereo_format=StereoFormat.MONO,
    output_stereo_format=StereoFormat.MONO,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "tests must run on the virtual 8-CPU mesh"
    return make_mesh()


def make_batch(rng, b, h, w):
    y = rng.integers(0, 256, (b, h, w), dtype=np.uint8)
    u = rng.integers(0, 256, (b, (h + 1) // 2, (w + 1) // 2), dtype=np.uint8)
    v = rng.integers(0, 256, (b, (h + 1) // 2, (w + 1) // 2), dtype=np.uint8)
    return y, u, v


def test_sharded_equals_single_device(mesh, rng):
    cfg = TransformConfig(
        interpolation_alg=Interpolation.LINEAR, enable_low_pass_filter=0, **MONO
    )
    plan = device_put_plan(build_plan(cfg, 128, 64, 48, 32))
    y, u, v = make_batch(rng, 16, 64, 128)
    want = transform_batch(plan, y, u, v)
    got = transform_batch_sharded(mesh, plan, y, u, v)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_sharded_with_prefilter(mesh, rng):
    cfg = TransformConfig(**MONO)  # defaults: cubic + low-pass
    plan = device_put_plan(build_plan(cfg, 128, 64, 48, 32))
    y, u, v = make_batch(rng, 8, 64, 128)
    want = transform_batch(plan, y, u, v)
    got = transform_batch_sharded(mesh, plan, y, u, v)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_batch_actually_sharded(mesh, rng):
    y, _, _ = make_batch(rng, 16, 64, 128)
    ys = shard_batch(mesh, y)
    shard_shapes = {s.data.shape for s in ys.addressable_shards}
    assert shard_shapes == {(2, 64, 128)}  # 16 frames / 8 devices
    assert len(ys.addressable_shards) == 8


def test_output_stays_sharded(mesh, rng):
    """No implicit all-gather: outputs keep the batch sharding."""
    cfg = TransformConfig(
        interpolation_alg=Interpolation.LINEAR, enable_low_pass_filter=0, **MONO
    )
    plan = device_put_plan(build_plan(cfg, 128, 64, 48, 32))
    y, u, v = make_batch(rng, 16, 64, 128)
    oy, _, _ = transform_batch_sharded(mesh, plan, y, u, v)
    assert len(oy.sharding.device_set) == 8


def test_api_mesh_wiring(mesh, rng):
    """open_filter(mesh=...) shards batches transparently and matches the
    unsharded path byte for byte."""
    from transform360_tpu import open_filter

    vf = ("w=48:h=32:input_stereo_format=mono:output_layout=equirect:"
          "interpolation_alg=linear:enable_low_pass_filter=0")
    y, u, v = make_batch(rng, 16, 64, 128)
    want = open_filter(vf, 128, 64).transform(y, u, v)
    t = open_filter(vf, 128, 64, mesh=mesh)
    got = t.transform(y, u, v)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    with pytest.raises(ValueError, match="not divisible"):
        t.transform(y[:3], u[:3], v[:3])


def test_cli_devices_sharding(tmp_path, rng):
    """--devices shards the CLI's batches over the virtual mesh; output
    must equal the single-device run."""
    from transform360_tpu.cli import main as cli_main
    from transform360_tpu.utils.yuv import write_yuv420_batch

    y, u, v = make_batch(rng, 12, 128, 64)
    path = tmp_path / "in.yuv"
    write_yuv420_batch(str(path), y, u, v)
    vf = ("w=64:h=32:input_stereo_format=mono:output_layout=equirect:"
          "interpolation_alg=linear:enable_low_pass_filter=0")
    args = ["--vf", vf, "--input-size", "64x128", "-i", str(path)]
    assert cli_main(args + ["-o", str(tmp_path / "a.yuv"), "--batch", "8",
                            "--devices", "8"]) == 0
    assert cli_main(args + ["-o", str(tmp_path / "b.yuv"), "--batch", "8"]) == 0
    assert (tmp_path / "a.yuv").read_bytes() == (tmp_path / "b.yuv").read_bytes()
    # batch not a multiple of devices -> clean usage error
    assert cli_main(args + ["-o", str(tmp_path / "c.yuv"), "--batch", "6",
                            "--devices", "8"]) == 2
