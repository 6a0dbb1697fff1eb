"""Single-frame latency sharding (output row-bands over devices): results
must be byte-identical to the unsharded transform for every plan feature
that touches output rows — chroma subsampling alignment, supersampling's
INTER_AREA epilogue, barrel fill masks, stereo eye stacking, gray."""

import numpy as np
import pytest

import jax

from transform360_tpu import TransformConfig, build_plan, transform_batch
from transform360_tpu.config import Interpolation, Layout, StereoFormat
from transform360_tpu.parallel.latency import band_plans, transform_frame_banded

MONO = dict(
    input_stereo_format=StereoFormat.MONO,
    output_stereo_format=StereoFormat.MONO,
)


def make_frame(rng, h, w):
    y = rng.integers(0, 256, (h, w), dtype=np.uint8)
    u = rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2), dtype=np.uint8)
    v = rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2), dtype=np.uint8)
    return y, u, v


def check(plan, planes, n, devices=None):
    want = transform_batch(plan, *planes)  # 2-D planes in -> 2-D out
    if plan.n_planes == 1:
        want = (want,)
    got = transform_frame_banded(plan, planes, devices=devices, n=n)
    assert len(got) == plan.n_planes
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, np.asarray(w))


@pytest.mark.parametrize("n", [1, 3, 8])
def test_banded_matches_unsharded(rng, n):
    cfg = TransformConfig(**MONO)  # defaults: cubic + adaptive low-pass
    plan = build_plan(cfg, 128, 64, 48, 32)
    check(plan, make_frame(rng, 64, 128), n)


def test_banded_supersampled(rng):
    cfg = TransformConfig(
        width_scale_factor=1.5, height_scale_factor=2.0, **MONO
    )
    plan = build_plan(cfg, 128, 64, 48, 32)
    assert plan.luma.area_row is not None  # the config supersamples
    check(plan, make_frame(rng, 64, 128), 5)


def test_banded_barrel_fill(rng):
    cfg = TransformConfig(output_layout=Layout.BARREL, **MONO)
    plan = build_plan(cfg, 128, 64, 64, 36)
    check(plan, make_frame(rng, 64, 128), 4)


def test_banded_stereo_tb(rng):
    cfg = TransformConfig(
        input_stereo_format=StereoFormat.TB,
        output_stereo_format=StereoFormat.TB,
    )
    plan = build_plan(cfg, 128, 128, 48, 64)
    check(plan, make_frame(rng, 128, 128), 8)


def test_banded_gray(rng):
    cfg = TransformConfig(
        interpolation_alg=Interpolation.LINEAR, **MONO
    )
    plan = build_plan(cfg, 128, 64, 48, 32, pix_fmt="gray")
    y = rng.integers(0, 256, (64, 128), dtype=np.uint8)
    check(plan, [y], 8)


def test_band_plans_structure():
    cfg = TransformConfig(**MONO)
    plan = build_plan(cfg, 128, 64, 48, 32)
    bands = band_plans(plan, 5)
    assert sum(b.luma.out_h for b in bands) == plan.luma.out_h
    assert sum(b.chroma.out_h for b in bands) == plan.chroma.out_h
    for b in bands:
        # luma/chroma rows stay aligned to the subsampling ratio
        assert b.luma.out_h == 2 * b.chroma.out_h
    # more bands than alignable rows clamps instead of emitting empties
    assert len(band_plans(plan, 64)) == plan.chroma.out_h


def test_band_plans_cost_balanced(rng):
    """row_costs places edges at equal-cost quantiles (and stays
    byte-identical)."""
    cfg = TransformConfig(**MONO)
    plan = build_plan(cfg, 128, 64, 48, 32)
    # expensive top rows: the first band should be the shortest
    costs = np.concatenate([np.full(16, 10.0), np.full(16, 1.0)])
    bands = band_plans(plan, 4, row_costs=costs)
    heights = [b.luma.out_h for b in bands]
    assert sum(heights) == 32 and heights[0] < heights[-1]
    for b in bands:  # chroma alignment survives cost edges
        assert b.luma.out_h == 2 * b.chroma.out_h
    planes = make_frame(rng, 64, 128)
    want = transform_batch(plan, *planes)
    got = transform_frame_banded(plan, planes, n=4, row_costs=costs)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, np.asarray(w))
    # every band keeps at least one unit even under degenerate costs
    degen = np.zeros(32)
    degen[0] = 1.0
    bands = band_plans(plan, 8, row_costs=degen)
    heights = [b.luma.out_h for b in bands]
    assert sum(heights) == 32 and min(heights) >= 2  # r = 2


def test_plan_row_costs_model(rng):
    """The fitted window-class cost model: row-level costs from the plan
    itself, and row_costs='auto' stays byte-identical."""
    from transform360_tpu.parallel.latency import plan_row_costs

    cfg = TransformConfig(**MONO)
    # both planes window-plan eligible (chroma: 256x128 in, 192x128 out)
    plan = build_plan(cfg, 512, 256, 384, 256)
    costs = plan_row_costs(plan)
    assert costs is not None and costs.shape == (256,)
    assert (costs >= 0).all() and costs.sum() > 0
    planes = make_frame(rng, 256, 512)
    want = transform_batch(plan, *planes)
    got = transform_frame_banded(plan, planes, n=4, row_costs="auto")
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, np.asarray(w))

    # tiny planes (no window plan): the model declines and 'auto' falls
    # back to uniform bands instead of crashing
    small = build_plan(cfg, 128, 64, 48, 32)
    assert plan_row_costs(small) is None
    sframe = make_frame(rng, 64, 128)
    got = transform_frame_banded(small, sframe, n=3, row_costs="auto")
    for g, w in zip(got, transform_batch(small, *sframe)):
        np.testing.assert_array_equal(g, np.asarray(w))

    with pytest.raises(ValueError):
        transform_frame_banded(small, sframe, row_costs="bogus")


def test_cli_latency_bands(tmp_path, rng):
    """--latency-bands output must equal the batched single-device run."""
    from transform360_tpu.cli import main as cli_main
    from transform360_tpu.utils.yuv import write_yuv420_batch

    y = rng.integers(0, 256, (6, 128, 64), dtype=np.uint8)
    u = rng.integers(0, 256, (6, 64, 32), dtype=np.uint8)
    v = rng.integers(0, 256, (6, 64, 32), dtype=np.uint8)
    path = tmp_path / "in.yuv"
    write_yuv420_batch(str(path), y, u, v)
    vf = ("w=64:h=32:input_stereo_format=mono:output_layout=equirect:"
          "interpolation_alg=linear:enable_low_pass_filter=0")
    args = ["--vf", vf, "--input-size", "64x128", "-i", str(path)]
    assert cli_main(args + ["-o", str(tmp_path / "a.yuv"),
                            "--latency-bands", "8"]) == 0
    assert cli_main(args + ["-o", str(tmp_path / "b.yuv"), "--batch", "3"]) == 0
    assert (tmp_path / "a.yuv").read_bytes() == (tmp_path / "b.yuv").read_bytes()
    # bands x frames grid: 2 bands per frame over 8 devices = 4 frames
    # in flight, bytes unchanged
    assert cli_main(args + ["-o", str(tmp_path / "c.yuv"),
                            "--latency-bands", "2", "--devices", "8"]) == 0
    assert (tmp_path / "c.yuv").read_bytes() == (tmp_path / "b.yuv").read_bytes()
    # still excluded -> usage error
    assert cli_main(args + ["-o", str(tmp_path / "d.yuv"),
                            "--latency-bands", "8", "--backend",
                            "native"]) == 2


def test_banded_grid_and_band_slices(rng):
    """The async grid form and multi-host band groups: dispatching
    several frames to disjoint device groups before any gather, and
    running each contiguous band group separately, both reproduce the
    unsharded bytes."""
    from transform360_tpu.parallel.latency import (
        local_band_range,
        transform_frame_banded_async,
    )

    cfg = TransformConfig(**MONO)
    plan = build_plan(cfg, 128, 64, 48, 32)
    frames = [make_frame(rng, 64, 128) for _ in range(3)]
    devs = jax.devices()

    # grid: 2 bands/frame, 4 device groups, 3 frames in flight at once
    inflight = [
        transform_frame_banded_async(
            plan, f, devices=devs[(k % 4) * 2:][:2], n=2
        )
        for k, f in enumerate(frames)
    ]
    for f, bf in zip(frames, inflight):
        want = transform_batch(plan, *f)
        for g, w in zip(bf.gather(), want):
            np.testing.assert_array_equal(g, np.asarray(w))

    # multi-host layout: global bands 5, two processes with contiguous
    # groups; vertical concat of the per-process slices == full frame
    ranges = [local_band_range(5, p, 2) for p in range(2)]
    assert ranges == [(0, 3), (3, 5)]
    want = transform_batch(plan, *frames[0])
    parts = [
        transform_frame_banded(
            plan, frames[0], devices=devs[:4], n=5, bands_slice=r
        )
        for r in ranges
    ]
    for j, w in enumerate(want):
        got = np.concatenate([p[j] for p in parts], axis=0)
        np.testing.assert_array_equal(got, np.asarray(w))

    with pytest.raises(ValueError):
        transform_frame_banded(plan, frames[0], n=5, bands_slice=(3, 9))
    with pytest.raises(ValueError):
        local_band_range(4, 2, 2)


def test_broadcast_model():
    from transform360_tpu.parallel.latency import broadcast_ms

    cfg = TransformConfig(**MONO)
    plan = build_plan(cfg, 128, 64, 48, 32)
    one = broadcast_ms(plan, 3840, 2160, 1)
    many = broadcast_ms(plan, 3840, 2160, 8)
    # 4K yuv420 is ~12.4 MB; the modeled cost is host inject (+ ICI
    # replication when sharing): sub-3ms, monotone in device count
    assert 0.5 < one < many < 5.0


def test_banded_round_robins_devices(rng):
    """More bands than devices still covers the frame (round-robin)."""
    cfg = TransformConfig(
        interpolation_alg=Interpolation.LINEAR,
        enable_low_pass_filter=0, **MONO,
    )
    plan = build_plan(cfg, 128, 64, 48, 32)
    planes = make_frame(rng, 64, 128)
    check(plan, planes, 11)
    check(plan, planes, 7, devices=jax.devices()[:3])
