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
