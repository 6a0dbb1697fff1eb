"""Pallas window-gather remap kernel: interpret-mode validation vs the XLA
gather path (same SampleSpec, same math, different engine)."""

import numpy as np
import pytest

import jax.numpy as jnp

from transform360_tpu import TransformConfig, build_plan
from transform360_tpu.config import Interpolation, Layout, StereoFormat
from transform360_tpu.ops.remap_pallas import build_pallas_remap, remap_pallas
from transform360_tpu.sampling import remap_const

MONO = dict(
    input_stereo_format=StereoFormat.MONO,
    output_stereo_format=StereoFormat.MONO,
)


def run_case(rng, cfg, in_wh, out_wh, batch=2):
    plan = build_plan(cfg, in_wh[0], in_wh[1], out_wh[0], out_wh[1])
    pp = plan.luma
    pplan = build_pallas_remap(pp.spec, pp.fill)
    assert pplan is not None, "expected a pallas plan for this size"
    x = rng.integers(0, 256, (batch, pp.in_h, pp.in_w), dtype=np.uint8)
    got = np.asarray(remap_pallas(pplan, jnp.asarray(x), interpret=True))
    want = remap_const(pp.spec, jnp.asarray(x).reshape(batch, -1), pp.fill)
    want = np.asarray(jnp.clip(jnp.floor(want + 0.5), 0, 255).astype(jnp.uint8))
    sh, sw = pp.spec.base_y.shape
    want = want.reshape(batch, sh, sw)
    diff = np.abs(got.astype(int) - want.astype(int))
    # f32 accumulation order differs between engines -> at most 1 LSB ties
    assert diff.max() <= 1, f"max diff {diff.max()}"
    assert (diff > 0).mean() < 0.005, f"tie-flip fraction {(diff>0).mean()}"
    return pplan


def test_cubic_cubemap(rng):
    pplan = run_case(
        rng, TransformConfig(**MONO, enable_low_pass_filter=0),
        (1024, 512), (384, 256),
    )
    assert len(pplan.classes) >= 1
    # regular class should dominate for cubemap output
    assert pplan.classes[0].n > pplan.classes[-1].n


def test_linear_and_nearest(rng):
    for interp in (Interpolation.LINEAR, Interpolation.NEAREST):
        run_case(
            rng,
            TransformConfig(
                **MONO, interpolation_alg=interp, enable_low_pass_filter=0
            ),
            (1024, 512),
            (384, 256),
        )


def test_lanczos(rng):
    run_case(
        rng,
        TransformConfig(
            **MONO,
            interpolation_alg=Interpolation.LANCZOS4,
            enable_low_pass_filter=0,
        ),
        (1024, 512),
        (384, 256),
    )


def test_barrel_transparent_border(rng):
    run_case(
        rng,
        TransformConfig(
            **MONO,
            output_layout=Layout.BARREL,
            interpolation_alg=Interpolation.LINEAR,
            enable_low_pass_filter=0,
        ),
        (1024, 512),
        (640, 256),
    )


def test_stereo_tb(rng):
    run_case(
        rng,
        TransformConfig(
            input_stereo_format=StereoFormat.TB,
            output_stereo_format=StereoFormat.TB,
            enable_low_pass_filter=0,
        ),
        (512, 512),
        (384, 512),
    )


def test_cubemap_input(rng):
    run_case(
        rng,
        TransformConfig(
            **MONO,
            input_layout=Layout.CUBEMAP_32,
            output_layout=Layout.EQUIRECT,
            enable_low_pass_filter=0,
        ),
        (768, 512),
        (512, 256),
    )


def test_polar_class_absorbs_cubemap_poles(rng):
    # cubemap top/bottom-face tiles used to fall back to the XLA gather
    # (measured 30% of the batch-1 flagship frame, tools/probe_fb_cost.py);
    # the tall-group (128x640/96) and polar (128x1152/96) classes now
    # serve them in-kernel — no fallback subtiles remain
    pplan = run_case(
        rng, TransformConfig(**MONO, enable_low_pass_filter=0),
        (1024, 512), (384, 256),
    )
    assert any(c.gh == 96 for c in pplan.classes)  # pole tiles in-kernel
    assert pplan.fb_rows is None


def test_polar_class_with_residual_fallback(rng):
    # heavy decimation: subtile footprints exceed even the polar windows,
    # so all three kernel classes AND the XLA-fallback patch coexist
    pplan = run_case(
        rng, TransformConfig(**MONO, enable_low_pass_filter=0),
        (2048, 1024), (192, 128),
    )
    assert len(pplan.classes) >= 3
    assert pplan.fb_rows is not None and pplan.fb_rows.shape[0] > 0


def test_short_input_skips_oversize_window_classes(rng):
    # an input shorter than a class's window height (hp=104 < 128) must
    # not classify subtiles into that class: the build-time origin clamp
    # clip(y0, 0, hp - win_h) would go negative and the window DMA would
    # read out of bounds.  Oversize spans route to the XLA fallback.
    pplan = run_case(
        rng, TransformConfig(**MONO, enable_low_pass_filter=0),
        (512, 96), (192, 128),
    )
    assert all(c.win_h <= pplan.hp for c in pplan.classes)
    assert pplan.fb_rows is not None  # the tall-span tiles fell back


def test_tiny_plane_has_no_pallas_plan():
    cfg = TransformConfig(**MONO, enable_low_pass_filter=0)
    plan = build_plan(cfg, 256, 128, 96, 64)
    assert build_pallas_remap(plan.luma.spec, 0.0) is None
