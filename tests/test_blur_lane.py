"""Lane-batched prefilter kernel: interpret-mode validation vs the XLA
blur path (same taps, same per-band replicate borders)."""

import numpy as np

import jax.numpy as jnp

from transform360_tpu import build_plan
from transform360_tpu.config import Interpolation, StereoFormat, TransformConfig
from transform360_tpu.ops.blur_lane import build_blur_lane, blur_lane
from transform360_tpu.filtering import apply_blur
from transform360_tpu.pipeline import _round_u8

MONO = dict(
    input_stereo_format=StereoFormat.MONO,
    output_stereo_format=StereoFormat.MONO,
)


def test_blur_lane_matches_xla(rng):
    cfg = TransformConfig(interpolation_alg=Interpolation.CUBIC, **MONO)
    plan = build_plan(cfg, 256, 80, 96, 64)
    bp = plan.luma.blur
    assert bp is not None
    bl = build_blur_lane(bp, 80, 256)
    assert bl is not None, "expected lane blur coverage for this config"
    x = rng.integers(0, 256, (80, 256, 128), dtype=np.uint8)
    got = np.asarray(blur_lane(bl, jnp.asarray(x), interpret=True))
    want = _round_u8(
        apply_blur(bp, jnp.transpose(jnp.asarray(x), (2, 0, 1)).astype(jnp.float32))
    )
    want = np.asarray(jnp.transpose(want, (1, 2, 0)))
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()}"
    assert (diff > 0).mean() < 0.005


def test_blur_lane_scope_gates():
    cfg = TransformConfig(
        interpolation_alg=Interpolation.CUBIC,
        num_horizontal_segments=3,
        **MONO,
    )
    plan = build_plan(cfg, 256, 80, 96, 64)
    # multiple horizontal segments -> out of lane-blur scope
    assert build_blur_lane(plan.luma.blur, 80, 256) is None


def test_pipeline_lane_path_e2e(rng, monkeypatch):
    """Batched pipeline output (lane path, interpret) must match the
    XLA-path output on the same frames."""
    import transform360_tpu.pipeline as pl

    cfg = TransformConfig(interpolation_alg=Interpolation.CUBIC, **MONO)
    plan = build_plan(cfg, 256, 80, 96, 64)
    pp = plan.luma
    B = 3
    x = rng.integers(0, 256, (B, 80, 256), dtype=np.uint8)

    want = np.asarray(pl._plane_program(pp, use_pallas=False)(jnp.asarray(x)))

    lane = pl._lane_plan(pp)
    assert lane is not None
    got = np.asarray(pl._lane_chunked(pp, lane, jnp.asarray(x), True))
    diff = np.abs(got.astype(int) - want.astype(int))
    assert got.shape == want.shape
    assert diff.max() <= 1, f"max diff {diff.max()}"
    assert (diff > 0).mean() < 0.005
