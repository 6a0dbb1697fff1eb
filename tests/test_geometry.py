"""Warp-map parity: vectorized JAX geometry vs the scalar oracle
transcription, plus analytic landmark tests (SURVEY §4 plan)."""

import numpy as np
import pytest

from transform360_tpu import geometry, oracle
from transform360_tpu.config import (
    Interpolation,
    Layout,
    StereoFormat,
    TransformConfig,
)

MONO = dict(
    input_stereo_format=StereoFormat.MONO,
    output_stereo_format=StereoFormat.MONO,
)


def map_pair(cfg, in_w=128, in_h=64, out_w=48, out_h=32):
    got = np.asarray(geometry.build_warp_map(cfg, in_w, in_h, out_w, out_h))
    want = oracle.build_warp_map(cfg, in_w, in_h, out_w, out_h)
    return got, want


def assert_maps_close(cfg, tol=2e-3, **dims):
    got, want = map_pair(cfg, **dims)
    assert got.shape == want.shape
    # tolerance in input-pixel units
    err = np.abs(got - want)
    assert err.max() < tol, f"max map error {err.max()} at {np.unravel_index(err.argmax(), err.shape)}"


LAYOUTS = [
    Layout.CUBEMAP_32,
    Layout.CUBEMAP_23_OFFCENTER,
    Layout.EQUIRECT,
    Layout.EAC_32,
    Layout.FLAT_FIXED,
]


@pytest.mark.parametrize("layout", LAYOUTS)
def test_map_parity_mono_layouts(layout):
    assert_maps_close(TransformConfig(output_layout=layout, **MONO))


@pytest.mark.parametrize("layout", [Layout.BARREL, Layout.BARREL_SPLIT])
def test_map_parity_barrel_layouts(layout):
    cfg = TransformConfig(output_layout=layout, **MONO)
    got, want = map_pair(cfg, out_w=50, out_h=40)
    # The circle-edge mask may flip on exact-boundary pixels in f32 vs f64;
    # compare valid-vs-valid and require identical masks.
    got_valid = got[..., 0] > -1.0
    want_valid = want[..., 0] > -1.0
    assert (got_valid == want_valid).mean() > 0.995
    both = got_valid & want_valid
    err = np.abs(got[both] - want[both])
    assert err.max() < 2e-3


def test_map_parity_rotation():
    cfg = TransformConfig(
        fixed_yaw=33.0, fixed_pitch=-20.0, fixed_roll=7.0, **MONO
    )
    assert_maps_close(cfg)


def test_map_parity_offcenter():
    cfg = TransformConfig(
        output_layout=Layout.CUBEMAP_23_OFFCENTER,
        fixed_cube_offcenter_z=-0.7,
        **MONO,
    )
    assert_maps_close(cfg)


def test_map_parity_offcenter_horizontal():
    cfg = TransformConfig(
        fixed_cube_offcenter_x=0.3,
        fixed_cube_offcenter_z=-0.4,
        is_horizontal_offset=1,
        **MONO,
    )
    assert_maps_close(cfg, tol=5e-3)


def test_map_parity_stereo_tb():
    cfg = TransformConfig(
        input_stereo_format=StereoFormat.TB,
        output_stereo_format=StereoFormat.TB,
    )
    assert_maps_close(cfg, in_w=128, in_h=128, out_w=48, out_h=64)


def test_map_parity_stereo_lr_vflip():
    cfg = TransformConfig(
        input_stereo_format=StereoFormat.LR,
        output_stereo_format=StereoFormat.TB,
        vflip=1,
    )
    assert_maps_close(cfg, in_w=256, in_h=64, out_w=48, out_h=64)


def test_map_parity_cubemap_input():
    cfg = TransformConfig(
        input_layout=Layout.CUBEMAP_32,
        output_layout=Layout.EQUIRECT,
        **MONO,
    )
    got, want = map_pair(cfg, in_w=96, in_h=64)
    # outside markers must agree exactly
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_map_parity_flat_fixed_rotated():
    cfg = TransformConfig(
        output_layout=Layout.FLAT_FIXED,
        fixed_yaw=140.0,
        fixed_pitch=75.0,  # pushes viewport over the pole -> wrap path
        fixed_hfov=100.0,
        fixed_vfov=80.0,
        **MONO,
    )
    assert_maps_close(cfg)


def test_map_parity_supersampled():
    cfg = TransformConfig(width_scale_factor=2.0, height_scale_factor=1.5, **MONO)
    got, want = map_pair(cfg)
    assert got.shape == (48, 96, 2)  # scaled dims (32*1.5, 48*2)
    np.testing.assert_allclose(got, want, atol=2e-3)


# --- analytic landmarks -----------------------------------------------------


def _map_at(cfg, u, v, in_w=512, in_h=256):
    """Evaluate the normalized mapping at output coords (u, v)."""
    import jax.numpy as jnp

    ox, oy, valid = geometry.transform_pos(
        cfg, jnp.array([[u]]), jnp.array([[v]]), 1.0 / in_w
    )
    return float(ox[0, 0]), float(oy[0, 0]), bool(valid[0, 0])


def test_landmark_front_face_center_equirect():
    # Center of FRONT face (CUBEMAP_32 bottom row, middle) must map to the
    # equirect center (yaw 0 = x 0.5, equator = y 0.5).
    cfg = TransformConfig(expand_coef=1.0, **MONO)
    # 3x2 grid: face = hFace + (1-vFace)*3; FRONT=4 -> hFace=1, vFace=0
    # vFace=0 means flipped y in [0,0.5) -> output v in (0.5,1]
    ox, oy, _ = _map_at(cfg, 0.5, 0.75)
    assert ox == pytest.approx(0.5, abs=1e-6)
    assert oy == pytest.approx(0.5, abs=1e-6)


def test_landmark_equirect_identity():
    # equirect->equirect with no rotation ≈ identity map
    cfg = TransformConfig(
        output_layout=Layout.EQUIRECT, expand_coef=1.0, **MONO
    )
    for u, v in [(0.25, 0.25), (0.5, 0.5), (0.75, 0.6), (0.1, 0.9)]:
        ox, oy, _ = _map_at(cfg, u, v)
        assert ox == pytest.approx(u, abs=1e-5)
        assert oy == pytest.approx(v, abs=1e-5)


def test_landmark_yaw_360_equals_yaw_0():
    a = np.asarray(
        geometry.build_warp_map(
            TransformConfig(fixed_yaw=0.0, **MONO), 128, 64, 48, 32
        )
    )
    b = np.asarray(
        geometry.build_warp_map(
            TransformConfig(fixed_yaw=360.0, **MONO), 128, 64, 48, 32
        )
    )
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_landmark_top_face_maps_to_pole():
    # Center of TOP face maps to the north pole region (y near 0)
    cfg = TransformConfig(expand_coef=1.0, **MONO)
    # TOP=2 -> hFace=2, vFace=1 -> flipped y in [0.5,1) -> v in (0,0.5]
    ox, oy, _ = _map_at(cfg, 2.5 / 3.0, 0.25)
    assert oy == pytest.approx(0.0, abs=1e-3)


def test_stereo_tb_eyes_match_mono():
    """TB->TB stereo: each output eye equals the mono map of that eye."""
    stereo = TransformConfig(
        input_stereo_format=StereoFormat.TB,
        output_stereo_format=StereoFormat.TB,
    )
    mono = TransformConfig(**MONO)
    m_st = np.asarray(geometry.build_warp_map(stereo, 128, 128, 48, 64))
    m_mo = np.asarray(geometry.build_warp_map(mono, 128, 64, 48, 32))
    # Top eye: identical input-pixel coords (the stereo map's normalized
    # y*0.5 over the doubled input height lands on the same pixel row as
    # the mono map over the single-eye height).
    np.testing.assert_allclose(m_st[:32, :, 0], m_mo[..., 0], atol=1e-3)
    np.testing.assert_allclose(m_st[:32, :, 1], m_mo[..., 1], atol=1e-3)
    # Bottom eye: same x, y shifted by one eye height (64 px).
    np.testing.assert_allclose(m_st[32:, :, 0], m_mo[..., 0], atol=1e-3)
    np.testing.assert_allclose(m_st[32:, :, 1], m_mo[..., 1] + 64.0, atol=1e-3)


def test_scaled_output_dims_rounding():
    cfg = TransformConfig(width_scale_factor=1.5, **MONO)
    assert geometry.scaled_output_dims(cfg, 101, 50) == (152, 50)
