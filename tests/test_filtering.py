"""Prefilter parity: kernel math, segment raster, and blurred-plane output
vs the cv2.sepFilter2D oracle (per-segment BORDER_REPLICATE semantics)."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import psnr
from transform360_tpu import filtering, oracle
from transform360_tpu.config import Layout, StereoFormat, TransformConfig

MONO = dict(
    input_stereo_format=StereoFormat.MONO,
    output_stereo_format=StereoFormat.MONO,
)


@pytest.mark.parametrize("sigma", [0.0, 0.3, 0.5, 1.0, 2.7, 9.9])
def test_calculate_kernel_parity(sigma):
    got = filtering.calculate_kernel(sigma)
    want = oracle.calculate_kernel(sigma)
    assert got.shape == want.shape
    # half-length = int(2*sigma), normalized
    assert got.shape[0] == 2 * int(2 * sigma) + 1
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.sum() == pytest.approx(1.0, abs=1e-6)


def test_sigma_y_formula():
    cfg = TransformConfig(**MONO)
    # 4K -> 512 cubemap: min(3840/360, 2160/180)/max(1536/270, 1024/180)
    s = filtering.compute_sigma_y(cfg, 3840, 2160, 1536, 1024)
    expect = 0.5 * max(1.0, (3840 / 360.0) / (1536 / 270.0))
    assert s == pytest.approx(expect, rel=1e-6)
    # clamps
    cfg2 = cfg.replace(max_kernel_half_height=0.6)
    assert filtering.compute_sigma_y(cfg2, 3840, 2160, 64, 64) == pytest.approx(0.3)


def test_effective_ratio_parity():
    for dist in [0.0, 0.3, 1.0, 2.0, 3.0]:
        for off in [0.0, 0.4, 0.7]:
            got = filtering.get_effective_ratio(dist, off)
            want = oracle.get_effective_ratio(dist, off)
            assert got == pytest.approx(want, rel=1e-9)


@pytest.mark.parametrize("nvs,in_h", [(2, 64), (5, 64), (5, 63), (6, 100), (7, 100), (32, 480)])
def test_segment_raster_parity(nvs, in_h):
    """Band rectangles must exactly match the oracle's SegmentFilteringConfig
    list (including odd-count equator band and clipped edge bands)."""
    cfg = TransformConfig(num_vertical_segments=nvs, adjust_kernel=0, **MONO)
    in_w = 128
    plan = filtering.build_blur_plan(cfg, in_w, in_h, 48, 32)
    segs = oracle.compute_filtering_configs(cfg, in_w, in_h, 48, 32)
    got = sorted((b.top, b.height) for b in plan.bands)
    want = sorted((s.top, s.height) for s in segs)
    assert got == want


def test_segment_kernels_parity_adjusted():
    cfg = TransformConfig(
        num_vertical_segments=5, num_horizontal_segments=4, adjust_kernel=1, **MONO
    )
    in_w, in_h = 128, 64
    plan = filtering.build_blur_plan(cfg, in_w, in_h, 48, 32)
    segs = oracle.compute_filtering_configs(cfg, in_w, in_h, 48, 32)
    by_rect = {(s.top, s.left): s for s in segs}
    for band in plan.bands:
        for t in range(plan.n_tiles):
            s = by_rect[(band.top, t * plan.tile_w)]
            # stacked kernels are center-aligned zero-padded copies
            kx = band.kx[t]
            off = (kx.shape[0] - s.kernel_x.shape[0]) // 2
            np.testing.assert_allclose(
                kx[off : off + s.kernel_x.shape[0]], s.kernel_x, atol=1e-6
            )
            assert np.all(kx[:off] == 0) and np.all(kx[off + s.kernel_x.shape[0]:] == 0)
            ky = band.ky[t]
            off = (ky.shape[0] - s.kernel_y.shape[0]) // 2
            np.testing.assert_allclose(
                ky[off : off + s.kernel_y.shape[0]], s.kernel_y, atol=1e-6
            )


def blur_with_plan(cfg, img, out_w=48, out_h=32):
    plan = filtering.build_blur_plan(
        cfg, img.shape[1], img.shape[0], out_w, out_h
    )
    x = jnp.asarray(img, jnp.float32)[None]
    out = filtering.apply_blur(plan, x)
    return np.asarray(out)[0]


def oracle_blur(cfg, img, out_w=48, out_h=32):
    segs = oracle.compute_filtering_configs(
        cfg, img.shape[1], img.shape[0], out_w, out_h
    )
    return oracle.filter_plane(cfg, img, segs)


def make_image(rng, h, w):
    return rng.integers(0, 256, (h, w), dtype=np.uint8)


@pytest.mark.parametrize(
    "kw",
    [
        dict(num_vertical_segments=5),
        dict(num_vertical_segments=6),
        dict(num_vertical_segments=5, num_horizontal_segments=4),
        dict(num_vertical_segments=9, num_horizontal_segments=3,
             kernel_adjust_factor=1.7),
        dict(num_vertical_segments=5, adjust_kernel=0),
        dict(num_vertical_segments=5, kernel_height_scale_factor=4.0),
    ],
)
def test_blur_matches_oracle_mono(rng, kw):
    cfg = TransformConfig(**MONO, **kw)
    img = make_image(rng, 64, 128)
    got = blur_with_plan(cfg, img, out_w=24, out_h=16)
    want = oracle_blur(cfg, img.astype(np.uint8), out_w=24, out_h=16).astype(
        np.float64
    )
    # oracle output is uint8-rounded by cv2; compare after rounding ours
    got_u8 = np.clip(np.floor(got + 0.5), 0, 255)
    db = psnr(got_u8, want)
    assert db >= 52.0, f"blur PSNR {db:.2f} dB for {kw}"


@pytest.mark.parametrize(
    "stereo,in_w,in_h",
    [
        (StereoFormat.TB, 128, 128),
        (StereoFormat.LR, 256, 64),
        (StereoFormat.TB, 128, 127),  # odd: final row zeroed like reference
    ],
)
def test_blur_matches_oracle_stereo(rng, stereo, in_w, in_h):
    cfg = TransformConfig(
        input_stereo_format=stereo,
        output_stereo_format=StereoFormat.TB,
        num_vertical_segments=5,
    )
    img = make_image(rng, in_h, in_w)
    got = blur_with_plan(cfg, img, out_w=48, out_h=64)
    want = oracle_blur(cfg, img, out_w=48, out_h=64).astype(np.float64)
    got_u8 = np.clip(np.floor(got + 0.5), 0, 255)
    db = psnr(got_u8, want)
    assert db >= 50.0, f"stereo blur PSNR {db:.2f} dB"


def test_blur_batch_consistency(rng):
    """Batched blur equals per-frame blur."""
    cfg = TransformConfig(**MONO)
    imgs = [make_image(rng, 64, 128) for _ in range(3)]
    plan = filtering.build_blur_plan(cfg, 128, 64, 48, 32)
    batch = jnp.stack(
        [jnp.asarray(i, jnp.float32) for i in imgs], axis=0
    )  # [B, H, W]
    out_b = np.asarray(filtering.apply_blur(plan, batch))
    for k, img in enumerate(imgs):
        single = np.asarray(
            filtering.apply_blur(plan, jnp.asarray(img, jnp.float32)[None])
        )[0]
        np.testing.assert_allclose(out_b[k], single, atol=1e-4)
