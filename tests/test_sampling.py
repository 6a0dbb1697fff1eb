"""Resampler golden tests: the TPU gather/interpolate path vs cv2.remap on
identical warp maps (oracle sampler == the reference's sampler)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from tests.conftest import psnr
from transform360_tpu import geometry
from transform360_tpu.config import Interpolation, Layout, StereoFormat, TransformConfig
from transform360_tpu.sampling import (
    apply_area_resize,
    area_matrix,
    make_sample_spec,
    remap_const,
    remap_traced,
)

MONO = dict(
    input_stereo_format=StereoFormat.MONO,
    output_stereo_format=StereoFormat.MONO,
)


def run_remap(spec, plane_u8, traced=False):
    flat = jnp.asarray(plane_u8).reshape(1, -1)  # [B=1, H*W]
    if traced:
        out = remap_traced(
            spec,
            flat,
            jnp.asarray(spec.base_y),
            jnp.asarray(spec.base_x),
            jnp.asarray(spec.frac_y),
            jnp.asarray(spec.frac_x),
            None if spec.valid is None else jnp.asarray(spec.valid),
            0.0,
        )
    else:
        out = remap_const(spec, flat, 0.0)
    out = jnp.clip(jnp.floor(out + 0.5), 0, 255).astype(jnp.uint8)
    return np.asarray(out)[0].reshape(spec.base_y.shape)


def make_image(rng, h, w):
    # smooth-ish + texture: realistic for interpolation comparisons
    yy, xx = np.mgrid[0:h, 0:w]
    img = (
        128
        + 80 * np.sin(xx / 7.0)
        + 40 * np.cos(yy / 5.0)
        + rng.normal(0, 12, (h, w))
    )
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("traced", [False, True])
@pytest.mark.parametrize(
    "interp,min_db",
    [
        (Interpolation.NEAREST, 100.0),  # must match exactly (inf PSNR)
        (Interpolation.LINEAR, 50.0),
        (Interpolation.CUBIC, 50.0),
        (Interpolation.LANCZOS4, 48.0),
    ],
)
def test_remap_matches_cv2(rng, interp, min_db, traced):
    in_h, in_w = 64, 128
    cfg = TransformConfig(interpolation_alg=interp, **MONO)
    warp = np.asarray(geometry.build_warp_map(cfg, in_w, in_h, 96, 64))
    img = make_image(rng, in_h, in_w)

    want = cv2.remap(
        img, warp[..., 0], warp[..., 1], int(interp), borderMode=cv2.BORDER_WRAP
    )
    spec = make_sample_spec(warp, in_w, in_h, interp, wrap=True)
    got = run_remap(spec, img, traced=traced)
    db = psnr(got, want)
    assert db >= min_db, f"{interp.name}: PSNR {db:.2f} dB"
    if interp == Interpolation.NEAREST:
        assert np.array_equal(got, want)


def test_const_and_traced_paths_agree(rng):
    in_h, in_w = 64, 128
    cfg = TransformConfig(interpolation_alg=Interpolation.CUBIC, **MONO)
    warp = np.asarray(geometry.build_warp_map(cfg, in_w, in_h, 96, 64))
    img = make_image(rng, in_h, in_w)
    spec = make_sample_spec(warp, in_w, in_h, Interpolation.CUBIC, wrap=True)
    a = run_remap(spec, img, traced=False)
    b = run_remap(spec, img, traced=True)
    np.testing.assert_array_equal(a, b)


def test_remap_barrel_transparent(rng):
    in_h, in_w = 64, 128
    cfg = TransformConfig(
        output_layout=Layout.BARREL,
        interpolation_alg=Interpolation.LINEAR,
        **MONO,
    )
    warp = np.asarray(geometry.build_warp_map(cfg, in_w, in_h, 100, 40))
    # keep the image away from the fill value (0): bilinear weights are
    # non-negative, so no REAL pixel can interpolate/round to 0 and the
    # ==0 comparison below identifies exactly the untouched fill set
    # (the session-scoped rng otherwise makes this order-dependent)
    img = np.clip(make_image(rng, in_h, in_w), 16, 240)
    want = np.zeros((40, 100), np.uint8)
    want = cv2.remap(
        img,
        warp[..., 0],
        warp[..., 1],
        cv2.INTER_LINEAR,
        dst=want,
        borderMode=cv2.BORDER_TRANSPARENT,
    )
    spec = make_sample_spec(warp, in_w, in_h, Interpolation.LINEAR, wrap=False)
    got = run_remap(spec, img)
    db = psnr(got, want)
    assert db >= 50.0, f"barrel transparent PSNR {db:.2f} dB"
    # the BORDER_TRANSPARENT skip set must match cv::remap exactly:
    # untouched (fill) exactly where the oracle left the dst untouched
    assert np.array_equal(got == 0, want == 0)


def test_seam_wrap_continuity(rng):
    """BORDER_WRAP at the ±π seam: taps past the right edge read column 0."""
    in_h, in_w = 32, 64
    img = make_image(rng, in_h, in_w)
    # synthetic map pointing exactly at the seam (x = in_w - 0.5 + eps)
    warp = np.zeros((4, 4, 2), np.float32)
    warp[..., 0] = in_w - 0.25
    warp[..., 1] = 10.0
    want = cv2.remap(
        img, warp[..., 0], warp[..., 1], cv2.INTER_LINEAR, borderMode=cv2.BORDER_WRAP
    )
    spec = make_sample_spec(warp, in_w, in_h, Interpolation.LINEAR, wrap=True)
    got = run_remap(spec, img)
    np.testing.assert_allclose(
        got.astype(int), want.astype(int), atol=1
    )


@pytest.mark.parametrize("n_in,n_out", [(96, 48), (100, 40), (97, 41), (50, 75)])
def test_area_matrix_matches_cv2(rng, n_in, n_out):
    img = make_image(rng, n_in, n_in)
    want = cv2.resize(img, (n_out, n_out), interpolation=cv2.INTER_AREA)
    R = area_matrix(n_in, n_out)
    C = area_matrix(n_in, n_out)
    x = jnp.asarray(img, jnp.float32)[None]
    got = apply_area_resize(x, jnp.asarray(R), jnp.asarray(C))
    got = np.asarray(
        jnp.clip(jnp.floor(got + 0.5), 0, 255).astype(jnp.uint8)
    )[0]
    db = psnr(got, want)
    assert db >= 48.0, f"area {n_in}->{n_out}: PSNR {db:.2f} dB"


def test_reflect101_matches_opencv_far_out_of_range():
    """reflect101 must match cv2.borderInterpolate(BORDER_REFLECT_101) even
    for taps more than n-1 out of range — an 8-tap lanczos footprint on a
    plane narrower than 5 px overshoots that far (regression: the old
    closed form returned out-of-range/negative indices there)."""
    from transform360_tpu.sampling import reflect101

    for n in (1, 2, 3, 4, 5, 7, 16):
        idx = np.arange(-3 * n - 9, 3 * n + 9)
        got = reflect101(idx, n)
        want = np.array(
            [cv2.borderInterpolate(int(i), n, cv2.BORDER_REFLECT_101)
             for i in idx]
        )
        np.testing.assert_array_equal(got, want, err_msg=f"n={n}")
        assert got.min() >= 0 and got.max() < n
