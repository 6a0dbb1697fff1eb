"""Native C++ engine cross-validation: the third independent implementation
(JAX path vs numpy/OpenCV oracle vs dependency-free C++) must agree."""

import numpy as np
import pytest

from tests.conftest import psnr
from transform360_tpu import TransformConfig, build_plan, chroma_dims, transform_batch
from transform360_tpu.config import Interpolation, Layout, StereoFormat
from transform360_tpu import native
from transform360_tpu import geometry

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native engine unavailable: {native.build_error()}"
)

MONO = dict(
    input_stereo_format=StereoFormat.MONO,
    output_stereo_format=StereoFormat.MONO,
)


def make_yuv(rng, h, w):
    # Textured-smooth planes (video-like): independent f32 geometry
    # implementations differ by ulps, which flips 1/32 rounding buckets on
    # a tiny pixel fraction — white noise would amplify each flip to a
    # full uncorrelated pixel and say nothing about real fidelity.
    def tex(hh, ww, phase):
        yy, xx = np.mgrid[0:hh, 0:ww]
        img = (
            128
            + 70 * np.sin(xx / 6.0 + phase)
            + 45 * np.cos(yy / 5.0 - phase)
            + rng.normal(0, 8, (hh, ww))
        )
        return np.clip(img, 0, 255).astype(np.uint8)

    cw, ch = chroma_dims(w, h)
    return tex(h, w, 0.0), tex(ch, cw, 1.0), tex(ch, cw, 2.0)


def test_native_warp_map_matches_jax():
    cfg = TransformConfig(**MONO)
    t = native.NativeTransform(cfg)
    t.generate_map_for_plane(256, 128, 96, 64, 0)
    got = t.export_warp_map(0)  # 1/32-quantized coords
    want = np.asarray(geometry.build_warp_map(cfg, 256, 128, 96, 64))
    # native map is quantized to 1/32 px; tolerance covers that + f32 noise
    assert np.abs(got - want).max() < (1.0 / 32 + 1e-3)


@pytest.mark.parametrize(
    "kw",
    [
        dict(interpolation_alg=Interpolation.LINEAR, enable_low_pass_filter=0),
        dict(interpolation_alg=Interpolation.CUBIC, enable_low_pass_filter=0),
        dict(interpolation_alg=Interpolation.NEAREST, enable_low_pass_filter=0),
        dict(interpolation_alg=Interpolation.LANCZOS4, enable_low_pass_filter=0),
        dict(),  # defaults: cubic + prefilter
        dict(output_layout=Layout.EQUIRECT, fixed_yaw=30.0,
             enable_low_pass_filter=0,
             interpolation_alg=Interpolation.LINEAR),
        dict(width_scale_factor=2.0, height_scale_factor=2.0,
             interpolation_alg=Interpolation.LINEAR,
             enable_low_pass_filter=0),
    ],
)
def test_native_matches_jax_pipeline(rng, kw):
    cfg = TransformConfig(**MONO, **kw)
    y, u, v = make_yuv(rng, 128, 256)
    out_w, out_h = 96, 64
    t = native.NativeTransform(cfg)
    ny, nu, nv = t.transform_frame(y, u, v, out_w, out_h)

    plan = build_plan(cfg, 256, 128, out_w, out_h)
    jy, ju, jv = transform_batch(plan, y, u, v)
    for name, a, b in (("Y", ny, np.asarray(jy)), ("U", nu, np.asarray(ju)),
                       ("V", nv, np.asarray(jv))):
        db = psnr(a, b)
        assert db >= 50.0, f"{name}: native vs JAX PSNR {db:.2f} dB ({kw})"


def test_native_stereo_tb(rng):
    cfg = TransformConfig(
        input_stereo_format=StereoFormat.TB,
        output_stereo_format=StereoFormat.TB,
        interpolation_alg=Interpolation.LINEAR,
        enable_low_pass_filter=0,
    )
    y, u, v = make_yuv(rng, 256, 256)
    t = native.NativeTransform(cfg)
    ny, nu, nv = t.transform_frame(y, u, v, 96, 128)
    plan = build_plan(cfg, 256, 256, 96, 128)
    jy, ju, jv = transform_batch(plan, y, u, v)
    assert psnr(ny, np.asarray(jy)) >= 50.0
    assert psnr(nu, np.asarray(ju)) >= 50.0


def test_native_multithreading_consistent(rng):
    """enable_multi_threading must not change results (thread fan-out is
    over disjoint segments, like the reference)."""
    y, u, v = make_yuv(rng, 128, 256)
    outs = []
    for mt in (0, 1):
        cfg = TransformConfig(**MONO, enable_multi_threading=mt,
                              num_vertical_segments=7,
                              num_horizontal_segments=3)
        t = native.NativeTransform(cfg)
        outs.append(t.transform_frame(y, u, v, 96, 64))
    for a, b in zip(*outs):
        np.testing.assert_array_equal(a, b)


def test_native_backend_via_api(rng):
    """Transform360(backend='native') matches the JAX pipeline through the
    same public surface."""
    from transform360_tpu import open_filter

    y, u, v = make_yuv(rng, 128, 256)
    opts = ("cube_edge_length=32:input_stereo_format=mono:"
            "interpolation_alg=linear:enable_low_pass_filter=0")
    tj = open_filter(opts, 256, 128)
    tn = open_filter(opts, 256, 128, backend="native")
    a = tj.transform(y, u, v)
    b = tn.transform(y, u, v)
    for pa, pb in zip(a, b):
        assert psnr(pa, pb) >= 50.0
    # batched native path
    yb, ub, vb = (np.stack([p, p]) for p in (y, u, v))
    ob = tn.transform(yb, ub, vb)
    np.testing.assert_array_equal(ob[0][0], b[0])


def test_native_frame_pool_matches_per_frame(rng):
    """The frame-pool runner (batch across worker threads, inner segment
    threading disabled) must produce byte-identical output to the
    per-frame path for every frame."""
    cfg = TransformConfig(**MONO)  # cubic + prefilter (exercises blur)
    b, h, w = 5, 128, 256
    out_w, out_h = 96, 64
    ys = np.stack([make_yuv(rng, h, w)[0] for _ in range(b)])
    cw, ch = chroma_dims(w, h)
    us = np.stack([make_yuv(rng, h, w)[1] for _ in range(b)])
    vs = np.stack([make_yuv(rng, h, w)[2] for _ in range(b)])

    t = native.NativeTransform(cfg)
    oy, ou, ov = t.transform_frames(ys, us, vs, out_w, out_h)
    assert oy.shape == (b, out_h, out_w)
    c_out_w, c_out_h = chroma_dims(out_w, out_h)
    assert ou.shape == (b, c_out_h, c_out_w)

    t1 = native.NativeTransform(cfg)
    for i in range(b):
        sy, su, sv = t1.transform_frame(ys[i], us[i], vs[i], out_w, out_h)
        assert np.array_equal(oy[i], sy), f"frame {i} Y differs"
        assert np.array_equal(ou[i], su), f"frame {i} U differs"
        assert np.array_equal(ov[i], sv), f"frame {i} V differs"


def test_native_rejects_unresolved_guess():
    """GUESS stereo must be resolved before engine construction (the
    reference filter shell resolves it from aspect ratios before the
    engine ever sees the config — vf_transform360.c:178-196); the C
    engine's generateMap also returns failure rather than silently
    building a wrong eye mapping."""
    cfg = TransformConfig()  # defaults leave both formats GUESS
    with pytest.raises(ValueError, match="GUESS"):
        native.NativeTransform(cfg)


def test_native_tiny_plane_lanczos_barrel(rng):
    """8-tap lanczos footprints on a chroma plane shorter than 5 px used to
    compute out-of-range reflect indices (OOB reads).  Must run cleanly and
    deterministically with all outputs well-formed."""
    cfg = TransformConfig(
        **MONO,
        output_layout=Layout.BARREL,
        interpolation_alg=Interpolation.LANCZOS4,
        enable_low_pass_filter=0,
    )
    y, u, v = make_yuv(rng, 8, 16)  # chroma plane 8x4: taps overshoot n-1
    t = native.NativeTransform(cfg)
    a = t.transform_frame(y, u, v, 32, 16)
    b = t.transform_frame(y, u, v, 32, 16)
    for p, q in zip(a, b):
        np.testing.assert_array_equal(p, q)
    assert a[1].shape == (8, 16)


def test_native_pixel_formats(rng):
    """The native backend runs any planar format through the same
    per-plane C ABI (chroma dims from the format's log2 shifts)."""
    from transform360_tpu import open_filter

    vf = ("w=96:h=64:input_stereo_format=mono:"
          "interpolation_alg=linear:enable_low_pass_filter=0")
    # yuv444p: full-res chroma
    y = make_yuv(rng, 128, 256)[0]
    u = make_yuv(rng, 128, 256)[0]
    v = make_yuv(rng, 128, 256)[0]
    tn = open_filter(vf, 256, 128, backend="native", pix_fmt="yuv444p")
    tj = open_filter(vf, 256, 128, pix_fmt="yuv444p")
    got = tn.transform(y, u, v)
    want = tj.transform(y, u, v)
    for name, a, b in zip("YUV", got, want):
        assert a.shape == np.asarray(b).shape
        assert psnr(a, np.asarray(b)) >= 50.0, name
    # gray: single plane, bare-array return like the TPU path
    tg = open_filter(vf, 256, 128, backend="native", pix_fmt="gray")
    og = tg.transform(y)
    assert og.shape == (64, 96)
    assert psnr(og, np.asarray(got[0])) >= 50.0  # same luma pipeline
    # plane-count misuse still raises
    with pytest.raises(ValueError, match="expected 1 plane"):
        tg.transform(y, u, v)
