"""High-bit-depth planar formats (yuv420p10le etc.) — a capability
BEYOND the reference, which wraps every plane as CV_8U bytes and would
corrupt >8-bit samples (VideoFrameTransform.cpp:1331-1335).  The deep
formats run the XLA compute path in float32 with rounding/saturation at
the format's true maximum; parity is checked against the same OpenCV
oracle running natively on uint16 planes."""

import io

import numpy as np
import pytest

from transform360_tpu import oracle
from transform360_tpu.config import (
    Interpolation,
    StereoFormat,
    TransformConfig,
    chroma_dims,
    get_pixel_format,
)
from transform360_tpu.pipeline import transform_batch
from transform360_tpu.plan import build_plan

MONO = dict(
    input_stereo_format=StereoFormat.MONO,
    output_stereo_format=StereoFormat.MONO,
)


def _deep_planes(in_w, in_h, pix_fmt, rng):
    pf = get_pixel_format(pix_fmt)
    yy, xx = np.mgrid[0:in_h, 0:in_w]
    mx = pf.maxval
    y = np.clip(
        mx / 2
        + (mx / 3) * np.sin(xx / 15.0) * np.cos(yy / 9.0)
        + rng.normal(0, mx / 40, (in_h, in_w)),
        0,
        mx,
    ).astype(np.uint16)
    if pf.n_planes == 1:
        return (y,)
    cw, ch = chroma_dims(in_w, in_h, pf)
    u = np.clip(
        pf.neutral + (mx / 4) * np.sin(np.mgrid[0:ch, 0:cw][1] / 7.0), 0, mx
    ).astype(np.uint16)
    v = np.clip(
        pf.neutral + (mx / 4) * np.cos(np.mgrid[0:ch, 0:cw][0] / 5.0), 0, mx
    ).astype(np.uint16)
    return y, u, v


def _psnr(a, b, peak):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(peak**2 / mse) if mse else 99.0


@pytest.mark.parametrize(
    "pix_fmt",
    ["yuv420p10le", "yuv444p12le", "yuv420p16le", "gbrp10le"],
)
def test_deep_parity_vs_oracle(pix_fmt, rng):
    pf = get_pixel_format(pix_fmt)
    cfg = TransformConfig(**MONO)  # cubic + adaptive prefilter defaults
    in_w, in_h = 512, 256
    out_w, out_h = 192, 128
    planes = _deep_planes(in_w, in_h, pix_fmt, rng)
    plan = build_plan(cfg, in_w, in_h, out_w, out_h, pix_fmt)
    assert plan.luma.depth == pf.depth
    got = transform_batch(plan, *planes)
    want = oracle.transform_frame_planar(cfg, planes, out_w, out_h, pix_fmt)
    for g, w in zip(got, want):
        g = np.asarray(g)
        assert g.dtype == np.uint16
        assert int(g.max()) <= pf.maxval
        assert _psnr(g, w, pf.maxval) >= 50.0


def test_deep_interpolators_parity(rng):
    """NEAREST and LANCZOS4 at 10 bit vs the oracle."""
    for interp in (Interpolation.NEAREST, Interpolation.LANCZOS4):
        cfg = TransformConfig(
            interpolation_alg=interp, enable_low_pass_filter=0, **MONO
        )
        planes = _deep_planes(512, 256, "yuv420p10le", rng)
        plan = build_plan(cfg, 512, 256, 192, 128, "yuv420p10le")
        got = transform_batch(plan, *planes)
        want = oracle.transform_frame_planar(
            cfg, planes, 192, 128, "yuv420p10le"
        )
        for g, w in zip(got, want):
            assert _psnr(np.asarray(g), w, 1023) >= 50.0, interp


def test_deep_barrel_fill_is_scaled_neutral(rng):
    """Unmapped barrel chroma pixels must hold the 10-bit neutral (512),
    not the 8-bit 128 (VideoFrameTransform.cpp:743-762 scaled)."""
    from transform360_tpu.config import Layout

    cfg = TransformConfig(
        output_layout=Layout.BARREL, enable_low_pass_filter=0, **MONO
    )
    planes = _deep_planes(512, 256, "yuv420p10le", rng)
    plan = build_plan(cfg, 512, 256, 320, 128, "yuv420p10le")
    assert plan.chroma.fill == 512 and plan.luma.fill == 0
    got = transform_batch(plan, *planes)
    # barrel output has unmapped corners around the polar circles
    u = np.asarray(got[1])
    corners = u[..., 0, -1]
    assert np.all(corners == 512)


def test_deep_gray16_roundtrip(rng):
    cfg = TransformConfig(enable_low_pass_filter=0, **MONO)
    pf = get_pixel_format("gray16le")
    y = _deep_planes(512, 256, "gray16le", rng)[0]
    plan = build_plan(cfg, 512, 256, 192, 128, "gray16le")
    got = np.asarray(transform_batch(plan, y))
    want = oracle.transform_frame_planar(cfg, (y,), 192, 128, "gray16le")[0]
    assert got.dtype == np.uint16
    assert _psnr(got, want, pf.maxval) >= 50.0


def test_deep_raw_io_roundtrip(rng):
    """Raw pipe IO carries 16-bit little-endian samples for deep formats."""
    from transform360_tpu.utils.yuv import (
        frame_size_bytes,
        read_planar_frames,
        write_yuv420_frames,
    )

    planes = _deep_planes(64, 32, "yuv420p10le", rng)
    buf = io.BytesIO()
    n = write_yuv420_frames(buf, [planes])
    assert n == 1
    assert buf.tell() == frame_size_bytes(64, 32, "yuv420p10le")
    buf.seek(0)
    back = next(iter(read_planar_frames(buf, 64, 32, 1, "yuv420p10le")))
    for a, b in zip(planes, back):
        assert b.dtype == np.dtype("<u2")
        np.testing.assert_array_equal(a, b)


def test_deep_plan_save_load_transforms_identically(tmp_path, rng):
    from transform360_tpu.plan import load_plan, save_plan

    cfg = TransformConfig(**MONO)
    planes = _deep_planes(256, 128, "yuv420p10le", rng)
    plan = build_plan(cfg, 256, 128, 96, 64, "yuv420p10le")
    p = tmp_path / "deep.npz"
    save_plan(plan, str(p))
    loaded = load_plan(str(p))
    assert loaded.luma.depth == 10 and loaded.chroma.fill == 512
    a = transform_batch(plan, *planes)
    b = transform_batch(loaded, *planes)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_deep_latency_banding_byte_identical(rng):
    """Latency banding must carry the depth through the band plans: a
    10-bit frame banded over 2 devices matches the unsharded transform
    byte for byte."""
    from transform360_tpu.parallel.latency import transform_frame_banded

    cfg = TransformConfig(**MONO)
    planes = _deep_planes(256, 128, "yuv420p10le", rng)
    plan = build_plan(cfg, 256, 128, 96, 64, "yuv420p10le")
    want = [np.asarray(p) for p in transform_batch(plan, *planes)]
    got = transform_frame_banded(plan, planes, n=2)
    for g, w in zip(got, want):
        assert g.dtype == np.uint16
        np.testing.assert_array_equal(g, w)


def test_deep_rejected_on_native_backend():
    from transform360_tpu.api import open_filter

    t = open_filter(
        "cube_edge_length=32:input_stereo_format=mono",
        256,
        128,
        backend="native",
        pix_fmt="yuv420p10le",
        eager=False,
    )
    y = np.zeros((128, 256), np.uint16)
    u = np.zeros((64, 128), np.uint16)
    with pytest.raises(ValueError, match="8-bit"):
        t.transform(y, u, u)
