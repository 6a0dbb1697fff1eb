"""End-to-end golden tests: full YUV420 frame transform vs the oracle
pipeline, covering the five BASELINE.json config classes (at test scale)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tests.conftest import psnr
from transform360_tpu import (
    Transform360,
    TransformConfig,
    build_plan,
    chroma_dims,
    open_filter,
    transform_batch,
)
from transform360_tpu import oracle
from transform360_tpu.config import Interpolation, Layout, StereoFormat
from transform360_tpu.pipeline import device_put_plan

MONO = dict(
    input_stereo_format=StereoFormat.MONO,
    output_stereo_format=StereoFormat.MONO,
)


def make_yuv(rng, h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(
        128 + 90 * np.sin(xx / 9.0) * np.cos(yy / 7.0) + rng.normal(0, 10, (h, w)),
        0,
        255,
    ).astype(np.uint8)
    cw, ch = chroma_dims(w, h)
    u = np.clip(128 + 60 * np.sin(np.mgrid[0:ch, 0:cw][1] / 5.0), 0, 255).astype(
        np.uint8
    )
    v = np.clip(128 + 60 * np.cos(np.mgrid[0:ch, 0:cw][0] / 4.0), 0, 255).astype(
        np.uint8
    )
    return y, u, v


def run_both(cfg, rng, in_w, in_h, out_w, out_h, min_db=50.0):
    y, u, v = make_yuv(rng, in_h, in_w)
    plan = device_put_plan(build_plan(cfg, in_w, in_h, out_w, out_h))
    got = transform_batch(plan, y, u, v)
    want = oracle.transform_frame_yuv420(cfg, (y, u, v), out_w, out_h)
    for name, g, w_ in zip("YUV", got, want):
        g = np.asarray(g)
        assert g.shape == w_.shape, f"{name}: {g.shape} vs {w_.shape}"
        db = psnr(g, w_)
        assert db >= min_db, f"plane {name}: PSNR {db:.2f} dB < {min_db}"


def test_baseline1_mono_bilinear_no_filter(rng):
    """BASELINE config 1 (scaled down): mono equirect->cubemap, bilinear."""
    cfg = TransformConfig(
        interpolation_alg=Interpolation.LINEAR,
        enable_low_pass_filter=0,
        **MONO,
    )
    run_both(cfg, rng, 256, 128, 96, 64)


def test_baseline2_cubic_full_planes(rng):
    """BASELINE config 2: cubic interpolation, full 3-plane YUV420."""
    cfg = TransformConfig(
        interpolation_alg=Interpolation.CUBIC, enable_low_pass_filter=0, **MONO
    )
    run_both(cfg, rng, 512, 256, 192, 128)


def test_baseline3_adaptive_prefilter(rng):
    """BASELINE config 3 (scaled down): adaptive prefilter with many
    segments and adjust_kernel=1."""
    cfg = TransformConfig(
        interpolation_alg=Interpolation.LINEAR,
        enable_low_pass_filter=1,
        num_vertical_segments=9,
        num_horizontal_segments=5,
        adjust_kernel=1,
        **MONO,
    )
    run_both(cfg, rng, 256, 128, 48, 32, min_db=48.0)


def test_baseline4_stereo_tb(rng):
    """BASELINE config 4: TB stereo input, per-eye maps."""
    cfg = TransformConfig(
        input_stereo_format=StereoFormat.TB,
        output_stereo_format=StereoFormat.TB,
        interpolation_alg=Interpolation.LINEAR,
        enable_low_pass_filter=0,
    )
    run_both(cfg, rng, 256, 256, 96, 128)


def test_baseline4_stereo_lr(rng):
    cfg = TransformConfig(
        input_stereo_format=StereoFormat.LR,
        output_stereo_format=StereoFormat.LR,
        interpolation_alg=Interpolation.LINEAR,
        enable_low_pass_filter=0,
    )
    run_both(cfg, rng, 512, 128, 192, 64)


def test_baseline5_batched(rng):
    """BASELINE config 5: batched multi-frame transform equals per-frame."""
    cfg = TransformConfig(
        interpolation_alg=Interpolation.LINEAR, enable_low_pass_filter=0, **MONO
    )
    frames = [make_yuv(rng, 128, 256) for _ in range(4)]
    plan = device_put_plan(build_plan(cfg, 256, 128, 96, 64))
    yb = np.stack([f[0] for f in frames])
    ub = np.stack([f[1] for f in frames])
    vb = np.stack([f[2] for f in frames])
    oy, ou, ov = transform_batch(plan, yb, ub, vb)
    for k, (y, u, v) in enumerate(frames):
        sy, su, sv = transform_batch(plan, y, u, v)
        np.testing.assert_array_equal(np.asarray(oy)[k], np.asarray(sy))
        np.testing.assert_array_equal(np.asarray(ou)[k], np.asarray(su))
        np.testing.assert_array_equal(np.asarray(ov)[k], np.asarray(sv))


def test_supersampling_path(rng):
    """width/height scale factors: remap to scaled size then INTER_AREA."""
    cfg = TransformConfig(
        interpolation_alg=Interpolation.LINEAR,
        enable_low_pass_filter=0,
        width_scale_factor=2.0,
        height_scale_factor=2.0,
        **MONO,
    )
    run_both(cfg, rng, 256, 128, 96, 64, min_db=48.0)


def test_barrel_full_pipeline(rng):
    cfg = TransformConfig(
        output_layout=Layout.BARREL,
        interpolation_alg=Interpolation.LINEAR,
        enable_low_pass_filter=0,
        **MONO,
    )
    run_both(cfg, rng, 256, 128, 100, 40, min_db=50.0)


def test_lanczos_full_pipeline(rng):
    cfg = TransformConfig(
        interpolation_alg=Interpolation.LANCZOS4, enable_low_pass_filter=0, **MONO
    )
    run_both(cfg, rng, 256, 128, 96, 64, min_db=48.0)


def test_default_config_end_to_end(rng):
    """The filter's true defaults: cubic + low-pass with 5 segments."""
    cfg = TransformConfig(**MONO)
    run_both(cfg, rng, 256, 128, 96, 64, min_db=48.0)


def test_api_open_filter(rng):
    t = open_filter(
        "cube_edge_length=32:input_stereo_format=mono:interpolation_alg=linear:"
        "enable_low_pass_filter=0",
        256,
        128,
    )
    assert t.output_dims() == (96, 64)
    y, u, v = make_yuv(rng, 128, 256)
    oy, ou, ov = t.transform(y, u, v)
    assert oy.shape == (64, 96)
    assert ou.shape == (32, 48)
    want = oracle.transform_frame_yuv420(t.plan.cfg, (y, u, v), 96, 64)
    assert psnr(oy, want[0]) >= 50.0


def test_api_lazy_map_generation(rng):
    cfg = TransformConfig(
        interpolation_alg=Interpolation.LINEAR, enable_low_pass_filter=0, **MONO
    )
    t = Transform360(cfg, out_w=96, out_h=64)
    assert t.plan is None
    y, u, v = make_yuv(rng, 128, 256)
    t.transform(y, u, v)  # lazy generation on first frame
    assert t.plan is not None


def test_plan_save_load(tmp_path, rng):
    cfg = TransformConfig(
        interpolation_alg=Interpolation.LINEAR, enable_low_pass_filter=0, **MONO
    )
    t = open_filter(
        "cube_edge_length=32:input_stereo_format=mono:interpolation_alg=linear:"
        "enable_low_pass_filter=0",
        256,
        128,
    )
    p = tmp_path / "plan.npz"
    t.save_plan(str(p))
    t2 = Transform360(cfg)
    t2.load_plan(str(p))
    y, u, v = make_yuv(rng, 128, 256)
    a = t.transform(y, u, v)
    b = t2.transform(y, u, v)
    for x, z in zip(a, b):
        np.testing.assert_array_equal(x, z)


def test_plan_save_load_with_blur_and_area(tmp_path, rng):
    """Round-trip a plan that exercises every serialized substructure:
    blur bank (multi-band, tiles), supersampling area matrices."""
    t = open_filter(
        "cube_edge_length=32:input_stereo_format=mono:"
        "num_vertical_segments=5:num_horizontal_segments=3:"
        "width_scale_factor=1.5:height_scale_factor=1.5",
        256,
        128,
    )
    p = tmp_path / "plan.npz"
    t.save_plan(str(p))
    t2 = Transform360(t.config)
    t2.load_plan(str(p))
    y, u, v = make_yuv(rng, 128, 256)
    for x, z in zip(t.transform(y, u, v), t2.transform(y, u, v)):
        np.testing.assert_array_equal(x, z)


def test_plan_v2_carries_kernel_plans(tmp_path, rng):
    """A v2 plan file embeds the derived lane-kernel plans; loading seeds
    the pipeline caches so a restarted process does NO Python kernel-plan
    rebuild, and the seeded plans are array-identical to a fresh build."""
    from transform360_tpu import pipeline
    from transform360_tpu.ops import blur_lane as bl_mod
    from transform360_tpu.ops import remap_lane as rl_mod
    from transform360_tpu.plan import build_plan as bp
    from transform360_tpu.plan import load_plan, save_plan

    cfg = TransformConfig(interpolation_alg=Interpolation.CUBIC, **MONO)
    plan = bp(cfg, 256, 128, 96, 64)
    fresh_lane = pipeline._lane_plan(plan.luma)
    fresh_blur = pipeline._blur_lane_plan(plan.luma)
    assert fresh_lane is not None and fresh_blur is not None
    p = tmp_path / "plan.npz"
    save_plan(plan, str(p))

    pipeline.clear_executor_cache()
    real_lane, real_blur = rl_mod.build_lane_remap, bl_mod.build_blur_lane

    def boom(*a, **k):
        raise AssertionError("kernel plan rebuilt despite v2 seed")

    rl_mod.build_lane_remap = boom
    bl_mod.build_blur_lane = boom
    try:
        loaded = load_plan(str(p))
        got_lane = pipeline._lane_plan(loaded.luma)
        got_blur = pipeline._blur_lane_plan(loaded.luma)
    finally:
        rl_mod.build_lane_remap = real_lane
        bl_mod.build_blur_lane = real_blur
        pipeline.clear_executor_cache()

    assert len(got_lane.classes) == len(fresh_lane.classes)
    for a, b in zip(got_lane.classes, fresh_lane.classes):
        assert (a.win_h, a.win_w, a.n, a.double_buf, a.unpack_f32) == (
            b.win_h, b.win_w, b.n, b.double_buf, b.unpack_f32
        )
        np.testing.assert_array_equal(a.meta, b.meta)
        np.testing.assert_array_equal(a.idx, b.idx)
        np.testing.assert_array_equal(a.wyb, b.wyb)
    np.testing.assert_array_equal(got_lane.wt, fresh_lane.wt)
    assert (got_lane.hp, got_lane.wp, got_lane.n_tiles) == (
        fresh_lane.hp, fresh_lane.wp, fresh_lane.n_tiles
    )
    np.testing.assert_array_equal(got_blur.meta, fresh_blur.meta)
    np.testing.assert_array_equal(got_blur.tapsy, fresh_blur.tapsy)
    np.testing.assert_array_equal(got_blur.mx_bank, fresh_blur.mx_bank)
    assert got_blur.wwp == fresh_blur.wwp


def test_plan_v3_quantized_storage_bit_exact_and_v2_compat(tmp_path):
    """v3 stores fractions/tap-weights/indices in downcast or value-table
    form (they are 1/32-quantized by construction, sampling.py) and must
    reconstruct BIT-exactly; a legacy v2 file (raw arrays) still loads."""
    import json

    from transform360_tpu import plan as plan_mod
    from transform360_tpu.plan import build_plan as bp
    from transform360_tpu.plan import load_plan, save_plan

    cfg = TransformConfig(interpolation_alg=Interpolation.CUBIC, **MONO)
    plan = bp(cfg, 256, 128, 96, 64)
    p3 = tmp_path / "v3.npz"
    save_plan(plan, str(p3))

    with np.load(str(p3), allow_pickle=False) as data:
        header = json.loads(bytes(data["header"]).decode("utf-8"))
        assert header["version"] == 3
        enc = header["enc"]
        # the big arrays actually shrank on disk
        assert enc["luma.frac_x"]["c"] == "dict"
        assert data["luma.frac_x"].dtype == np.uint8
        assert enc["luma.base_x"]["c"] == "int"
        assert data["luma.base_x"].dtype.itemsize < 4

    loaded = load_plan(str(p3))
    for name in ("base_y", "base_x", "frac_y", "frac_x"):
        a = getattr(plan.luma.spec, name)
        b = getattr(loaded.luma.spec, name)
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(a, b)

    # a v2-format file (no "enc" map, raw arrays) still loads identically
    real_enc = plan_mod._encode_arrays
    plan_mod._encode_arrays = lambda arrs: (arrs, {})
    try:
        p2 = tmp_path / "v2.npz"
        save_plan(plan, str(p2))
    finally:
        plan_mod._encode_arrays = real_enc
    arrays = dict(np.load(str(p2), allow_pickle=False))
    header = json.loads(bytes(arrays["header"]).decode("utf-8"))
    assert not header["enc"]
    header["version"] = 2
    del header["enc"]
    arrays["header"] = np.frombuffer(
        json.dumps(header).encode("utf-8"), dtype=np.uint8
    )
    with open(p2, "wb") as f:
        np.savez(f, **arrays)
    loaded2 = load_plan(str(p2))
    np.testing.assert_array_equal(
        loaded2.luma.spec.frac_x, plan.luma.spec.frac_x
    )


def test_plan_file_is_pickle_free_npz(tmp_path):
    """The plan format must be loadable with allow_pickle=False and carry
    a version header that rejects unknown versions (no code execution on
    untrusted files)."""
    import json

    from transform360_tpu.plan import load_plan

    t = open_filter(
        "cube_edge_length=32:input_stereo_format=mono:enable_low_pass_filter=0",
        256,
        128,
    )
    p = tmp_path / "plan.npz"
    t.save_plan(str(p))
    with np.load(str(p), allow_pickle=False) as data:  # must not raise
        header = json.loads(bytes(data["header"]).decode("utf-8"))
    assert header["format"] == "transform360_tpu-plan"

    # tamper the version -> rejected
    header["version"] = 999
    arrays = dict(np.load(str(p), allow_pickle=False))
    arrays["header"] = np.frombuffer(
        json.dumps(header).encode("utf-8"), dtype=np.uint8
    )
    bad = tmp_path / "bad.npz"
    with open(bad, "wb") as f:
        np.savez(f, **arrays)
    with pytest.raises(ValueError, match="version"):
        load_plan(str(bad))

    # a random npz is rejected too
    junk = tmp_path / "junk.npz"
    np.savez(str(junk), a=np.zeros(3))
    with pytest.raises(ValueError, match="not a transform360_tpu plan"):
        load_plan(str(junk))


def test_traced_fallback_matches_const_path(rng, monkeypatch):
    """With MAX_CONST_BYTES forced to 0 the XLA path must route through
    remap_traced (staged spec arrays) and produce identical output."""
    from transform360_tpu import sampling
    from transform360_tpu.pipeline import clear_executor_cache

    cfg = TransformConfig(
        interpolation_alg=Interpolation.CUBIC, enable_low_pass_filter=0, **MONO
    )
    y, u, v = make_yuv(rng, 128, 256)
    plan = device_put_plan(build_plan(cfg, 256, 128, 96, 64))

    clear_executor_cache()
    ref = [np.asarray(p) for p in transform_batch(plan, y, u, v)]

    monkeypatch.setattr(sampling, "MAX_CONST_BYTES", 0)
    clear_executor_cache()
    got = [np.asarray(p) for p in transform_batch(plan, y, u, v)]
    clear_executor_cache()

    for g, r in zip(got, ref):
        np.testing.assert_array_equal(g, r)


def test_plane_level_api(rng):
    """transform_frame_plane mirrors the C ABI single-plane entry."""
    t = open_filter(
        "cube_edge_length=32:input_stereo_format=mono:interpolation_alg=linear:"
        "enable_low_pass_filter=0",
        256,
        128,
    )
    y, u, v = make_yuv(rng, 128, 256)
    full = t.transform(y, u, v)
    py = t.transform_frame_plane(y, 0, 256, 128)
    pu = t.transform_frame_plane(u, 1, 256, 128)
    np.testing.assert_array_equal(full[0], py)
    np.testing.assert_array_equal(full[1], pu)


def test_barrel_split_full_pipeline(rng):
    cfg = TransformConfig(
        output_layout=Layout.BARREL_SPLIT,
        interpolation_alg=Interpolation.LINEAR,
        enable_low_pass_filter=0,
        **MONO,
    )
    run_both(cfg, rng, 256, 128, 96, 64, min_db=50.0)


def test_offcenter_horizontal_pipeline(rng):
    cfg = TransformConfig(
        fixed_cube_offcenter_x=0.3,
        fixed_cube_offcenter_z=-0.4,
        is_horizontal_offset=1,
        interpolation_alg=Interpolation.LINEAR,
        enable_low_pass_filter=0,
        **MONO,
    )
    run_both(cfg, rng, 256, 128, 96, 64, min_db=48.0)


def test_eac_full_pipeline(rng):
    cfg = TransformConfig(
        output_layout=Layout.EAC_32,
        interpolation_alg=Interpolation.CUBIC,
        enable_low_pass_filter=0,
        **MONO,
    )
    run_both(cfg, rng, 256, 128, 96, 64, min_db=48.0)


def test_pixel_format_yuv444p(rng):
    """Non-4:2:0 formats run through the same 2-map-plane machinery with
    shift-derived chroma dims (vf_transform360.c:87-97)."""
    from transform360_tpu import oracle
    from transform360_tpu.plan import build_plan as bp

    cfg = TransformConfig(
        interpolation_alg=Interpolation.LINEAR, enable_low_pass_filter=0, **MONO
    )
    y, _, _ = make_yuv(rng, 128, 256)
    gy, gx = np.mgrid[0:128, 0:256]
    u = np.clip(128 + 60 * np.sin(gx / 5.0), 0, 255).astype(np.uint8)
    v = np.clip(128 + 60 * np.cos(gy / 4.0), 0, 255).astype(np.uint8)
    plan = bp(cfg, 256, 128, 96, 64, pix_fmt="yuv444p")
    assert plan.chroma.in_w == 256 and plan.chroma.in_h == 128
    got = transform_batch(plan, y, u, v)
    want = oracle.transform_frame_planar(cfg, (y, u, v), 96, 64, "yuv444p")
    for g, w_ in zip(got, want):
        g = np.asarray(g)
        assert g.shape == w_.shape
        assert psnr(g, w_) >= 50.0


def test_pixel_format_yuv422p(rng):
    from transform360_tpu import oracle
    from transform360_tpu.plan import build_plan as bp

    cfg = TransformConfig(
        interpolation_alg=Interpolation.CUBIC, enable_low_pass_filter=1, **MONO
    )
    y, _, _ = make_yuv(rng, 128, 256)
    gy, gx = np.mgrid[0:128, 0:128]
    u = np.clip(128 + 60 * np.sin(gx / 5.0), 0, 255).astype(np.uint8)
    v = np.clip(128 + 60 * np.cos(gy / 4.0), 0, 255).astype(np.uint8)
    plan = bp(cfg, 256, 128, 96, 64, pix_fmt="yuv422p")
    assert (plan.chroma.in_w, plan.chroma.in_h) == (128, 128)
    got = transform_batch(plan, y, u, v)
    want = oracle.transform_frame_planar(cfg, (y, u, v), 96, 64, "yuv422p")
    for g, w_ in zip(got, want):
        g = np.asarray(g)
        assert g.shape == w_.shape
        assert psnr(g, w_) >= 50.0


def test_pixel_format_yuv440p(rng):
    """yuv440p: full-width, half-height chroma (shifts 0/1)."""
    from transform360_tpu import oracle
    from transform360_tpu.plan import build_plan as bp

    cfg = TransformConfig(
        interpolation_alg=Interpolation.CUBIC, enable_low_pass_filter=1, **MONO
    )
    y, _, _ = make_yuv(rng, 128, 256)
    gy, gx = np.mgrid[0:64, 0:256]
    u = np.clip(128 + 60 * np.sin(gx / 5.0), 0, 255).astype(np.uint8)
    v = np.clip(128 + 60 * np.cos(gy / 4.0), 0, 255).astype(np.uint8)
    plan = bp(cfg, 256, 128, 96, 64, pix_fmt="yuv440p")
    assert (plan.chroma.in_w, plan.chroma.in_h) == (256, 64)
    assert (plan.chroma.out_w, plan.chroma.out_h) == (96, 32)
    got = transform_batch(plan, y, u, v)
    want = oracle.transform_frame_planar(cfg, (y, u, v), 96, 64, "yuv440p")
    for g, w_ in zip(got, want):
        g = np.asarray(g)
        assert g.shape == w_.shape
        assert psnr(g, w_) >= 50.0


def test_pixel_format_gbrp(rng):
    """Planar RGB rides the same 2-map-plane machinery: the reference
    declares no pix-fmt list so FFmpeg feeds it gbrp, and planes 1/2 use
    the full-res 'chroma' map (vf_transform360.c:368-380)."""
    from transform360_tpu import oracle
    from transform360_tpu.plan import build_plan as bp

    cfg = TransformConfig(
        interpolation_alg=Interpolation.LINEAR, enable_low_pass_filter=1, **MONO
    )
    g, _, _ = make_yuv(rng, 128, 256)
    gy, gx = np.mgrid[0:128, 0:256]
    b = np.clip(128 + 60 * np.sin(gx / 5.0), 0, 255).astype(np.uint8)
    r = np.clip(128 + 60 * np.cos(gy / 4.0), 0, 255).astype(np.uint8)
    plan = bp(cfg, 256, 128, 96, 64, pix_fmt="gbrp")
    assert (plan.chroma.in_w, plan.chroma.in_h) == (256, 128)
    assert (plan.chroma.out_w, plan.chroma.out_h) == (96, 64)
    got = transform_batch(plan, g, b, r)
    want = oracle.transform_frame_planar(cfg, (g, b, r), 96, 64, "gbrp")
    for got_p, want_p in zip(got, want):
        got_p = np.asarray(got_p)
        assert got_p.shape == want_p.shape
        assert psnr(got_p, want_p) >= 50.0


def test_pixel_format_gray(rng):
    """Single-plane gray: no chroma plan, bare-array return."""
    from transform360_tpu import oracle
    from transform360_tpu.api import Transform360
    from transform360_tpu.plan import build_plan as bp

    cfg = TransformConfig(
        interpolation_alg=Interpolation.LINEAR, enable_low_pass_filter=0, **MONO
    )
    y, _, _ = make_yuv(rng, 128, 256)
    plan = bp(cfg, 256, 128, 96, 64, pix_fmt="gray")
    assert plan.chroma is None
    got = np.asarray(transform_batch(plan, y))
    (want,) = oracle.transform_frame_planar(cfg, (y,), 96, 64, "gray")
    assert got.shape == want.shape
    assert psnr(got, want) >= 50.0

    t = Transform360(cfg, 96, 64, pix_fmt="gray")
    out = t.transform(y)
    np.testing.assert_array_equal(out, got)


def test_pixel_format_plan_roundtrip(tmp_path, rng):
    """Gray plans (no chroma) serialize and load."""
    from transform360_tpu.api import Transform360
    from transform360_tpu.plan import load_plan, save_plan
    from transform360_tpu.plan import build_plan as bp

    cfg = TransformConfig(
        interpolation_alg=Interpolation.LINEAR, enable_low_pass_filter=0, **MONO
    )
    plan = bp(cfg, 256, 128, 96, 64, pix_fmt="gray")
    p = tmp_path / "gray.npz"
    save_plan(plan, str(p))
    plan2 = load_plan(str(p))
    assert plan2.pix_fmt == "gray" and plan2.chroma is None
    y, _, _ = make_yuv(rng, 128, 256)
    np.testing.assert_array_equal(
        np.asarray(transform_batch(plan, y)),
        np.asarray(transform_batch(plan2, y)),
    )


def test_plan_memoization_and_clear():
    """build_plan memoizes by (config hash, dims, pix_fmt); clear_plan_cache
    drops the memo so the next build returns a fresh object."""
    from transform360_tpu.plan import clear_plan_cache

    cfg = TransformConfig(
        interpolation_alg=Interpolation.LINEAR, enable_low_pass_filter=0, **MONO
    )
    a = build_plan(cfg, 256, 128, 96, 64)
    assert build_plan(cfg, 256, 128, 96, 64) is a
    # a different pix_fmt is a distinct cache entry
    assert build_plan(cfg, 256, 128, 96, 64, pix_fmt="gray") is not a
    clear_plan_cache()
    assert build_plan(cfg, 256, 128, 96, 64) is not a


def test_missing_planes_rejected(rng):
    """Passing fewer planes than the pixel format declares must raise, not
    silently transform the luma plane alone (regression)."""
    vf = ("w=48:h=32:input_stereo_format=mono:"
          "interpolation_alg=linear:enable_low_pass_filter=0")
    t = open_filter(vf, 128, 64)
    y, u, v = make_yuv(rng, 64, 128)
    with pytest.raises(ValueError, match="expected 3 plane"):
        t.transform(y)
    with pytest.raises(ValueError, match="expected 3 plane"):
        t.transform(y, u)
    # the full plane set still works
    oy, ou, ov = t.transform(y, u, v)
    assert np.asarray(oy).shape == (32, 48)


def test_load_plan_pix_fmt_mismatch(tmp_path, rng):
    """A saved plan carries its pix_fmt; loading it into an engine built
    for a different format must fail loudly instead of corrupting chroma."""
    vf = ("w=48:h=32:input_stereo_format=mono:"
          "interpolation_alg=linear:enable_low_pass_filter=0")
    t = open_filter(vf, 128, 64)
    path = tmp_path / "plan420.npz"
    t.save_plan(str(path))
    t444 = open_filter(vf, 128, 64, eager=False, pix_fmt="yuv444p")
    with pytest.raises(ValueError, match="pix_fmt"):
        t444.load_plan(str(path))
