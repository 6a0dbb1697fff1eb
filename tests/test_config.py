"""Config-surface parity tests: option parsing, GUESS resolution, output
geometry negotiation (vf_transform360.c:167-326,407-987)."""

import pytest

from transform360_tpu.config import (
    FilterOptions,
    Interpolation,
    Layout,
    StereoFormat,
    TransformConfig,
    chroma_dims,
    negotiate_output_geometry,
    parse_options,
    resolve_stereo_formats,
)


def test_defaults_match_reference_option_table():
    c = TransformConfig()
    assert c.input_layout == Layout.EQUIRECT
    assert c.output_layout == Layout.CUBEMAP_32
    assert c.input_stereo_format == StereoFormat.GUESS
    assert c.output_stereo_format == StereoFormat.GUESS
    assert c.interpolation_alg == Interpolation.CUBIC
    assert c.input_expand_coef == pytest.approx(1.01)
    assert c.expand_coef == pytest.approx(1.01)
    assert c.fixed_hfov == 120.0 and c.fixed_vfov == 110.0
    assert c.enable_low_pass_filter == 1
    assert c.num_vertical_segments == 5
    assert c.num_horizontal_segments == 1
    assert c.adjust_kernel == 1
    assert c.min_kernel_half_height == 1.0
    assert c.max_kernel_half_height == 10000.0


def test_interpolation_codes_are_opencv_codes():
    assert Interpolation.NEAREST == 0
    assert Interpolation.LINEAR == 1
    assert Interpolation.CUBIC == 2
    assert Interpolation.LANCZOS4 == 4  # no value 3, like the reference


def test_parse_option_string_full():
    opts = parse_options(
        "input_stereo_format=TB:interpolation_alg=cubic:w=192:h=160:"
        "output_layout=barrel:yaw=15.5:enable_low_pass_filter=0:"
        "num_vertical_segments=7:cube_offcenter_z=-0.35:vflip=true"
    )
    c = opts.config
    assert c.input_stereo_format == StereoFormat.TB
    assert c.interpolation_alg == Interpolation.CUBIC
    assert c.output_layout == Layout.BARREL
    assert c.fixed_yaw == pytest.approx(15.5)
    assert c.enable_low_pass_filter == 0
    assert c.num_vertical_segments == 7
    assert c.fixed_cube_offcenter_z == pytest.approx(-0.35)
    assert c.vflip == 1
    assert opts.w_expr == "192" and opts.h_expr == "160"


def test_parse_uppercase_and_lowercase_enum_names():
    a = parse_options("output_layout=CUBEMAP_32:input_stereo_format=MONO")
    b = parse_options("output_layout=cubemap_32:input_stereo_format=mono")
    assert a.config == b.config


def test_size_and_wh_mutually_exclusive():
    with pytest.raises(ValueError):
        parse_options("size=100x100:w=50:h=50")


def test_unknown_option_rejected():
    with pytest.raises(ValueError):
        parse_options("bogus_option=1")


def test_guess_resolution_from_aspect_ratio():
    # vf_transform360.c:178-186: ratio 1 -> TB, 4 -> LR, else MONO
    cfg = TransformConfig()
    assert resolve_stereo_formats(cfg, 1024, 1024)[0] == StereoFormat.TB
    assert resolve_stereo_formats(cfg, 4096, 1024)[0] == StereoFormat.LR
    # 2:1 equirect -> MONO; NB integer division means 16:9 (ratio 1) would
    # guess TB — faithful to the reference's `inlink->w / inlink->h`.
    assert resolve_stereo_formats(cfg, 3840, 1920)[0] == StereoFormat.MONO
    assert resolve_stereo_formats(cfg, 3840, 2160)[0] == StereoFormat.TB
    # output GUESS: MONO input stays MONO
    assert resolve_stereo_formats(cfg, 3840, 1920)[1] == StereoFormat.MONO
    # stereo input: TB unless 2x3 offcenter cubemap (-> LR)
    assert resolve_stereo_formats(cfg, 1024, 1024)[1] == StereoFormat.TB
    cfg2 = cfg.replace(output_layout=Layout.CUBEMAP_23_OFFCENTER)
    assert resolve_stereo_formats(cfg2, 1024, 1024)[1] == StereoFormat.LR


def test_cube_edge_negotiation_and_mod16():
    # vf_transform360.c:198-223: max_cube_edge_length derives from input
    # width; rounded down to a multiple of 16; CUBEMAP_32 is 3Lx2L.
    opts = parse_options("max_cube_edge_length=1000:input_stereo_format=mono")
    out_w, out_h, cfg = negotiate_output_geometry(opts, 3840, 2160)
    # 3840/4 = 960 <= 1000, 960 % 16 == 0
    assert (out_w, out_h) == (960 * 3, 960 * 2)

    opts = parse_options("cube_edge_length=530:input_stereo_format=mono")
    out_w, out_h, _ = negotiate_output_geometry(opts, 3840, 2160)
    assert (out_w, out_h) == (528 * 3, 528 * 2)  # 530 -> 528 (%16)

    opts = parse_options(
        "cube_edge_length=512:output_layout=cubemap_23_offcenter:"
        "input_stereo_format=mono"
    )
    out_w, out_h, _ = negotiate_output_geometry(opts, 3840, 2160)
    assert (out_w, out_h) == (512 * 2, 512 * 3)


def test_cube_edge_with_noncubemap_layout_uses_input_dims():
    """vf_transform360.c:216-224: cube_edge_length with a non-cubemap
    output layout leaves outlink dims at the input size (w/h expressions
    are never evaluated); stereo doubling still applies."""
    from transform360_tpu.config import negotiate_output_geometry, parse_options

    opts = parse_options(
        "cube_edge_length=64:output_layout=equirect:input_stereo_format=mono"
    )
    out_w, out_h, cfg = negotiate_output_geometry(opts, 640, 320)
    assert (out_w, out_h) == (640, 320)

    # w/h present but ignored on this path, like the reference
    opts = parse_options(
        "cube_edge_length=64:output_layout=equirect:w=100:h=50:"
        "input_stereo_format=mono"
    )
    out_w, out_h, cfg = negotiate_output_geometry(opts, 640, 320)
    assert (out_w, out_h) == (640, 320)

    # TB output still doubles the defaulted height
    opts = parse_options(
        "cube_edge_length=64:output_layout=equirect:"
        "input_stereo_format=tb:output_stereo_format=tb"
    )
    out_w, out_h, cfg = negotiate_output_geometry(opts, 640, 640)
    assert (out_w, out_h) == (640, 1280)


def test_wh_expression_evaluation():
    # height may reference out_w; width re-evaluated after height
    opts = parse_options("w=480:h=out_w/2:input_stereo_format=mono")
    out_w, out_h, _ = negotiate_output_geometry(opts, 1920, 1080)
    assert (out_w, out_h) == (480, 240)

    opts = parse_options("w=out_h*3:h=320:input_stereo_format=mono")
    out_w, out_h, _ = negotiate_output_geometry(opts, 1920, 1080)
    assert (out_w, out_h) == (960, 320)


def test_stereo_output_doubles_dims():
    # vf_transform360.c:293-299
    opts = parse_options(
        "cube_edge_length=256:input_stereo_format=tb:output_stereo_format=tb"
    )
    out_w, out_h, cfg = negotiate_output_geometry(opts, 2048, 2048)
    assert (out_w, out_h) == (768, 1024)  # 3L x 2L, h doubled
    opts = parse_options(
        "cube_edge_length=256:input_stereo_format=tb:output_stereo_format=lr"
    )
    out_w, out_h, _ = negotiate_output_geometry(opts, 2048, 2048)
    assert (out_w, out_h) == (1536, 512)


def test_lr_input_cube_edge_derivation():
    opts = parse_options("max_cube_edge_length=16384:input_stereo_format=lr")
    out_w, out_h, _ = negotiate_output_geometry(opts, 4096, 1024)
    # LR input: in_w/8 = 512
    assert (out_w, out_h) == (512 * 3, 512 * 2 * 2)  # TB output doubles h


def test_chroma_dims_ceil():
    assert chroma_dims(1920, 1080) == (960, 540)
    assert chroma_dims(1921, 1081) == (961, 541)


def test_validate_rejects_bad_values():
    with pytest.raises(ValueError):
        TransformConfig(num_vertical_segments=1).validate()
    with pytest.raises(ValueError):
        TransformConfig(min_kernel_half_height=0.2).validate()
    with pytest.raises(ValueError):
        TransformConfig(width_scale_factor=0.0).validate()


def test_cache_key_stable_and_distinct():
    a = TransformConfig()
    b = TransformConfig(fixed_yaw=10.0)
    assert a.cache_key() == TransformConfig().cache_key()
    assert a.cache_key() != b.cache_key()
