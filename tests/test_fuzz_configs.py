"""Randomized config-interaction sweep vs the oracle.

Single-purpose parity tests cover each feature in isolation; this sweep
samples whole configs across the option surface (layout x stereo x
interpolation x rotation x off-center x prefilter x supersampling) so
feature *interactions* get golden coverage too.  Deterministic: config i
derives from seed i.  Thresholds are below the dedicated tests' (45 dB at
this tiny scale — independent-implementation quantization noise); real
interaction bugs measure far below that.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tests.conftest import psnr
from tests.test_pipeline import make_yuv
from transform360_tpu import TransformConfig, build_plan, oracle, transform_batch
from transform360_tpu.config import Interpolation, Layout, StereoFormat
from transform360_tpu.pipeline import device_put_plan

OUT_LAYOUTS = [
    Layout.CUBEMAP_32,
    Layout.CUBEMAP_23_OFFCENTER,
    Layout.EQUIRECT,
    Layout.FLAT_FIXED,
    Layout.BARREL,
    Layout.BARREL_SPLIT,
    Layout.EAC_32,
]
INTERPS = [
    Interpolation.NEAREST,
    Interpolation.LINEAR,
    Interpolation.CUBIC,
    Interpolation.LANCZOS4,
]
STEREO = [StereoFormat.MONO, StereoFormat.TB, StereoFormat.LR]


def sample_config(i: int):
    r = np.random.default_rng(1000 + i)

    def pick(xs):
        return xs[int(r.integers(len(xs)))]

    in_stereo = pick(STEREO)
    out_stereo = pick(STEREO)
    kw = dict(
        input_layout=pick([Layout.EQUIRECT, Layout.CUBEMAP_32]),
        output_layout=pick(OUT_LAYOUTS),
        input_stereo_format=in_stereo,
        output_stereo_format=out_stereo,
        interpolation_alg=pick(INTERPS),
        enable_low_pass_filter=int(r.integers(2)),
        fixed_yaw=float(r.uniform(-180, 180)),
        fixed_pitch=float(r.uniform(-60, 60)),
        fixed_roll=float(r.uniform(-30, 30)),
        expand_coef=float(pick([1.0, 1.01, 1.03])),
        input_expand_coef=float(pick([1.0, 1.01])),
        vflip=int(r.integers(2)),
    )
    if kw["enable_low_pass_filter"]:
        kw.update(
            num_vertical_segments=int(r.integers(2, 8)),
            num_horizontal_segments=int(pick([1, 1, 2, 3])),
            adjust_kernel=int(r.integers(2)),
            kernel_height_scale_factor=float(pick([0.5, 1.0, 1.5])),
        )
    if kw["output_layout"] == Layout.CUBEMAP_23_OFFCENTER:
        kw.update(
            fixed_cube_offcenter_x=float(r.uniform(-0.3, 0.3)),
            fixed_cube_offcenter_y=float(r.uniform(-0.3, 0.3)),
            fixed_cube_offcenter_z=float(r.uniform(-0.4, 0.4)),
            is_horizontal_offset=int(r.integers(2)),
        )
    if kw["output_layout"] == Layout.FLAT_FIXED:
        kw.update(
            fixed_hfov=float(r.uniform(60, 150)),
            fixed_vfov=float(r.uniform(50, 120)),
        )
    if int(r.integers(4)) == 0:  # occasional supersampling epilogue
        kw.update(width_scale_factor=2.0, height_scale_factor=2.0)
    # input frame: equirect 2:1 per eye; cubemap input is a 3x2 atlas
    if kw["input_layout"] == Layout.CUBEMAP_32:
        in_w, in_h = 192, 128
    else:
        in_w, in_h = 256, 128
    if in_stereo == StereoFormat.TB:
        in_h *= 2
    elif in_stereo == StereoFormat.LR:
        in_w *= 2
    out_w, out_h = 96, 64
    if out_stereo == StereoFormat.TB:
        out_h *= 2
    elif out_stereo == StereoFormat.LR:
        out_w *= 2
    return kw, (in_w, in_h), (out_w, out_h)


@pytest.mark.parametrize("i", range(32))
def test_random_config_matches_oracle(i, rng):
    kw, (in_w, in_h), (out_w, out_h) = sample_config(i)
    cfg = TransformConfig(**kw)
    y, u, v = make_yuv(rng, in_h, in_w)
    plan = device_put_plan(build_plan(cfg, in_w, in_h, out_w, out_h))
    got = transform_batch(plan, y, u, v)
    want = oracle.transform_frame_yuv420(cfg, (y, u, v), out_w, out_h)
    for name, g, w_ in zip("YUV", got, want):
        g = np.asarray(g)
        assert g.shape == w_.shape, f"cfg {i} {kw}: {name} {g.shape} vs {w_.shape}"
        db = psnr(g, w_)
        assert db >= 45.0, f"cfg {i} plane {name}: {db:.2f} dB\n{kw}"
