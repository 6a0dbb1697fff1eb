"""Lane-batched remap kernel: interpret-mode validation vs the XLA gather
path (same SampleSpec, same math, batch-in-lanes engine)."""

import numpy as np

import jax.numpy as jnp

from transform360_tpu import build_plan
from transform360_tpu.config import Interpolation, Layout, StereoFormat, TransformConfig
from transform360_tpu.ops.remap_lane import build_lane_remap, remap_lane
from transform360_tpu.sampling import remap_const

MONO = dict(
    input_stereo_format=StereoFormat.MONO,
    output_stereo_format=StereoFormat.MONO,
)


def run_case(rng, cfg, in_wh, out_wh, batch=3):
    plan = build_plan(cfg, in_wh[0], in_wh[1], out_wh[0], out_wh[1])
    pp = plan.luma
    lplan = build_lane_remap(pp.spec, pp.fill)
    assert lplan is not None, "expected a lane plan for this size"
    x = rng.integers(0, 256, (batch, pp.in_h, pp.in_w), dtype=np.uint8)
    got = np.asarray(remap_lane(lplan, jnp.asarray(x), interpret=True))
    want = remap_const(pp.spec, jnp.asarray(x).reshape(batch, -1), pp.fill)
    want = np.asarray(jnp.clip(jnp.floor(want + 0.5), 0, 255).astype(jnp.uint8))
    sh, sw = pp.spec.base_y.shape
    want = want.reshape(batch, sh, sw)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert got.shape == want.shape
    # f32 accumulation order differs between engines -> at most 1 LSB ties
    assert diff.max() <= 1, f"max diff {diff.max()}"
    assert (diff > 0).mean() < 0.005, f"tie-flip fraction {(diff>0).mean()}"
    return lplan


def test_cubic_cubemap(rng):
    cfg = TransformConfig(interpolation_alg=Interpolation.CUBIC, **MONO)
    lp = run_case(rng, cfg, (128, 64), (96, 64))
    assert lp.classes, "no kernel classes built"


def test_linear_and_nearest(rng):
    for alg in (Interpolation.LINEAR, Interpolation.NEAREST):
        cfg = TransformConfig(interpolation_alg=alg, **MONO)
        run_case(rng, cfg, (128, 64), (96, 64))


def test_lanczos(rng):
    cfg = TransformConfig(interpolation_alg=Interpolation.LANCZOS4, **MONO)
    run_case(rng, cfg, (128, 64), (96, 64))


def test_barrel_transparent_border(rng):
    cfg = TransformConfig(
        output_layout=Layout.BARREL,
        interpolation_alg=Interpolation.LINEAR,
        **MONO,
    )
    lp = run_case(rng, cfg, (128, 64), (160, 64))
    assert not lp.wrap and lp.pad_left == 8


def test_stereo_tb(rng):
    cfg = TransformConfig(
        input_stereo_format=StereoFormat.TB,
        output_stereo_format=StereoFormat.TB,
        interpolation_alg=Interpolation.CUBIC,
    )
    run_case(rng, cfg, (128, 128), (96, 128))


def test_equirect_roundtrip_identityish(rng):
    cfg = TransformConfig(
        output_layout=Layout.EQUIRECT,
        interpolation_alg=Interpolation.CUBIC,
        **MONO,
    )
    run_case(rng, cfg, (128, 64), (128, 64))


def test_dma_chunks_partition():
    from transform360_tpu.ops.remap_lane import _dma_chunks

    for wh in (1, 7, 8, 15, 16, 24, 32, 48, 64, 89, 128):
        chunks = _dma_chunks(wh)
        assert 1 <= len(chunks) <= 8
        # contiguous, gap-free cover of [0, wh)
        y = 0
        for cy, rows in chunks:
            assert cy == y and rows >= 1
            y += rows
        assert y == wh
        # balanced: chunk sizes differ by at most one row
        sizes = [r for _, r in chunks]
        assert max(sizes) - min(sizes) <= 1


def test_unpack_f32_gate_and_body_parity(rng):
    """The f32 pre-unpack is gated on window-reuse (small windows only),
    and both kernel bodies (u8 per-pixel unpack vs f32 scratch slices)
    produce byte-identical output — the u8->i32->f32 conversion is exact,
    so the gate is a pure performance knob."""
    import dataclasses

    cfg = TransformConfig(interpolation_alg=Interpolation.CUBIC, **MONO)
    plan = build_plan(cfg, 128, 64, 96, 64)
    pp = plan.luma
    lplan = build_lane_remap(pp.spec, pp.fill)
    assert lplan is not None
    T = lplan.taps
    for cls in lplan.classes:
        # gate matches the documented reuse criterion exactly
        from transform360_tpu.ops.remap_lane import (
            LANES, TPo, XW, _DOUBLE_BUF_BYTES, _WINDOW_BYTES_MAX,
        )
        wbytes = cls.win_h * cls.win_w * LANES
        nbuf = 2 if wbytes <= _DOUBLE_BUF_BYTES else 1
        want = (
            T >= 4
            and 5 * cls.win_h * cls.win_w <= 2 * TPo * T * XW
            and (nbuf + 4) * wbytes <= _WINDOW_BYTES_MAX
        )
        assert cls.unpack_f32 == want
    assert any(c.unpack_f32 for c in lplan.classes), "small windows gate on"

    # T=2 (bilinear) never unpacks: measured net loss on chip even on
    # high-reuse classes (see the gate comment in ops/remap_lane.py)
    lin = TransformConfig(interpolation_alg=Interpolation.LINEAR, **MONO)
    lpl = build_lane_remap(build_plan(lin, 128, 64, 96, 64).luma.spec, 0.0)
    assert not any(c.unpack_f32 for c in lpl.classes)

    x = rng.integers(0, 256, (2, pp.in_h, pp.in_w), dtype=np.uint8)
    got_f32 = np.asarray(remap_lane(lplan, jnp.asarray(x), interpret=True))
    forced = dataclasses.replace(
        lplan,
        classes=tuple(
            dataclasses.replace(c, unpack_f32=False) for c in lplan.classes
        ),
    )
    got_u8 = np.asarray(remap_lane(forced, jnp.asarray(x), interpret=True))
    # The two bodies compute the same f32 taps but XLA fuses the programs
    # differently, so a floor(x+0.5) rounding tie may land on either side:
    # allow 1 LSB (byte-exactness would make the test input-dependent).
    diff = np.abs(got_f32.astype(np.int16) - got_u8.astype(np.int16))
    assert diff.max() <= 1


def _assert_tie_flips_balanced(got, want, rate=1e-3):
    """1-LSB rounding-tie allowance that still catches one-sided bugs: the
    mismatch rate must be tiny AND the signed diff must not be systematic
    (a +1-only rounding bug at even 0.1% density fails the mean bound)."""
    signed = got.astype(np.int16) - want.astype(np.int16)
    assert np.abs(signed).max() <= 1
    assert np.mean(signed != 0) < rate, f"tie rate {np.mean(signed != 0)}"
    assert abs(signed.mean()) < rate / 10, f"one-sided bias {signed.mean()}"


def _run_pack_case(rng, lplan, pp, k, B):
    from transform360_tpu.ops.remap_lane import (
        build_lane_pack,
        remap_lane_hwb_pack,
    )

    packp = build_lane_pack(lplan, k)
    assert packp is not None and packp.packs
    # every tile is covered by the entry permutation (tail-group repeats
    # may cover a tile more than once; each extra slot is a recompute)
    ids = np.concatenate(
        [pc.ids.reshape(-1) for pc in packp.packs]
        + [c.meta[0] for c in packp.normal]
        + ([] if lplan.fb_ids is None else [lplan.fb_ids])
    )
    assert sorted(set(ids)) == list(range(lplan.n_tiles))

    G = 128 // k
    assert B <= G
    x = rng.integers(0, 256, (B, pp.in_h, pp.in_w), dtype=np.uint8)
    want = np.asarray(remap_lane(lplan, jnp.asarray(x), interpret=True))
    c = np.concatenate([x, np.zeros((G - B,) + x.shape[1:], np.uint8)])
    c = np.concatenate([c] * k)  # duplicate into every lane group
    ct = jnp.transpose(jnp.asarray(c), (1, 2, 0))
    got = np.asarray(remap_lane_hwb_pack(packp, ct, interpret=True))
    assert got.shape[0] == G
    _assert_tie_flips_balanced(got[:B], want)


def test_pack2_matches_plain(rng):
    """Low-occupancy tile packing (K tiles per grid step, one per lane
    group) must match the plain lane kernel to 1 LSB — the merged
    contraction uses the same weights but its fused shape can resolve
    float rounding ties differently (~1e-5 of elements)."""
    for alg, layout in (
        (Interpolation.CUBIC, Layout.CUBEMAP_32),
        (Interpolation.LINEAR, Layout.BARREL),   # transparent border + pad
        (Interpolation.LANCZOS4, Layout.EQUIRECT),
    ):
        cfg = TransformConfig(
            output_layout=layout, interpolation_alg=alg, **MONO
        )
        out_wh = (160, 64) if layout == Layout.BARREL else (96, 64)
        plan = build_plan(cfg, 128, 64, out_wh[0], out_wh[1])
        pp = plan.luma
        lplan = build_lane_remap(pp.spec, pp.fill)
        _run_pack_case(rng, lplan, pp, 2, B=5)


def test_pack4_pack8_match_plain(rng):
    """The generalized pack factors (4 tiles / 8 tiles per step) agree
    with the plain kernel at their occupancy levels, including odd tail
    groups that repeat their last tile."""
    cfg = TransformConfig(interpolation_alg=Interpolation.CUBIC, **MONO)
    plan = build_plan(cfg, 128, 64, 96, 64)
    pp = plan.luma
    lplan = build_lane_remap(pp.spec, pp.fill)
    _run_pack_case(rng, lplan, pp, 4, B=25)
    _run_pack_case(rng, lplan, pp, 8, B=11)


def test_pack_pipeline_routing(rng):
    """The executor picks the largest fitting pack factor per batch
    (batch 12 -> K=8, 25 -> K=4, 60 -> K=2) and each output matches the
    plain lane path (LANE_PACK_MAX=1)."""
    from transform360_tpu import pipeline

    assert pipeline._pack_k_for_batch(12) == min(8, pipeline.LANE_PACK_MAX)
    cfg = TransformConfig(interpolation_alg=Interpolation.CUBIC, **MONO)
    plan = build_plan(cfg, 128, 64, 96, 64)
    old_pack, old_min = pipeline.LANE_PACK_MAX, pipeline.LANE_MIN_BATCH
    try:
        pipeline.LANE_MIN_BATCH = 1
        for B, want_k in ((12, 8), (25, 4), (60, 2)):
            x = rng.integers(
                0, 256, (B, plan.luma.in_h, plan.luma.in_w), np.uint8
            )
            pipeline.LANE_PACK_MAX = 8
            assert pipeline._pack_k_for_batch(B) == want_k
            pipeline.clear_executor_cache()
            prog = pipeline._plane_program(plan.luma, use_pallas=True,
                                           interpret=True)
            a = np.asarray(prog(jnp.asarray(x)))
            pipeline.clear_executor_cache()
            pipeline.LANE_PACK_MAX = 1
            prog = pipeline._plane_program(plan.luma, use_pallas=True,
                                           interpret=True)
            b = np.asarray(prog(jnp.asarray(x)))
            assert a.shape == (B, 64, 96)
            # same 1-LSB rounding-tie allowance as the pack parity tests
            _assert_tie_flips_balanced(a, b)
    finally:
        pipeline.LANE_PACK_MAX, pipeline.LANE_MIN_BATCH = old_pack, old_min
        pipeline.clear_executor_cache()


def _run_merged_case(rng, lplan, pp, k, B):
    from transform360_tpu.ops.remap_lane import (
        build_lane_merged,
        remap_lane_hwb_pack,
    )

    mp = build_lane_merged(lplan, k)
    assert mp is not None and mp.packs
    # every tile is covered exactly once by packs + normal leftovers + fb
    ids = np.concatenate(
        [pc.ids.reshape(-1) for pc in mp.packs]
        + [c.meta[0] for c in mp.normal]
        + ([] if lplan.fb_ids is None else [lplan.fb_ids])
    )
    assert sorted(set(ids)) == list(range(lplan.n_tiles))
    # rebased slot indices stay inside the merged window
    for pc in mp.packs:
        T = lplan.taps
        assert pc.idx[:, 0::3].min() >= 0
        assert pc.idx[:, 0::3].max() + T <= pc.win_h
        assert pc.idx[:, 1::3].min() >= 0
        assert pc.idx[:, 1::3].max() + 16 <= pc.win_w

    G = 128 // k
    assert B <= G
    x = rng.integers(0, 256, (B, pp.in_h, pp.in_w), dtype=np.uint8)
    want = np.asarray(remap_lane(lplan, jnp.asarray(x), interpret=True))
    c = np.concatenate([x, np.zeros((G - B,) + x.shape[1:], np.uint8)])
    c = np.concatenate([c] * k)
    ct = jnp.transpose(jnp.asarray(c), (1, 2, 0))
    got = np.asarray(remap_lane_hwb_pack(mp, ct, interpret=True))
    assert got.shape[0] == G
    _assert_tie_flips_balanced(got[:B], want)
    return mp


def test_merged_pack_matches_plain(rng):
    """The merged-window pack kernel (K spatial neighbors per step, ONE
    bounding-box window DMA) matches the plain lane kernel to 1 LSB for
    every pack factor, across interpolations and border modes."""
    cfg = TransformConfig(
        output_layout=Layout.BARREL,              # transparent border + pad
        interpolation_alg=Interpolation.LINEAR,
        **MONO,
    )
    plan = build_plan(cfg, 128, 64, 160, 64)
    pp = plan.luma
    lplan = build_lane_remap(pp.spec, pp.fill)
    _run_merged_case(rng, lplan, pp, 4, B=9)
    cfg = TransformConfig(interpolation_alg=Interpolation.CUBIC, **MONO)
    plan = build_plan(cfg, 128, 64, 96, 64)
    pp = plan.luma
    lplan = build_lane_remap(pp.spec, pp.fill)
    _run_merged_case(rng, lplan, pp, 2, B=5)
    _run_merged_case(rng, lplan, pp, 8, B=11)


def test_merged_pack_larger_plane_groups_stay_local(rng):
    """On a plane large enough for several window classes the merged plan
    still covers (almost) every tile, its windows respect the VMEM cap,
    and the kernel output matches the plain path."""
    from transform360_tpu.ops.remap_lane import (
        _WINDOW_BYTES_MAX,
        LANES,
    )

    cfg = TransformConfig(interpolation_alg=Interpolation.CUBIC, **MONO)
    plan = build_plan(cfg, 384, 192, 288, 192)
    pp = plan.luma
    lplan = build_lane_remap(pp.spec, pp.fill)
    mp = _run_merged_case(rng, lplan, pp, 4, B=7)
    merged = sum(pc.k * pc.n for pc in mp.packs)
    assert merged >= 0.8 * lplan.n_tiles, "merging should cover most tiles"
    for pc in mp.packs:
        nbuf = 2 if pc.double_buf else 1
        scale = nbuf + (4 if pc.unpack_f32 else 0)
        assert scale * pc.win_h * pc.win_w * LANES <= _WINDOW_BYTES_MAX


def test_small_batch_image_blur_routing(rng):
    """Below BLUR_IMG_MAX_BATCH the lane path prefilters in image layout
    (apply_blur) and must agree with the lane-layout blur pass (both are
    exact implementations of the same separable filter; only f32
    summation order differs)."""
    from transform360_tpu import pipeline

    cfg = TransformConfig(
        interpolation_alg=Interpolation.CUBIC,
        enable_low_pass_filter=True,
        width_scale_factor=0.5,
        height_scale_factor=0.5,
        **MONO,
    )
    plan = build_plan(cfg, 256, 128, 96, 64)
    pp = plan.luma
    assert pp.blur is not None, "config must engage the prefilter"
    B = 6
    x = rng.integers(0, 256, (B, pp.in_h, pp.in_w), np.uint8)
    old = (pipeline.LANE_MIN_BATCH, pipeline.BLUR_IMG_MAX_BATCH)
    try:
        pipeline.LANE_MIN_BATCH = 1
        outs = []
        for blur_img_max in (16, 0):
            pipeline.BLUR_IMG_MAX_BATCH = blur_img_max
            pipeline.clear_executor_cache()
            prog = pipeline._plane_program(pp, use_pallas=True,
                                           interpret=True)
            outs.append(np.asarray(prog(jnp.asarray(x))))
        # two DIFFERENT exact engines (the lane blur convolves y-first,
        # the XLA blur x-first), so rounding ties may resolve with a
        # slight systematic lean — bound the rate, not the direction
        signed = outs[0].astype(np.int16) - outs[1].astype(np.int16)
        assert np.abs(signed).max() <= 1
        assert np.mean(signed != 0) < 1e-3
    finally:
        pipeline.LANE_MIN_BATCH, pipeline.BLUR_IMG_MAX_BATCH = old
        pipeline.clear_executor_cache()


def test_circular_origin_rows_matches_scalar(rng):
    """The vectorized ring-origin (sort-based) must agree with the scalar
    unique-based definition, including duplicate values and ties."""
    from transform360_tpu.ops.remap_lane import _circular_origin_rows

    def scalar(vals, n):
        u = np.unique(vals)
        if u.size == 1:
            return int(u[0])
        gaps = np.diff(u)
        wrap_gap = int(u[0]) + n - int(u[-1])
        k = int(np.argmax(gaps))
        if gaps[k] > wrap_gap:
            return int(u[k + 1])
        return int(u[0])

    n = 96
    cases = [rng.integers(0, n, 17) for _ in range(200)]
    cases += [np.full(9, v) for v in (0, 5, n - 1)]          # constant rows
    cases += [np.array([0, 1, 2, n - 2, n - 1])]             # wrap arc
    cases += [np.array([10, 40, 70])]                        # tied gaps
    cases += [np.arange(n)]                                  # full ring
    width = max(c.size for c in cases)
    mat = np.stack([np.pad(c, (0, width - c.size), mode="edge") for c in cases])
    got = _circular_origin_rows(mat, n)
    for i, c in enumerate(cases):
        padded = np.pad(c, (0, width - c.size), mode="edge")
        assert got[i] == scalar(padded, n), (i, c)
