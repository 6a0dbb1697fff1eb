"""The bench fidelity gate (fidelity.bench_fidelity) must pass on a
healthy pipeline and flip red under a deliberately injected kernel bug —
proving a silent kernel regression cannot keep BENCH green."""

import dataclasses

import numpy as np

from transform360_tpu import pipeline, sampling
from transform360_tpu.fidelity import bench_fidelity
from transform360_tpu.parallel import latency
from transform360_tpu.plan import clear_plan_cache


def _reset_caches():
    pipeline.clear_executor_cache()
    latency.clear_band_caches()
    clear_plan_cache()


def test_gate_green_then_red_on_injected_tap_bug(monkeypatch):
    # small size keeps the oracle fast; routing on CPU is the XLA path,
    # whose taps come from the same _tap_weights the kernel plans use
    kw = dict(in_wh=(512, 256), out_wh=(192, 128), batch=2)
    _reset_caches()
    healthy = bench_fidelity(**kw)
    assert healthy["worst_db"] >= 50.0, healthy

    # inject a 1-tap weight bug: perturb the dominant cubic tap by 2%
    # (scoped to CUBIC — the gate also sweeps NEAREST, whose tap list
    # has a single entry)
    from transform360_tpu.config import Interpolation

    real = sampling._tap_weights

    def buggy(interp, f, xp=None, **kwargs):
        ws = real(interp, f, xp) if xp is not None else real(interp, f)
        if interp == Interpolation.CUBIC:
            ws[1] = ws[1] * 1.02
        return ws

    monkeypatch.setattr(sampling, "_tap_weights", buggy)
    _reset_caches()
    try:
        broken = bench_fidelity(**kw)
    finally:
        _reset_caches()
    assert broken["worst_db"] < 50.0, (
        f"injected tap bug not detected: {broken}"
    )
    _reset_caches()


def test_gate_red_on_injected_stereo_offset_bug(monkeypatch):
    """A bug confined to the stereo eye split (the input-eye re-pack of
    VideoFrameTransform.cpp:1279-1300) must flip the gate red via the
    TB/LR parity cases — the flagship is MONO and stays green, which is
    exactly why the gate must sweep the stereo configs."""
    from transform360_tpu import geometry

    kw = dict(in_wh=(512, 256), out_wh=(192, 128), batch=2)
    _reset_caches()
    healthy = bench_fidelity(**kw)
    assert healthy["worst_db"] >= 50.0, healthy

    # inject: the second eye's map rows sample 2 px below where the eye
    # split puts them — only stereo input configs read this offset
    real = geometry.build_warp_map

    def buggy(cfg, in_w, in_h, ow, oh):
        from transform360_tpu.config import StereoFormat

        m = np.array(real(cfg, in_w, in_h, ow, oh))
        if cfg.input_stereo_format == StereoFormat.TB:
            m[..., 1] = np.where(m[..., 1] >= in_h / 2, m[..., 1] + 2.0,
                                 m[..., 1])
        elif cfg.input_stereo_format == StereoFormat.LR:
            m[..., 0] = np.where(m[..., 0] >= in_w / 2, m[..., 0] + 2.0,
                                 m[..., 0])
        return m

    monkeypatch.setattr(geometry, "build_warp_map", buggy)
    _reset_caches()
    try:
        broken = bench_fidelity(**kw)
    finally:
        _reset_caches()
    assert broken["Y"] >= 50.0, "flagship (MONO) should stay green"
    assert min(broken["configs"]["stereo_tb"],
               broken["configs"]["stereo_lr"]) < 50.0, broken
    assert broken["worst_db"] < 50.0, (
        f"injected stereo-offset bug not detected: {broken}"
    )


def test_gate_red_on_injected_lanczos_weight_bug(monkeypatch):
    """A bug confined to the LANCZOS4 tap table must flip the gate red
    via the lanczos4 parity case — the flagship is CUBIC and stays
    green, which is why the gate must sweep the other interpolators."""
    from transform360_tpu import sampling

    kw = dict(in_wh=(512, 256), out_wh=(192, 128), batch=2)
    _reset_caches()
    healthy = bench_fidelity(**kw)
    assert healthy["worst_db"] >= 50.0, healthy

    from transform360_tpu.config import Interpolation

    real = sampling._tap_weights

    def buggy(interp, f, xp=None, **kwargs):
        ws = real(interp, f, xp) if xp is not None else real(interp, f)
        if interp == Interpolation.LANCZOS4:
            ws[3] = ws[3] * 1.02  # perturb a dominant 8-tap weight
        return ws

    monkeypatch.setattr(sampling, "_tap_weights", buggy)
    _reset_caches()
    try:
        broken = bench_fidelity(**kw)
    finally:
        _reset_caches()
    assert broken["Y"] >= 50.0, "flagship (CUBIC) should stay green"
    assert broken["configs"]["lanczos4"] < 50.0, broken
    assert broken["worst_db"] < 50.0, (
        f"injected lanczos tap bug not detected: {broken}"
    )


def test_gate_red_on_injected_window_kernel_bug(monkeypatch):
    """A bug confined to the window-gather kernel (the batch<8 path and
    the engine under every latency-band execution) must flip the gate
    red.  On this CPU box the pipeline would route everything to XLA, so
    the routing/interpret knobs are forced: the Pallas window kernel runs
    in interpret mode, which executes the exact kernel body."""
    from transform360_tpu.ops import remap_pallas as rp

    kw = dict(in_wh=(512, 256), out_wh=(192, 128), batch=2,
              parity_sweep=False)

    monkeypatch.setattr(
        pipeline, "_use_pallas", lambda pp: rp.pallas_eligible(pp.spec)
    )
    real_prog = pipeline._plane_program

    def interpreted(pp, use_pallas, interpret=False):
        return real_prog(pp, use_pallas, interpret=True)

    monkeypatch.setattr(pipeline, "_plane_program", interpreted)

    _reset_caches()
    healthy = bench_fidelity(**kw)
    assert healthy["worst_db"] >= 50.0, healthy

    # inject: scale one window class's x-tap weights by 2% — plan data
    # that ONLY the window-gather kernel reads (the XLA path and the lane
    # kernels never touch PallasRemapPlan)
    real_build = rp.build_pallas_remap

    def buggy(spec, fill):
        plan = real_build(spec, fill)
        if plan is None or not plan.classes:
            return plan
        c0 = dataclasses.replace(
            plan.classes[0], wx=plan.classes[0].wx * 1.02
        )
        return dataclasses.replace(plan, classes=(c0,) + plan.classes[1:])

    monkeypatch.setattr(rp, "build_pallas_remap", buggy)
    _reset_caches()
    try:
        broken = bench_fidelity(**kw)
    finally:
        _reset_caches()
    assert broken["worst_db"] < 50.0, (
        f"injected window-kernel bug not detected: {broken}"
    )


def test_gate_red_on_injected_merged_pack_bug(monkeypatch):
    """A bug confined to the merged-window pack kernel (the default
    low-occupancy lane path) must flip the gate red.  Routing is forced
    onto the lane path at the gate's small batch and the Pallas kernels
    run in interpret mode (exact kernel body) on this CPU box."""
    from transform360_tpu.ops import remap_lane as rl

    kw = dict(in_wh=(512, 256), out_wh=(192, 128), batch=2,
              parity_sweep=False)

    monkeypatch.setattr(pipeline, "_use_pallas", lambda pp: True)
    monkeypatch.setattr(pipeline, "LANE_MIN_BATCH", 1)
    real_prog = pipeline._plane_program

    def interpreted(pp, use_pallas, interpret=False):
        return real_prog(pp, use_pallas, interpret=True)

    monkeypatch.setattr(pipeline, "_plane_program", interpreted)

    _reset_caches()
    healthy = bench_fidelity(**kw)
    assert healthy["worst_db"] >= 50.0, healthy

    # inject: scale one merged class's y-tap/bias block by 2% — plan data
    # that ONLY the merged-window kernel reads
    real_build = rl.build_lane_merged

    def buggy(plan, k):
        mp = real_build(plan, k)
        if mp is None or not mp.packs:
            return mp
        p0 = dataclasses.replace(mp.packs[0], wyb=mp.packs[0].wyb * 1.02)
        return dataclasses.replace(mp, packs=(p0,) + mp.packs[1:])

    monkeypatch.setattr(rl, "build_lane_merged", buggy)
    monkeypatch.setattr(pipeline, "build_lane_merged", buggy)
    _reset_caches()
    try:
        broken = bench_fidelity(**kw)
    finally:
        _reset_caches()
    assert broken["worst_db"] < 50.0, (
        f"injected merged-pack bug not detected: {broken}"
    )
