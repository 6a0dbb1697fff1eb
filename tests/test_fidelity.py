"""The bench fidelity gate (fidelity.bench_fidelity) must pass on a
healthy pipeline and flip red under a deliberately injected kernel bug —
proving a silent kernel regression cannot keep BENCH green."""

import numpy as np

from transform360_tpu import pipeline, sampling
from transform360_tpu.fidelity import bench_fidelity
from transform360_tpu.plan import clear_plan_cache


def _reset_caches():
    pipeline.clear_executor_cache()
    clear_plan_cache()


def test_gate_green_then_red_on_injected_tap_bug(monkeypatch):
    # small size keeps the oracle fast; routing on CPU is the XLA path,
    # whose taps come from the same _tap_weights the kernel plans use
    kw = dict(in_wh=(512, 256), out_wh=(192, 128), batch=2)
    _reset_caches()
    healthy = bench_fidelity(**kw)
    assert healthy["worst_db"] >= 50.0, healthy

    # inject a 1-tap weight bug: perturb the dominant cubic tap by 2%
    real = sampling._tap_weights

    def buggy(interp, f, xp=None, **kwargs):
        ws = real(interp, f, xp) if xp is not None else real(interp, f)
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
