"""Driver-visible fidelity gate: PSNR vs the CPU oracle, cheap enough to
run inside every benchmark invocation.

Round-2 state was fps-only benches with PSNR evidence living in manually
run tools (tools/psnr_check.py) — a silent kernel regression would have
kept the bench green.  :func:`bench_fidelity` runs the flagship config at
a reduced size (the kernels and plan machinery are size-generic; the
oracle costs seconds instead of ~40 s at full 4K) and returns the
worst-plane PSNR, which bench.py emits alongside the fps number.

On a TPU backend the production Pallas kernels are exercised on ALL
production paths: both lane sub-paths (pack-K for low-occupancy batches,
and the plain padded kernel that the batch-128 headline uses), the
window-gather kernel at batch 1 — covering every window class (regular,
wide, tall-group, polar CLASS_P) AND the XLA-fallback patch, all present
in both planes at the gate size — and the latency-banded execution (two
model-balanced output row-bands,
:mod:`transform360_tpu.parallel.latency`).  On CPU the XLA gather path
runs throughout.  The reference behavior being checked is the full
filter pipeline (``VideoFrameTransform.cpp:707-794``: prefilter ->
cv::remap) via the declared golden oracle (:mod:`transform360_tpu.oracle`).

Beyond the flagship, the gate sweeps the full BASELINE parity surface at
the gate size (round-4 verdict: a stereo eye-split or lanczos tap-table
regression used to keep BENCH green): bilinear-no-LPF, the edge-1024
cubic analog (4x the output pixels), the 32x15 adaptive
``adjust_kernel`` prefilter, TB and LR stereo, plus one NEAREST and one
LANCZOS4 interpolator case — each on the default routing for the gate
batch, vs its own oracle run (reference option surface:
``vf_transform360.c:407-987``).  The reported ``worst_db`` is the
minimum across everything.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _video_like_planes(in_w: int, in_h: int):
    """Synthetic but smooth, video-like planes (pure noise would hide
    interpolation-weight bugs behind its flat spectrum)."""
    from .config import chroma_dims

    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:in_h, 0:in_w]
    y = np.clip(
        128 + 70 * np.sin(xx / 17.0) * np.cos(yy / 11.0)
        + 40 * np.sin((xx + 2 * yy) / 5.0) + rng.normal(0, 6, (in_h, in_w)),
        0, 255,
    ).astype(np.uint8)
    cw, ch = chroma_dims(in_w, in_h)
    u = np.clip(
        128 + 50 * np.sin(np.mgrid[0:ch, 0:cw][1] / 9.0), 0, 255
    ).astype(np.uint8)
    v = np.clip(
        128 + 50 * np.cos(np.mgrid[0:ch, 0:cw][0] / 7.0), 0, 255
    ).astype(np.uint8)
    return y, u, v


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float(10 * np.log10(255.0**2 / mse)) if mse else 99.0


def bench_fidelity(
    in_wh: Tuple[int, int] = (1920, 960),
    out_wh: Tuple[int, int] = (480, 320),
    batch: int = 12,
    parity_sweep: bool = True,
) -> Dict[str, float]:
    """Worst-plane PSNR of the production pipeline vs the oracle at the
    flagship config (cubic + adaptive prefilter), small size.

    Returns ``{"worst_db": x, "Y": ..., "U": ..., "V": ...}`` where the
    per-plane values are the minimum over the kernel paths exercised,
    plus per-config worst PSNRs under ``"configs"`` when
    ``parity_sweep`` is on (the BASELINE sweep; tests that inject bugs
    into one specific kernel family turn it off — the flagship part
    already exercises every kernel family).
    """
    from . import oracle, pipeline
    from .config import StereoFormat, TransformConfig
    from .pipeline import transform_batch
    from .plan import build_plan

    in_w, in_h = in_wh
    out_w, out_h = out_wh
    cfg = TransformConfig(
        input_stereo_format=StereoFormat.MONO,
        output_stereo_format=StereoFormat.MONO,
    )
    plan = build_plan(cfg, in_w, in_h, out_w, out_h)
    y, u, v = _video_like_planes(in_w, in_h)
    want = oracle.transform_frame_yuv420(cfg, (y, u, v), out_w, out_h)

    yb = np.broadcast_to(y, (batch,) + y.shape)
    ub = np.broadcast_to(u, (batch,) + u.shape)
    vb = np.broadcast_to(v, (batch,) + v.shape)

    # run the default routing for this batch AND (on kernel backends) the
    # plain lane kernel with tile-packing pinned off — the batch-128
    # headline path; a regression in either kernel family must flip the
    # gate red
    old_pack = pipeline.LANE_PACK_MAX
    pack_modes = (old_pack, 1) if old_pack > 1 else (1,)
    out: Dict[str, float] = {}

    def fold(got):
        for pname, g, w in zip("YUV", got, want):
            out[pname] = min(out.get(pname, np.inf), psnr(g, w))

    try:
        for pack in pack_modes:
            pipeline.LANE_PACK_MAX = pack
            fold(np.asarray(p[0]) for p in transform_batch(plan, yb, ub, vb))
    finally:
        pipeline.LANE_PACK_MAX = old_pack

    # batch 1 routes below LANE_MIN_BATCH: the window-gather kernel on
    # kernel backends (all four window classes AND the fallback patch
    # present at this size) — the path every latency-band execution runs on
    fold(
        np.asarray(p[0])
        for p in transform_batch(plan, yb[:1], ub[:1], vb[:1])
    )

    # latency-banded execution: two cost-model-balanced output row-bands
    # (parallel.latency band slicing + the fitted class-cost model)
    from .parallel.latency import transform_frame_banded

    fold(transform_frame_banded(plan, (y, u, v), n=2, row_costs="auto"))

    out["worst_db"] = min(out[p] for p in "YUV")
    if not parity_sweep:
        return out

    # ---- BASELINE parity sweep: the other four parity configs plus one
    # NEAREST and one LANCZOS4 case, each vs its own oracle run on the
    # default routing for the gate batch
    from .config import Interpolation

    mono = dict(
        input_stereo_format=StereoFormat.MONO,
        output_stereo_format=StereoFormat.MONO,
    )
    cases = [
        ("bilinear_nolpf", (out_w, out_h),
         dict(interpolation_alg=Interpolation.LINEAR,
              enable_low_pass_filter=0, **mono)),
        # the edge-1024 parity config scaled to the gate: 4x the output px
        ("cubic_big", (out_w * 2, out_h * 2), mono),
        ("adaptive_32x15", (out_w, out_h),
         dict(num_vertical_segments=32, num_horizontal_segments=15,
              adjust_kernel=1, **mono)),
        ("stereo_tb", (out_w, out_h),
         dict(input_stereo_format=StereoFormat.TB,
              output_stereo_format=StereoFormat.TB)),
        ("stereo_lr", (out_w, out_h),
         dict(input_stereo_format=StereoFormat.LR,
              output_stereo_format=StereoFormat.LR)),
        ("nearest", (out_w, out_h),
         dict(interpolation_alg=Interpolation.NEAREST, **mono)),
        ("lanczos4", (out_w, out_h),
         dict(interpolation_alg=Interpolation.LANCZOS4, **mono)),
    ]
    out["configs"] = {}
    for name, (ow, oh), kw in cases:
        ccfg = TransformConfig(**kw)
        cplan = build_plan(ccfg, in_w, in_h, ow, oh)
        cwant = oracle.transform_frame_yuv420(ccfg, (y, u, v), ow, oh)
        cgot = transform_batch(cplan, yb, ub, vb)
        db = min(
            psnr(np.asarray(g[0]), w) for g, w in zip(cgot, cwant)
        )
        out["configs"][name] = db
        out["worst_db"] = min(out["worst_db"], db)
    return out
