"""Real-chip fidelity check: full-size flagship config vs the OpenCV oracle.

Runs the production TPU pipeline (Pallas kernel path) on a synthetic but
video-like 4K frame and reports per-plane PSNR against the oracle pipeline
(the reference's own primitives).  The BASELINE.json bar is >= 50 dB.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from transform360_tpu import TransformConfig, build_plan, chroma_dims
    from transform360_tpu.config import Interpolation, StereoFormat
    from transform360_tpu import oracle
    from transform360_tpu.pipeline import transform_batch

    IN_W, IN_H = 3840, 2160
    OUT_W, OUT_H = 1536, 1024

    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:IN_H, 0:IN_W]
    y = np.clip(
        128 + 70 * np.sin(xx / 17.0) * np.cos(yy / 11.0)
        + 40 * np.sin((xx + 2 * yy) / 5.0) + rng.normal(0, 6, (IN_H, IN_W)),
        0, 255,
    ).astype(np.uint8)
    cw, ch = chroma_dims(IN_W, IN_H)
    u = np.clip(128 + 50 * np.sin(np.mgrid[0:ch, 0:cw][1] / 9.0), 0, 255).astype(np.uint8)
    v = np.clip(128 + 50 * np.cos(np.mgrid[0:ch, 0:cw][0] / 7.0), 0, 255).astype(np.uint8)

    # the five BASELINE.json parity configs (plus the flagship default):
    # 1 mono bilinear edge-512, 2 cubic edge-1024, 3 adaptive 32x15
    # prefilter, 4 TB / LR stereo, 5 batched stream (checked below)
    mono = dict(input_stereo_format=StereoFormat.MONO,
                output_stereo_format=StereoFormat.MONO)
    cases = [
        ("default_cubic_lpf", (OUT_W, OUT_H), mono),
        ("bilinear_nolpf_512", (OUT_W, OUT_H),
         dict(interpolation_alg=Interpolation.LINEAR,
              enable_low_pass_filter=0, **mono)),
        ("cubic_edge1024", (3072, 2048), mono),
        ("adaptive_32x15", (OUT_W, OUT_H),
         dict(num_vertical_segments=32, num_horizontal_segments=15,
              adjust_kernel=1, **mono)),
        ("stereo_tb", (OUT_W, OUT_H),
         dict(input_stereo_format=StereoFormat.TB,
              output_stereo_format=StereoFormat.TB)),
        ("stereo_lr", (OUT_W, OUT_H),
         dict(input_stereo_format=StereoFormat.LR,
              output_stereo_format=StereoFormat.LR)),
    ]
    if len(sys.argv) > 1:
        keep = set(sys.argv[1].split(","))
        unknown = keep - {c[0] for c in cases}
        if unknown:
            raise SystemExit(f"unknown config name(s): {sorted(unknown)}")
        cases = [c for c in cases if c[0] in keep]

    # measure BOTH production kernel paths explicitly (batch routing would
    # otherwise hide one: a batch-1 run only exercises the window-gather
    # kernel, which once masked a lane-blur precision regression)
    import transform360_tpu.pipeline as pl

    orig_lane_min = pl.LANE_MIN_BATCH
    paths = [("lane", 1), ("window_gather", 10**9)]
    if len(sys.argv) > 2 and sys.argv[2] in ("lane", "window_gather"):
        paths = [p for p in paths if p[0] == sys.argv[2]]

    results = {}
    for name, (ow, oh), kw in cases:
        cfg = TransformConfig(**kw)
        plan = build_plan(cfg, IN_W, IN_H, ow, oh)
        want = oracle.transform_frame_yuv420(cfg, (y, u, v), ow, oh)
        for path, lane_min in paths:
            pl.LANE_MIN_BATCH = lane_min
            got = [np.asarray(g) for g in transform_batch(plan, y, u, v)]
            db = {}
            for pname, g, w in zip("YUV", got, want):
                mse = np.mean(
                    (g.astype(np.float64) - w.astype(np.float64)) ** 2
                )
                db[pname] = (
                    round(10 * np.log10(255.0**2 / mse), 2) if mse else 99.0
                )
            results[(name, path)] = db
            print(json.dumps({"config": name, "path": path, "psnr_db": db,
                              "backend": jax.default_backend()}), flush=True)
    pl.LANE_MIN_BATCH = orig_lane_min

    # config 5: batched stream — batch output must equal per-frame output
    # (byte equality holds within a kernel path, so check each path with
    # its routing pinned for both the batched and the single-frame run)
    cfg = TransformConfig(**mono)
    plan = build_plan(cfg, IN_W, IN_H, OUT_W, OUT_H)
    yb = np.stack([y, np.roll(y, 13, axis=1), np.roll(y, -9, axis=0)])
    ub = np.stack([u, np.roll(u, 5, axis=1), np.roll(u, -3, axis=0)])
    vb = np.stack([v, np.roll(v, 2, axis=1), np.roll(v, -7, axis=0)])
    batch_ok = True
    for path, lane_min in paths:
        pl.LANE_MIN_BATCH = lane_min
        gb = [np.asarray(p) for p in transform_batch(plan, yb, ub, vb)]
        g1 = [np.asarray(p) for p in transform_batch(plan, yb[1], ub[1], vb[1])]
        ok = all(np.array_equal(b[1], s) for b, s in zip(gb, g1))
        batch_ok = batch_ok and ok
        print(json.dumps({"config": "batched_stream", "path": path,
                          "batch_matches_single": bool(ok)}), flush=True)
    pl.LANE_MIN_BATCH = orig_lane_min

    worst = min(min(d.values()) for d in results.values())
    ok = worst >= 50.0 and batch_ok
    print(json.dumps({"worst_psnr_db": worst, "pass_50db": bool(ok)}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
