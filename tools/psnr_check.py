"""Real-chip fidelity check: full-size flagship config vs the OpenCV oracle.

Runs the production TPU pipeline (Pallas kernel path) on a synthetic but
video-like 4K frame and reports per-plane PSNR against the oracle pipeline
(the reference's own primitives).  The BASELINE.json bar is >= 50 dB.
"""

import json
import sys

import numpy as np


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

    results = {}
    for name, kw in [
        ("default_cubic_lpf", dict()),
        ("bilinear_nolpf", dict(interpolation_alg=Interpolation.LINEAR,
                                enable_low_pass_filter=0)),
    ]:
        cfg = TransformConfig(
            input_stereo_format=StereoFormat.MONO,
            output_stereo_format=StereoFormat.MONO,
            **kw,
        )
        plan = build_plan(cfg, IN_W, IN_H, OUT_W, OUT_H)
        got = transform_batch(plan, y, u, v)
        got = [np.asarray(g) for g in got]
        want = oracle.transform_frame_yuv420(cfg, (y, u, v), OUT_W, OUT_H)
        db = {}
        for pname, g, w in zip("YUV", got, want):
            mse = np.mean((g.astype(np.float64) - w.astype(np.float64)) ** 2)
            db[pname] = round(10 * np.log10(255.0**2 / mse), 2) if mse else 99.0
        results[name] = db
        print(json.dumps({"config": name, "psnr_db": db,
                          "backend": jax.default_backend()}), flush=True)

    worst = min(min(d.values()) for d in results.values())
    print(json.dumps({"worst_psnr_db": worst, "pass_50db": bool(worst >= 50.0)}))
    return 0 if worst >= 50.0 else 1


if __name__ == "__main__":
    sys.exit(main())
