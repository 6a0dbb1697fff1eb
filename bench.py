"""Headline benchmark: 3840x2160 equirect -> 512px CUBEMAP_32, frames/sec/chip.

BASELINE.json north star: >= 1000 fps/chip on TPU v5e at >= 50 dB PSNR vs
the reference cv::remap pipeline.  Runs the full default-quality pipeline
(cubic interpolation + adaptive low-pass prefilter, the reference filter's
defaults) on the real chip, steady-state, batch-resident in HBM.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from transform360_tpu import TransformConfig, build_plan, chroma_dims
    from transform360_tpu.config import Interpolation, StereoFormat
    from transform360_tpu.pipeline import _frame_step, device_put_plan

    IN_W, IN_H = 3840, 2160
    EDGE = 512
    OUT_W, OUT_H = EDGE * 3, EDGE * 2
    BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    BASELINE_FPS = 1000.0

    cfg = TransformConfig(
        input_stereo_format=StereoFormat.MONO,
        output_stereo_format=StereoFormat.MONO,
        interpolation_alg=Interpolation.CUBIC,
        enable_low_pass_filter=1,
    )
    plan = device_put_plan(build_plan(cfg, IN_W, IN_H, OUT_W, OUT_H))

    rng = np.random.default_rng(0)
    cw, ch = chroma_dims(IN_W, IN_H)
    y = jax.device_put(rng.integers(0, 256, (BATCH, IN_H, IN_W), dtype=np.uint8))
    u = jax.device_put(rng.integers(0, 256, (BATCH, ch, cw), dtype=np.uint8))
    v = jax.device_put(rng.integers(0, 256, (BATCH, ch, cw), dtype=np.uint8))

    # compile + warmup
    out = _frame_step(plan, y, u, v)
    jax.block_until_ready(out)

    # Timing chains each step on the previous output so every dispatch is
    # unique — the serving runtime dedups identical repeated dispatches,
    # which would otherwise make repeated-same-input loops measure ~0.
    iters = 8
    best = float("inf")
    for k in range(3):
        yy, uu, vv = y + k, u + k, v + k
        jax.block_until_ready((yy, uu, vv))
        t0 = time.perf_counter()
        for _ in range(iters):
            oy, ou, ov = _frame_step(plan, yy, uu, vv)
            d = oy[0, 0, 0]  # chain on the output to serialize + de-dup
            yy = yy + d
            uu = uu + d
            vv = vv + d
        jax.block_until_ready((yy, uu, vv))
        best = min(best, (time.perf_counter() - t0) / iters)

    fps = BATCH / best
    print(
        json.dumps(
            {
                "metric": "4k_equirect_to_cubemap512_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / BASELINE_FPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
