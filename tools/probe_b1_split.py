"""Batch-1 latency split: how much of the 54.6 ms frame is the blur?

The window-gather path (batch < LANE_MIN_BATCH) runs the XLA separable
blur (filtering.apply_blur) on the f32 plane before the remap kernel.
Timing the same cubic config with the low-pass filter disabled isolates
the remap+misc share; the difference is the blur's cost at batch 1.

    python tools/probe_b1_split.py        # batch 1
    python tools/probe_b1_split.py 4      # another batch

Prints one JSON line per (lpf, batch).
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

IN_W, IN_H = 3840, 2160


def main():
    from transform360_tpu import TransformConfig, build_plan, chroma_dims
    from transform360_tpu.config import StereoFormat
    from transform360_tpu.utils.backend import ensure_device
    from transform360_tpu.utils.profiling import time_frame_step

    ensure_device()
    import jax

    batches = [int(a) for a in sys.argv[1:]] or [1]
    rng = np.random.default_rng(0)
    cw, ch = chroma_dims(IN_W, IN_H)
    for b in batches:
        y = jax.device_put(
            rng.integers(0, 256, (b, IN_H, IN_W), dtype=np.uint8))
        u = jax.device_put(
            rng.integers(0, 256, (b, ch, cw), dtype=np.uint8))
        v = jax.device_put(
            rng.integers(0, 256, (b, ch, cw), dtype=np.uint8))
        res = {}
        for lpf in (1, 0):
            cfg = TransformConfig(
                input_stereo_format=StereoFormat.MONO,
                output_stereo_format=StereoFormat.MONO,
                enable_low_pass_filter=lpf,
            )
            plan = build_plan(cfg, IN_W, IN_H, 1536, 1024)
            sec = time_frame_step(plan, y, u, v, n_short=2, n_long=10)
            res[lpf] = sec
            print(
                json.dumps(
                    {
                        "batch": b,
                        "lpf": lpf,
                        "ms_per_batch": round(sec * 1e3, 2),
                        "fps_per_chip": round(b / sec, 1),
                    }
                ),
                flush=True,
            )
        print(
            json.dumps(
                {
                    "batch": b,
                    "blur_ms": round((res[1] - res[0]) * 1e3, 2),
                    "blur_share": round(1 - res[0] / res[1], 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
