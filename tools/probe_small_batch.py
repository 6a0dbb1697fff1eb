"""Small-batch routing probe: lane+pack-K vs window-gather, on chip.

The reference's real operating mode is one frame per ``filter_frame`` call
(/root/reference/Transform360/vf_transform360.c:338-402), so batch 1-8
latency is the streaming-user number.  Round 2 routed batch <= 8 to the
window-gather kernel (the lane pass then cost a full 128-lane pass).  The
pack-K lane kernel changes that math: a K-packed pass costs ~1/K of the
full pass, so the lane path may now win all the way down to batch 1.

For each batch in {1, 2, 4, 8} this times the full 3-plane frame step on
BOTH paths by overriding pipeline.LANE_MIN_BATCH in-process (the executor
caches key on it, so each override traces a fresh program):

    python tools/probe_small_batch.py            # flagship config
    python tools/probe_small_batch.py 8          # one batch size

Prints one JSON line per (batch, path).
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

IN_W, IN_H = 3840, 2160


def main():
    from transform360_tpu import TransformConfig, build_plan, chroma_dims
    from transform360_tpu import pipeline
    from transform360_tpu.config import StereoFormat
    from transform360_tpu.utils.backend import ensure_device
    from transform360_tpu.utils.profiling import time_frame_step

    ensure_device()
    import jax

    cfg = TransformConfig(
        input_stereo_format=StereoFormat.MONO,
        output_stereo_format=StereoFormat.MONO,
    )
    plan = build_plan(cfg, IN_W, IN_H, 1536, 1024)
    rng = np.random.default_rng(0)
    cw, ch = chroma_dims(IN_W, IN_H)

    batches = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    old = pipeline.LANE_MIN_BATCH
    try:
        for b in batches:
            y = jax.device_put(
                rng.integers(0, 256, (b, IN_H, IN_W), dtype=np.uint8))
            u = jax.device_put(
                rng.integers(0, 256, (b, ch, cw), dtype=np.uint8))
            v = jax.device_put(
                rng.integers(0, 256, (b, ch, cw), dtype=np.uint8))
            for path, minb in (("lane_pack", 1), ("window_gather", b + 1)):
                pipeline.LANE_MIN_BATCH = minb
                sec = time_frame_step(plan, y, u, v, n_short=2, n_long=10)
                print(
                    json.dumps(
                        {
                            "batch": b,
                            "path": path,
                            "pack_k": pipeline._pack_k_for_batch(b)
                            if path == "lane_pack" else None,
                            "ms_per_batch": round(sec * 1e3, 2),
                            "ms_per_frame": round(sec * 1e3 / b, 2),
                            "fps_per_chip": round(b / sec, 1),
                        }
                    ),
                    flush=True,
                )
    finally:
        pipeline.LANE_MIN_BATCH = old


if __name__ == "__main__":
    main()
