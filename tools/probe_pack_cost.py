"""Pack-K pass-cost probe: one full frame step per (batch, LANE_PACK_MAX).

A lane pass's cost is occupancy-independent (the grid serves every output
tile no matter how many lanes are real), so ONE measurement per pack
factor K characterizes the whole batch range that routes to it.  Pair
with tools/probe_small_batch.py (K=8 and window-gather at batch 1-8) to
build the routing table in docs/perf.md.

    python tools/probe_pack_cost.py 64:2 32:4    # (batch, pack_max) pairs

Prints one JSON line per case.
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

    cases = [tuple(int(v) for v in a.split(":")) for a in sys.argv[1:]]
    cases = cases or [(64, 2), (32, 4)]
    old_pack, old_min = pipeline.LANE_PACK_MAX, pipeline.LANE_MIN_BATCH
    try:
        pipeline.LANE_MIN_BATCH = 1  # force the lane path at any batch
        for b, kmax in cases:
            pipeline.LANE_PACK_MAX = kmax
            y = jax.device_put(
                rng.integers(0, 256, (b, IN_H, IN_W), dtype=np.uint8))
            u = jax.device_put(
                rng.integers(0, 256, (b, ch, cw), dtype=np.uint8))
            v = jax.device_put(
                rng.integers(0, 256, (b, ch, cw), dtype=np.uint8))
            sec = time_frame_step(plan, y, u, v, n_short=2, n_long=10)
            print(
                json.dumps(
                    {
                        "batch": b,
                        "lane_pack_max": kmax,
                        "pack_k": min(
                            pipeline._pack_k_for_batch(b), kmax),
                        "ms_per_batch": round(sec * 1e3, 2),
                        "ms_per_frame": round(sec * 1e3 / b, 2),
                        "fps_per_chip": round(b / sec, 1),
                    }
                ),
                flush=True,
            )
    finally:
        pipeline.LANE_PACK_MAX, pipeline.LANE_MIN_BATCH = old_pack, old_min


if __name__ == "__main__":
    main()
