"""Throughput of the high-bit-depth (XLA-path) pipeline on chip.

Deep formats (yuv420p10le etc.) run the portable XLA compute path — the
uint8-specialized Pallas kernels do not serve them — so their cost is
the honest price of >8-bit processing.  This times the flagship
geometry (4K -> 1536x1024 cubic + adaptive prefilter) at yuv420p10le
with the same chain methodology as the 8-bit ladder probes.

    python tools/probe_deep_fps.py [batch]
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

IN_W, IN_H = 3840, 2160


def main():
    from transform360_tpu import TransformConfig, build_plan
    from transform360_tpu.config import StereoFormat, chroma_dims
    from transform360_tpu.utils.backend import ensure_device
    from transform360_tpu.utils.profiling import time_frame_step

    ensure_device()
    import jax

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cfg = TransformConfig(
        input_stereo_format=StereoFormat.MONO,
        output_stereo_format=StereoFormat.MONO,
    )
    plan = build_plan(cfg, IN_W, IN_H, 1536, 1024, "yuv420p10le")
    rng = np.random.default_rng(0)
    cw, ch = chroma_dims(IN_W, IN_H)
    y = jax.device_put(
        rng.integers(0, 1024, (b, IN_H, IN_W), dtype=np.uint16))
    u = jax.device_put(rng.integers(0, 1024, (b, ch, cw), dtype=np.uint16))
    v = jax.device_put(rng.integers(0, 1024, (b, ch, cw), dtype=np.uint16))
    sec = time_frame_step(plan, y, u, v, n_short=2, n_long=6)
    print(
        json.dumps(
            {
                "pix_fmt": "yuv420p10le",
                "path": "xla",
                "batch": b,
                "ms_per_batch": round(sec * 1e3, 1),
                "ms_per_frame": round(sec * 1e3 / b, 2),
                "fps_per_chip": round(b / sec, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
