"""Headline benchmark: 3840x2160 equirect -> 512px CUBEMAP_32, frames/sec/chip.

BASELINE.json north star: >= 1000 fps/chip on TPU v5e at >= 50 dB PSNR vs
the reference cv::remap pipeline.  Runs the full default-quality pipeline
(cubic interpolation + adaptive low-pass prefilter, the reference filter's
defaults) on the real chip, steady-state, batch-resident in HBM.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys

import numpy as np


def main():
    import jax

    from transform360_tpu.utils.backend import ensure_device

    ensure_device()

    from transform360_tpu import TransformConfig, build_plan, chroma_dims
    from transform360_tpu.config import Interpolation, StereoFormat
    from transform360_tpu.pipeline import device_put_plan

    IN_W, IN_H = 3840, 2160
    EDGE = 512
    OUT_W, OUT_H = EDGE * 3, EDGE * 2
    # batch 128 engages the lane-batched remap kernel (frames in vector
    # lanes) — the offline-transcode sweet spot; override via argv[1].
    BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
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

    # Timing methodology for the remote-tunnel backend: per-dispatch and
    # eager-op overheads are large (hundreds of ms), so the whole chain of
    # steps runs inside ONE jitted program — each step consumes the
    # previous step's output (serialized on device, dedup-proof), and the
    # per-step time comes from the difference between two chain lengths.
    # Plan arrays are hoisted into runtime arguments (ops/staging.py), so
    # the chained program's HLO stays small for any plan size.
    from transform360_tpu.utils.profiling import time_frame_step

    best = time_frame_step(plan, y, u, v, n_short=2, n_long=26)
    fps = BATCH / best

    # fidelity gate: worst-plane PSNR vs the CPU oracle at a reduced size
    # (same flagship config, same production kernels — a silent kernel
    # regression flips this red even while the fps number stays green)
    from transform360_tpu.fidelity import bench_fidelity

    fid = bench_fidelity()
    print(
        json.dumps(
            {
                "metric": "4k_equirect_to_cubemap512_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / BASELINE_FPS, 4),
                "psnr_vs_oracle_db": round(fid["worst_db"], 2),
                "psnr_pass_50db": bool(fid["worst_db"] >= 50.0),
            }
        )
    )


if __name__ == "__main__":
    main()
