"""A/B the window-gather kernel's batch<=4 double-buffered window DMA.

CLASS_P/CLASS_T windows are double-buffered whenever the scratch fits
the VMEM budget (ops/remap_pallas._class_nbuf) — a change shipped in the
tall-group commit on a commit-message measurement only.  This probe
publishes the number: the batch-1 flagship frame is chain-timed with the
default policy and with single-buffered window DMA forced, same plan,
same process methodology as tools/probe_small_batch.py.

    python tools/probe_classp_dbuf.py        # both passes, one JSON line each
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

IN_W, IN_H = 3840, 2160


def main():
    from transform360_tpu import TransformConfig, build_plan, chroma_dims
    from transform360_tpu.config import StereoFormat
    from transform360_tpu.ops import remap_pallas as rp
    from transform360_tpu.utils.backend import ensure_device
    from transform360_tpu.utils.profiling import time_frame_step

    ensure_device()
    import jax

    import transform360_tpu.pipeline as pl

    cfg = TransformConfig(
        input_stereo_format=StereoFormat.MONO,
        output_stereo_format=StereoFormat.MONO,
    )
    plan = build_plan(cfg, IN_W, IN_H, 1536, 1024)

    rng = np.random.default_rng(0)
    cw, ch = chroma_dims(IN_W, IN_H)
    y = jax.device_put(rng.integers(0, 256, (1, IN_H, IN_W), dtype=np.uint8))
    u = jax.device_put(rng.integers(0, 256, (1, ch, cw), dtype=np.uint8))
    v = jax.device_put(rng.integers(0, 256, (1, ch, cw), dtype=np.uint8))

    real_nbuf = rp._class_nbuf
    for label, nbuf_fn in [
        ("default_double_buffered", real_nbuf),
        ("forced_single_buffered", lambda cls, batch: 1),
    ]:
        rp._class_nbuf = nbuf_fn
        pl.clear_executor_cache()
        sec = time_frame_step(plan, y, u, v, n_short=2, n_long=10)
        print(
            json.dumps(
                {
                    "pass": label,
                    "batch": 1,
                    "ms_per_frame": round(sec * 1e3, 2),
                    "fps": round(1 / sec, 1),
                }
            ),
            flush=True,
        )
    rp._class_nbuf = real_nbuf


if __name__ == "__main__":
    main()
