"""Bands x frames-in-flight grid: the throughput/latency frontier of an
8-device slice at small batch.

The CLI's latency mode (``--latency-bands N --devices D``) bands each
frame over N devices and keeps D//N frames in flight (cli.py
frames_out_banded).  With one physical chip, the frontier is projected
from per-band chain timings exactly like tools/probe_latency_bands.py:
each grid point (n bands, g = D//n groups) has

    latency    ~= max(band_n) + broadcast_ms(n)
    throughput ~= g / max(band_n)

This answers the round-2 "batch-8 at 150 fps" question at the system
level: a user with 8 frames in flight on an 8-device v5e slice picks a
grid point instead of a single-chip batch-8 pass (measured honest
ceiling 84 fps, NOTES.md "Merged-window pack-K").

    python tools/probe_band_grid.py          # flagship, D=8, model edges
    python tools/probe_band_grid.py 4        # another slice size

Prints one JSON line per grid point.
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

IN_W, IN_H = 3840, 2160


def main():
    from transform360_tpu import TransformConfig, build_plan, chroma_dims
    from transform360_tpu.config import StereoFormat
    from transform360_tpu.parallel.latency import (
        band_plans,
        broadcast_ms,
        plan_row_costs,
    )
    from transform360_tpu.utils.backend import ensure_device
    from transform360_tpu.utils.profiling import time_frame_step

    ensure_device()
    import jax

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    d = int(args[0]) if args else 8
    cfg = TransformConfig(
        input_stereo_format=StereoFormat.MONO,
        output_stereo_format=StereoFormat.MONO,
    )
    plan = build_plan(cfg, IN_W, IN_H, 1536, 1024)
    row_costs = plan_row_costs(plan)

    rng = np.random.default_rng(0)
    cw, ch = chroma_dims(IN_W, IN_H)
    y = jax.device_put(rng.integers(0, 256, (1, IN_H, IN_W), dtype=np.uint8))
    u = jax.device_put(rng.integers(0, 256, (1, ch, cw), dtype=np.uint8))
    v = jax.device_put(rng.integers(0, 256, (1, ch, cw), dtype=np.uint8))

    n = 1
    while n <= d:
        bands = band_plans(plan, n, row_costs=None if n == 1 else row_costs)
        times = [
            time_frame_step(b, y, u, v, n_short=2, n_long=10) for b in bands
        ]
        mx = max(times)
        bcast = broadcast_ms(plan, IN_W, IN_H, n)
        g = d // n
        lat_ms = mx * 1e3 + bcast
        print(
            json.dumps(
                {
                    "bands": n,
                    "groups": g,
                    "max_band_ms": round(mx * 1e3, 2),
                    "sum_bands_ms": round(sum(times) * 1e3, 2),
                    "broadcast_ms": round(bcast, 2),
                    "frame_latency_ms": round(lat_ms, 2),
                    "projected_fps_on_slice": round(g / (mx + bcast / 1e3), 1),
                    "note": f"{d}-device slice, {g} frame(s) in flight, "
                    "model band edges; single-chip projection",
                }
            ),
            flush=True,
        )
        n *= 2


if __name__ == "__main__":
    main()
