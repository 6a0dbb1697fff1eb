"""Per-band device time for single-frame latency sharding (one real chip).

parallel.latency splits one frame's output rows into N band plans, one
per device.  With only one physical chip available, the pod-slice latency
is projected from per-band measurements: each band program is timed
separately (chain-difference), and the frame latency on an N-device
slice is max(band) + the input broadcast + tiny band readbacks.  The
duplicated full-input blur is NOT a caveat at batch 1 — it measures
0.25 ms of the 54.5 ms frame (tools/probe_b1_split.py).

    python tools/probe_latency_bands.py            # flagship, 8 bands
    python tools/probe_latency_bands.py 4          # other band count
    python tools/probe_latency_bands.py 8 --balance  # re-band at the
        # equal-cost quantiles of the measured profile and re-time
    python tools/probe_latency_bands.py 8 --model --skip-uniform
        # band at the fitted window-class model's edges
        # (parallel.latency.plan_row_costs — what the CLI uses) and time

Prints one JSON line per band plus a summary line per pass.
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

IN_W, IN_H = 3840, 2160


def time_bands(bands, y, u, v, label):
    from transform360_tpu.utils.profiling import time_frame_step

    times = []
    for i, band in enumerate(bands):
        sec = time_frame_step(band, y, u, v, n_short=2, n_long=10)
        times.append(sec)
        print(
            json.dumps(
                {
                    "pass": label,
                    "band": i,
                    "rows": band.luma.out_h,
                    "ms": round(sec * 1e3, 2),
                }
            ),
            flush=True,
        )
    mx = max(times)
    print(
        json.dumps(
            {
                "pass": label,
                "n_bands": len(bands),
                "max_band_ms": round(mx * 1e3, 2),
                "sum_bands_ms": round(sum(times) * 1e3, 2),
                "projected_fps_on_slice": round(1 / mx, 1),
                "note": "frame latency on an n-device slice ~= max band "
                "+ input broadcast; single-chip projection",
            }
        ),
        flush=True,
    )
    return times


def main():
    from transform360_tpu import TransformConfig, build_plan, chroma_dims
    from transform360_tpu.config import StereoFormat
    from transform360_tpu.parallel.latency import band_plans
    from transform360_tpu.utils.backend import ensure_device

    ensure_device()
    import jax

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 8
    cfg = TransformConfig(
        input_stereo_format=StereoFormat.MONO,
        output_stereo_format=StereoFormat.MONO,
    )
    plan = build_plan(cfg, IN_W, IN_H, 1536, 1024)
    bands = band_plans(plan, n)

    rng = np.random.default_rng(0)
    cw, ch = chroma_dims(IN_W, IN_H)
    y = jax.device_put(rng.integers(0, 256, (1, IN_H, IN_W), dtype=np.uint8))
    u = jax.device_put(rng.integers(0, 256, (1, ch, cw), dtype=np.uint8))
    v = jax.device_put(rng.integers(0, 256, (1, ch, cw), dtype=np.uint8))

    if "--skip-uniform" not in sys.argv:
        times = time_bands(bands, y, u, v, "uniform")

        if "--balance" in sys.argv:
            # spread each measured band time uniformly over its rows -> a
            # piecewise-constant per-row cost profile -> equal-cost edges
            row_costs = np.concatenate(
                [np.full(b.luma.out_h, t / b.luma.out_h)
                 for b, t in zip(bands, times)]
            )
            balanced = band_plans(plan, n, row_costs=row_costs)
            time_bands(balanced, y, u, v, "balanced")

    if "--model" in sys.argv:
        # the fitted window-class cost model (row-level resolution —
        # finer than a measured per-band profile); the CLI's default
        from transform360_tpu.parallel.latency import plan_row_costs

        modeled = band_plans(plan, n, row_costs=plan_row_costs(plan))
        time_bands(modeled, y, u, v, "model")


if __name__ == "__main__":
    main()
