"""Fit the batch-1 band cost model to a measured uniform-band profile.

The single-frame latency path (parallel.latency) runs the window-gather
kernel, whose per-supertile cost depends on its window class: regular
(96x256 window, 2-chunk x-gather), wide (128x640, 5 chunks), polar
(128x1152, 9 chunks, single-buffered — CLASS_P), or the XLA fallback
patch.  This script builds the flagship plan on CPU, counts the classes
under each uniform band, and least-squares fits

    band_ms ~= c0 + cR*nR + cW*nW + cP*nP [+ cF*nF]

against the measured per-band times from tools/probe_latency_bands.py.
(The fallback column is dropped from the fit when no band has fallback
subtiles — post-CLASS_P the flagship has none.)  The fitted ratios
become the constants of parallel.latency.plan_row_costs (the model
behind automatic cost-balanced band edges).

    python tools/fit_band_cost.py 4.9 9.39 9.57 4.78 4.86 9.65 9.41 4.43
"""

import sys

import numpy as np

sys.path.insert(0, ".")

IN_W, IN_H = 3840, 2160
OUT_W, OUT_H = 1536, 1024


def class_counts_per_row(plan):
    """[out_h, 5] counts of (regular, wide, tall, polar, fallback-subtile)
    supertiles whose 8 output rows intersect each luma row (chroma
    mapped x2)."""
    from transform360_tpu.ops.remap_pallas import CLASS_P, CLASS_R, CLASS_T

    rows = np.zeros((plan.luma.out_h, 5))

    def add(pp, r, weight):
        wp = pp.pallas.get()
        for cls in wp.classes:
            dims = (cls.win_h, cls.win_w, cls.gh)
            kind = (0 if dims == CLASS_R else
                    3 if dims == CLASS_P else
                    2 if dims == CLASS_T else 1)
            for j in range(cls.n):
                ti = int(cls.meta[0, j])  # supertile row index (TH=8 rows)
                rows[ti * 8 * r : (ti + 1) * 8 * r, kind] += weight / (8 * r)
        if wp.fb_rows is not None:
            for sr in wp.fb_rows:
                rows[int(sr) * 8 * r : (int(sr) + 1) * 8 * r, 4] += (
                    weight / (8 * r)
                )

    add(plan.luma, 1, 1.0)
    if plan.chroma is not None:
        r = plan.luma.out_h // plan.chroma.out_h
        add(plan.chroma, r, 2.0)  # U and V each run the chroma plan
    return rows


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from transform360_tpu import TransformConfig, build_plan
    from transform360_tpu.config import StereoFormat

    ms = np.array([float(a) for a in sys.argv[1:]])
    n = len(ms)
    assert n >= 4, "need the measured per-band ms (uniform pass)"

    cfg = TransformConfig(
        input_stereo_format=StereoFormat.MONO,
        output_stereo_format=StereoFormat.MONO,
    )
    plan = build_plan(cfg, IN_W, IN_H, OUT_W, OUT_H)
    rows = class_counts_per_row(plan)
    per_band = rows.reshape(n, -1, 5).sum(axis=1)

    names = ["R", "W", "T", "P", "F"]
    cols = [k for k in range(5) if per_band[:, k].any()]
    A = np.hstack([np.ones((n, 1)), per_band[:, cols]])
    coef, res, *_ = np.linalg.lstsq(A, ms, rcond=None)
    pred = A @ coef
    print("bands (nR, nW, nT, nP, nF):")
    for k in range(n):
        print(f"  band {k}: {per_band[k].round(1)}  measured {ms[k]:.2f} "
              f"pred {pred[k]:.2f}")
    print(f"fit: c0={coef[0]:.3f} ms, " + ", ".join(
        f"c{names[c]}={coef[1 + i] * 1e3:.2f} us"
        for i, c in enumerate(cols)))
    if 0 in cols and coef[1] > 0:
        cR = coef[1]
        print("ratios: " + ", ".join(
            f"{names[c]}/R={coef[1 + i] / cR:.2f}"
            for i, c in enumerate(cols) if c != 0))
    err = np.abs(pred - ms)
    print(f"max |err| = {err.max():.2f} ms  mean = {err.mean():.2f} ms")


if __name__ == "__main__":
    main()
