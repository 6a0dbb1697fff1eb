"""Direct cost of the XLA-fallback patch in the window-gather kernel.

The uniform-band profile showed the expensive output bands carry BOTH
wide-class supertiles and XLA-fallback subtiles, perfectly correlated —
so the per-component costs are not identified by that fit alone
(tools/fit_band_cost.py).  This probe separates them: it chain-times the
batch-1 flagship remap (a) full, (b) kernel classes only (fallback patch
skipped), and (c) regular class only, per plane.  (b)-(a) is the
fallback's true cost; (a)-(c) bounds the wide class.

    python tools/probe_fb_cost.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

IN_W, IN_H = 3840, 2160


def main():
    from transform360_tpu import TransformConfig, build_plan
    from transform360_tpu.config import StereoFormat
    from transform360_tpu.ops import remap_pallas as rp
    from transform360_tpu.utils.backend import ensure_device
    from transform360_tpu.utils.profiling import time_jitted

    ensure_device()
    import jax
    import jax.numpy as jnp

    cfg = TransformConfig(
        input_stereo_format=StereoFormat.MONO,
        output_stereo_format=StereoFormat.MONO,
    )
    plan = build_plan(cfg, IN_W, IN_H, 1536, 1024)
    rng = np.random.default_rng(0)

    for name, pp in (("luma", plan.luma), ("chroma", plan.chroma)):
        wp = pp.pallas.get()
        counts = {
            f"{c.win_h}x{c.win_w}g{c.gh}": int(c.n) for c in wp.classes
        }
        nf = 0 if wp.fb_rows is None else int(wp.fb_rows.shape[0])
        x = jax.device_put(
            rng.integers(0, 256, (1, pp.in_h, pp.in_w), dtype=np.uint8)
        )

        def run_full(v):
            return rp.remap_pallas(wp, v)[:, : wp.out_h, : wp.out_w]

        def run_classes(v, ncls):
            padded = rp.pad_plane(wp, v)
            out = None
            for cls in wp.classes[:ncls]:
                out = rp._run_class(wp, cls, padded, out, False)
            return out[:, : wp.out_h, : wp.out_w]

        rows = {"full": run_full}
        for k in range(len(wp.classes), 0, -1):
            rows[f"classes<={k}"] = (
                lambda v, k=k: run_classes(v, k)
            )
        out = {}
        for label, fn in rows.items():
            sec = time_jitted(fn, x, n_short=2, n_long=10)
            out[label] = round(sec * 1e3, 3)
        print(
            json.dumps(
                {
                    "plane": name,
                    "supertiles": counts,
                    "fb_subtiles": nf,
                    "ms": out,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
