"""Dissect the flagship chroma program's cost vs luma (real chip).

VERDICT r2 weak #2: the chroma program (U+V stacked, 2x128-lane chunks of
960x540 planes) costs ~40 ms vs luma's ~66 for 2x the pixels per chunk —
is the per-pixel premium in the blur, the remap, or the pass glue?

Times, via in-jit chain differences:
  luma  full program         [128, 2160, 3840]
  luma  blur-only            [2160, 3840, 128] lane layout
  luma  remap-only           (pad+transpose included)
  chroma full program        [256, 1080, 1920] (2 chunks)
  chroma full program 1chunk [128, 1080, 1920]
  chroma blur-only (1 chunk) [1080, 1920, 128]
  chroma remap-only (1 chunk)
"""

import numpy as np

import jax
import jax.numpy as jnp

from transform360_tpu import TransformConfig, build_plan, chroma_dims
from transform360_tpu.config import StereoFormat
from transform360_tpu.ops.blur_lane import blur_lane
from transform360_tpu.ops.remap_lane import remap_lane_hwb
from transform360_tpu.ops.staging import stage_program
from transform360_tpu.pipeline import (
    _blur_lane_plan,
    _lane_plan,
    plane_executor,
)
from transform360_tpu.utils.backend import ensure_device
from transform360_tpu.utils.profiling import time_jitted

IN_W, IN_H = 3840, 2160
OUT_W, OUT_H = 1536, 1024


def timed(name, program, x, px_out, n_long=10):
    fn, consts = stage_program(
        program, jax.ShapeDtypeStruct(x.shape, x.dtype)
    )
    consts = jax.device_put(consts)
    sec = time_jitted(fn, x, n_short=2, n_long=n_long, consts=(consts,))
    print(
        f"{name:36s} {sec*1e3:8.2f} ms   {sec*1e9/px_out:6.2f} ns/out-px"
    )
    return sec


def main():
    ensure_device()
    rng = np.random.default_rng(0)
    cfg = TransformConfig(
        input_stereo_format=StereoFormat.MONO,
        output_stereo_format=StereoFormat.MONO,
    )
    plan = build_plan(cfg, IN_W, IN_H, OUT_W, OUT_H)
    cw, ch = chroma_dims(IN_W, IN_H)
    cow, coh = OUT_W // 2, OUT_H // 2

    y = jax.device_put(rng.integers(0, 256, (128, IN_H, IN_W), np.uint8))
    uv = jax.device_put(rng.integers(0, 256, (256, ch, cw), np.uint8))
    u1 = uv[:128]

    lfn, _, lc = plane_executor(plan.luma).staged_for(y)
    sec = time_jitted(lfn, y, n_short=2, n_long=10, consts=(lc,))
    print(f"{'luma full program':36s} {sec*1e3:8.2f} ms   "
          f"{sec*1e9/(OUT_W*OUT_H):6.2f} ns/out-px")

    cfn, _, cc = plane_executor(plan.chroma).staged_for(uv)
    sec = time_jitted(cfn, uv, n_short=2, n_long=10, consts=(cc,))
    print(f"{'chroma full (2 chunks, U+V)':36s} {sec*1e3:8.2f} ms   "
          f"{sec*1e9/(2*cow*coh):6.2f} ns/out-px")

    cfn1, _, cc1 = plane_executor(plan.chroma).staged_for(u1)
    sec = time_jitted(cfn1, u1, n_short=2, n_long=10, consts=(cc1,))
    print(f"{'chroma full (1 chunk)':36s} {sec*1e3:8.2f} ms   "
          f"{sec*1e9/(cow*coh):6.2f} ns/out-px")

    # isolated stages, lane layout in/out
    ylane = jax.device_put(
        rng.integers(0, 256, (IN_H, IN_W, 128), np.uint8)
    )
    ulane = jax.device_put(rng.integers(0, 256, (ch, cw, 128), np.uint8))

    bl_l = _blur_lane_plan(plan.luma)
    bl_c = _blur_lane_plan(plan.chroma)
    timed("luma blur only", lambda a: blur_lane(bl_l, a), ylane,
          IN_W * IN_H)
    timed("chroma blur only (1 chunk)", lambda a: blur_lane(bl_c, a),
          ulane, cw * ch)

    lane_l = _lane_plan(plan.luma)
    lane_c = _lane_plan(plan.chroma)
    timed("luma remap only", lambda a: remap_lane_hwb(lane_l, a), ylane,
          OUT_W * OUT_H)
    timed("chroma remap only (1 chunk)",
          lambda a: remap_lane_hwb(lane_c, a), ulane, cow * coh)

    # window stats per plan
    for nm, lp in (("luma", lane_l), ("chroma", lane_c)):
        tot = sum(c.n * c.win_h * c.win_w * 128 for c in lp.classes)
        print(f"{nm}: n_tiles={lp.n_tiles} classes="
              f"{[(c.win_h, c.win_w, c.n, c.unpack_f32) for c in lp.classes]}"
              f" window_bytes={tot/2**30:.2f} GiB")


if __name__ == "__main__":
    main()
