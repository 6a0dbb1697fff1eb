"""A/B the f32 window pre-unpack on the real remap pass, per interpolator.

The gate (ops/remap_lane.py: LaneClass.unpack_f32) was tuned on the
cubic (T=4) probe; bilinear (T=2) halves the slice reuse, so verify the
gate helps (or at least doesn't hurt) per interpolator by timing the
4K luma remap pass with the gate as-built vs forced OFF on every class.

Usage: python tools/probe_unpack_ab.py [cubic|linear|lanczos4] [batch]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from transform360_tpu import build_plan
from transform360_tpu.config import Interpolation, StereoFormat, TransformConfig
from transform360_tpu.ops.remap_lane import build_lane_remap, remap_lane

ALG = {
    "cubic": Interpolation.CUBIC,
    "linear": Interpolation.LINEAR,
    "lanczos4": Interpolation.LANCZOS4,
}[sys.argv[1] if len(sys.argv) > 1 else "linear"]
B = int(sys.argv[2]) if len(sys.argv) > 2 else 128

cfg = TransformConfig(
    interpolation_alg=ALG,
    input_stereo_format=StereoFormat.MONO,
    output_stereo_format=StereoFormat.MONO,
)
plan = build_plan(cfg, 3840, 2160, 1536, 1024)
pp = plan.luma
lp_on = build_lane_remap(pp.spec, pp.fill)
lp_off = dataclasses.replace(
    lp_on,
    classes=tuple(
        dataclasses.replace(c, unpack_f32=False) for c in lp_on.classes
    ),
)
n_f32 = sum(c.n for c in lp_on.classes if c.unpack_f32)
n_all = sum(c.n for c in lp_on.classes)
print(f"{sys.argv[1] if len(sys.argv) > 1 else 'linear'}: "
      f"{n_f32}/{n_all} tiles gated to f32")

rng = np.random.default_rng(0)
x = jax.device_put(
    rng.integers(0, 256, (B, pp.in_h, pp.in_w), dtype=np.uint8)
)


def make_chain(lp, k):
    @jax.jit
    def chain(a, s):
        a = a + s
        for _ in range(k):
            o = remap_lane(lp, a)
            a = a + o[0, 0, 0]
        return a

    return chain


def fence(r):
    # host read of one scalar: block_until_ready alone can return before
    # deferred execution on the tunneled backend (see NOTES.md)
    return int(np.asarray(r[0, 0, 0]))


for name, lp in (("gate-on", lp_on), ("forced-off", lp_off)):
    c1, c7 = make_chain(lp, 1), make_chain(lp, 7)
    fence(c1(x, np.uint8(9)))
    fence(c7(x, np.uint8(9)))

    def run(c, s):
        t0 = time.perf_counter()
        fence(c(x, np.uint8(s)))
        return time.perf_counter() - t0

    t1 = min(run(c1, s) for s in (1, 2, 3))
    t7 = min(run(c7, s) for s in (4, 5, 6))
    per = (t7 - t1) / 6
    print(f"  {name}: {per * 1e3:.2f} ms/batch ({B / per:.0f} fps remap-only)")
