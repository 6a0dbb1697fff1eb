"""Real-chip trial of the lane-batched remap kernel at the 4K config.

Correctness: lane output (frames 0..1) vs the XLA gather path on the same
frames.  Timing: in-jit chain difference (the only trustworthy method on
the axon tunnel), per-plane.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from transform360_tpu import build_plan, chroma_dims
from transform360_tpu.config import Interpolation, StereoFormat, TransformConfig
from transform360_tpu.ops.remap_lane import build_lane_remap, remap_lane
from transform360_tpu.sampling import remap_const

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
CHECK = "--check" in sys.argv

cfg = TransformConfig(
    interpolation_alg=Interpolation.CUBIC,
    input_stereo_format=StereoFormat.MONO,
    output_stereo_format=StereoFormat.MONO,
)
plan = build_plan(cfg, 3840, 2160, 1536, 1024)
rng = np.random.default_rng(0)

for name, pp in (("luma", plan.luma), ("chroma", plan.chroma)):
    lp = build_lane_remap(pp.spec, pp.fill)
    print(f"{name}: classes {[(c.win_h, c.win_w, c.n, c.double_buf) for c in lp.classes]}"
          f" fb {0 if lp.fb_ids is None else len(lp.fb_ids)}")
    x = rng.integers(0, 256, (B, pp.in_h, pp.in_w), dtype=np.uint8)
    xd = jax.device_put(x)
    fn = jax.jit(lambda a: remap_lane(lp, a))
    t0 = time.perf_counter()
    out = np.asarray(jax.block_until_ready(fn(xd)))
    print(f"  first run (compile+exec): {time.perf_counter()-t0:.1f}s")

    if CHECK:
        want = remap_const(pp.spec, jnp.asarray(x[:2]).reshape(2, -1), pp.fill)
        want = np.asarray(jnp.clip(jnp.floor(want + 0.5), 0, 255).astype(jnp.uint8))
        want = want.reshape(2, *pp.spec.base_y.shape)
        diff = np.abs(out[:2].astype(int) - want.astype(int))
        print(f"  vs XLA: max diff {diff.max()}, frac off {(diff > 0).mean():.2e}")

    def make_chain(k):
        @jax.jit
        def chain(a, s):
            a = a + s
            for _ in range(k):
                o = remap_lane(lp, a)
                a = a + o[0, 0, 0]
            return a
        return chain

    c1, c2 = make_chain(1), make_chain(7)
    jax.block_until_ready(c1(xd, np.uint8(9)))
    jax.block_until_ready(c2(xd, np.uint8(9)))

    def run(c, s):
        t0 = time.perf_counter()
        jax.block_until_ready(c(xd, np.uint8(s)))
        return time.perf_counter() - t0

    t1 = min(run(c1, s) for s in (1, 2, 3))
    t2 = min(run(c2, s) for s in (4, 5, 6))
    per = (t2 - t1) / 6
    print(f"  per-batch {per*1e3:.2f} ms -> {per/B*1e3:.3f} ms/frame "
          f"({B/per:.0f} fps remap-only)")
