"""Per-stage timing on the real chip: blur vs remap vs full pipeline."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from transform360_tpu import TransformConfig, build_plan, chroma_dims
from transform360_tpu.config import Interpolation, StereoFormat
from transform360_tpu.filtering import apply_blur
from transform360_tpu.pipeline import _frame_step, _plane_step, device_put_plan
from transform360_tpu.sampling import remap_plane

IN_W, IN_H = 3840, 2160
OUT_W, OUT_H = 1536, 1024
B = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:40s} {best*1e3:8.2f} ms  ({B/best:8.1f} fps)")
    return best


def main():
    rng = np.random.default_rng(0)
    mk = lambda h, w: jax.device_put(
        rng.integers(0, 256, (B, h, w), dtype=np.uint8)
    )
    cw, ch = chroma_dims(IN_W, IN_H)
    y, u, v = mk(IN_H, IN_W), mk(ch, cw), mk(ch, cw)
    yf = jnp.asarray(y).transpose(1, 2, 0).astype(jnp.float32)
    yf = jax.block_until_ready(yf)

    base = dict(
        input_stereo_format=StereoFormat.MONO,
        output_stereo_format=StereoFormat.MONO,
    )

    for name, kw in [
        ("cubic+lpf (default)", dict()),
        ("cubic no-lpf", dict(enable_low_pass_filter=0)),
        ("linear no-lpf", dict(interpolation_alg=Interpolation.LINEAR,
                               enable_low_pass_filter=0)),
        ("nearest no-lpf", dict(interpolation_alg=Interpolation.NEAREST,
                                enable_low_pass_filter=0)),
    ]:
        cfg = TransformConfig(**base, **kw)
        plan = device_put_plan(build_plan(cfg, IN_W, IN_H, OUT_W, OUT_H))
        timeit(f"full frame {name}", _frame_step, plan, y, u, v)

    # isolate: luma blur only
    cfg = TransformConfig(**base)
    plan = device_put_plan(build_plan(cfg, IN_W, IN_H, OUT_W, OUT_H))
    blur_j = jax.jit(lambda p, x: apply_blur(p.luma.blur, x))
    timeit("luma blur only", blur_j, plan, yf)

    # isolate: luma remap only (f32 input pre-staged)
    def rm(p, x):
        s = p.luma.spec
        return remap_plane(s, s.base_y, s.base_x, s.frac_y, s.frac_x,
                           s.valid, x, 0.0)
    rm_j = jax.jit(rm)
    timeit("luma remap only (cubic)", rm_j, plan, yf)

    cfg2 = TransformConfig(**base, interpolation_alg=Interpolation.LINEAR)
    plan2 = device_put_plan(build_plan(cfg2, IN_W, IN_H, OUT_W, OUT_H))
    timeit("luma remap only (linear)", rm_j, plan2, yf)

    # isolate: uint8->f32 transpose in
    t_j = jax.jit(lambda a: a.transpose(1, 2, 0).astype(jnp.float32))
    timeit("transpose+cast luma", t_j, y)


if __name__ == "__main__":
    main()
