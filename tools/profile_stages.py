"""Per-stage timing on the real chip: blur vs remap vs full pipeline.

Uses the in-jit chain-difference method (utils.profiling.time_jitted) —
the only timing that survives the remote-tunnel dispatch overheads and
dedup (see NOTES.md "Measurement discipline").

Usage: python tools/profile_stages.py [batch] [--trace DIR]

With ``--trace DIR`` the timed region is additionally captured as a
jax.profiler device trace (open DIR with TensorBoard/XProf to see the
per-kernel timeline on the chip).
"""

import contextlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

from transform360_tpu import TransformConfig, build_plan, chroma_dims
from transform360_tpu.config import Interpolation, StereoFormat
from transform360_tpu.filtering import apply_blur
from transform360_tpu.pipeline import plane_executor
from transform360_tpu.utils.profiling import device_trace, time_jitted

IN_W, IN_H = 3840, 2160
OUT_W, OUT_H = 1536, 1024

TRACE_DIR = None
_argv = sys.argv[1:]
if "--trace" in _argv:
    i = _argv.index("--trace")
    TRACE_DIR = _argv[i + 1]
    del _argv[i : i + 2]
B = int(_argv[0]) if _argv else 128


def report(name, sec_per_call, frames):
    print(f"{name:44s} {sec_per_call*1e3:8.2f} ms  ({frames/sec_per_call:8.1f} fps)")


def main():
    ctx = device_trace(TRACE_DIR) if TRACE_DIR else contextlib.nullcontext()
    with ctx:
        _run()


def _run():
    rng = np.random.default_rng(0)
    cw, ch = chroma_dims(IN_W, IN_H)
    y = jax.device_put(rng.integers(0, 256, (B, IN_H, IN_W), dtype=np.uint8))

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
        plan = build_plan(cfg, IN_W, IN_H, OUT_W, OUT_H)
        ex = plane_executor(plan.luma)
        fn, _, consts = ex.staged_for(y)
        report(f"luma plane {name}", time_jitted(fn, y, consts=(consts,)), B)

    # isolate: luma XLA blur only (f32 in/out)
    cfg = TransformConfig(**base)
    plan = build_plan(cfg, IN_W, IN_H, OUT_W, OUT_H)
    yf = jax.block_until_ready(jnp.asarray(y).astype(jnp.float32))
    report(
        "luma XLA blur only (f32)",
        time_jitted(lambda a: apply_blur(plan.luma.blur, a), yf),
        B,
    )

    # isolate: chroma plane (U) full program
    u = jax.device_put(rng.integers(0, 256, (B, ch, cw), dtype=np.uint8))
    ex = plane_executor(plan.chroma)
    fn, _, consts = ex.staged_for(u)
    report("chroma plane cubic+lpf", time_jitted(fn, u, consts=(consts,)), B)


if __name__ == "__main__":
    main()
