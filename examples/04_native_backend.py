"""The dependency-free C++ engine: a CPU fallback with the reference's shape.

`backend="native"` routes through native/t360.cpp — an independent C++
implementation exposing the reference's literal C ABI
(T360_new/_generateMapForPlane/_transformFramePlane, cf.
VideoFrameTransformHandler.h:24-47) plus a frame-pool batch runner.  It
builds on demand with `make` (no OpenCV, no FFmpeg); useful where no
accelerator is present or to cross-check the TPU path.

    python examples/04_native_backend.py
"""

import numpy as np

import transform360_tpu as t360
from transform360_tpu.native import available as native_available

if not native_available():
    print("native engine unavailable (no C++ toolchain?) — skipping")
    raise SystemExit(0)

OPTS = "cube_edge_length=128:interpolation_alg=linear:enable_low_pass_filter=0"

rng = np.random.default_rng(2)
y = rng.integers(0, 256, (256, 512), np.uint8)
u = rng.integers(0, 256, (128, 256), np.uint8)
v = rng.integers(0, 256, (128, 256), np.uint8)

tn = t360.open_filter(OPTS, in_w=512, in_h=256, backend="native")
ny, nu, nv = tn.transform(y, u, v)
print("native output:", ny.shape, ny.dtype)

# Cross-check against the JAX pipeline (CPU here; same code runs on TPU).
import jax

jax.config.update("jax_platforms", "cpu")
tj = t360.open_filter(OPTS, in_w=512, in_h=256)
jy = np.asarray(tj.transform(y, u, v)[0])
err = np.abs(jy.astype(np.int32) - ny.astype(np.int32))
psnr = 10 * np.log10(255.0**2 / max((err.astype(np.float64) ** 2).mean(), 1e-12))
print(f"native vs JAX: max |diff| = {err.max()}, PSNR = {psnr:.1f} dB")
assert psnr > 50
print("OK")
