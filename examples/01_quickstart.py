"""Quickstart: equirect -> cubemap on one frame, the `-vf transform360=...` analog.

Mirrors the reference workflow (README.md:84-95 of facebook/transform360):
one ffmpeg-style option string, one call per frame.  Runs anywhere JAX
runs — on a TPU the same code engages the Pallas kernel paths for large
planes / batches.

    python examples/01_quickstart.py [--cpu]
"""

import sys

import numpy as np

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import transform360_tpu as t360

IN_W, IN_H = 1024, 512

# A synthetic equirect frame with recognizable landmarks: bright sky band,
# dark ground band, yaw gradient in between.
yy, xx = np.mgrid[0:IN_H, 0:IN_W]
Y = np.where(
    yy < IN_H // 4, 230, np.where(yy > 3 * IN_H // 4, 25, xx * 255 // IN_W)
).astype(np.uint8)
U = np.full((IN_H // 2, IN_W // 2), 128, np.uint8)
V = U.copy()

# Exactly the reference's option syntax; defaults match vf_transform360.c
# (cubic interpolation, adaptive low-pass prefilter on).
t = t360.open_filter(
    "cube_edge_length=128:input_stereo_format=mono:output_stereo_format=mono",
    in_w=IN_W,
    in_h=IN_H,
)
print("output dims:", t.output_dims())  # (384, 256): 3x2 grid of 128px faces

oy, ou, ov = t.transform(Y, U, V)
oy = np.asarray(oy)
print("output luma:", oy.shape, oy.dtype)

# Face order in the 3x2 grid is R, L, T / B, F, Bk (reference parity).
E = 128
top_center = int(oy[E // 2, 2 * E + E // 2])  # TOP face -> sky value
bottom_center = int(oy[E + E // 2, E // 2])  # BOTTOM face -> ground value
print(f"TOP center {top_center} (sky ~230), BOTTOM center {bottom_center} (ground ~25)")
assert top_center > 200 and bottom_center < 60

try:
    import cv2

    cv2.imwrite("/tmp/cubemap_example.png", oy)
    print("wrote /tmp/cubemap_example.png")
except ImportError:
    pass
print("OK")
