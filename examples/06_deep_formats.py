"""High-bit-depth video: a 10-bit equirect -> cubemap transform.

The reference wraps every plane as CV_8U bytes
(VideoFrameTransform.cpp:1331-1335) and corrupts >8-bit streams; this
pipeline processes the ffmpeg ``*10le``/``*12le`` planar formats
natively — uint16 planes in and out, float32 compute, rounding at the
format's true maximum (1023 at 10 bit), neutral fills scaled with
depth.  Pipe ``-pix_fmt yuv420p10le -f rawvideo`` from ffmpeg straight
into the CLI, or pass uint16 arrays here.

    python examples/06_deep_formats.py [--cpu]
"""

import sys

import numpy as np

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import transform360_tpu as t360

IN_W, IN_H = 1024, 512
MAX10 = 1023

# The quickstart's landmark frame, at 10-bit levels: bright sky band,
# dark ground band, yaw gradient in between.
yy, xx = np.mgrid[0:IN_H, 0:IN_W]
Y = np.where(
    yy < IN_H // 4, 920, np.where(yy > 3 * IN_H // 4, 100, xx * MAX10 // IN_W)
).astype(np.uint16)
U = np.full((IN_H // 2, IN_W // 2), 512, np.uint16)  # 10-bit neutral chroma
V = U.copy()

t = t360.open_filter(
    "cube_edge_length=128:input_stereo_format=mono:output_stereo_format=mono",
    in_w=IN_W,
    in_h=IN_H,
    pix_fmt="yuv420p10le",
)
oy, ou, ov = t.transform(Y, U, V)

e = 128
print("output dims:", t.output_dims(), "dtype:", oy.dtype, "max:", oy.max())
print("TOP face center (sky):   ", oy[e // 2, 2 * e + e // 2])
print("BOTTOM face center (gnd):", oy[e + e // 2, e // 2])
assert oy.dtype == np.uint16 and int(oy.max()) <= MAX10
assert abs(int(oy[e // 2, 2 * e + e // 2]) - 920) < 30
assert abs(int(oy[e + e // 2, e // 2]) - 100) < 30
print("OK: 10-bit landmarks survive the transform at full depth")
