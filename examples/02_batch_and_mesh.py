"""Batched frames + multi-chip data parallelism over a jax.sharding.Mesh.

The reference parallelizes with one pthread per prefilter segment
(VideoFrameTransform.cpp:592-604).  The TPU-native equivalent is frame-batch
sharding: frames are independent, so the batch axis shards over the mesh
with ZERO collectives in the compute path.

Self-contained demo on 8 *virtual* CPU devices (the same mechanism the
test suite uses); on a real pod slice, drop the two config lines and pass
`jax.devices()` to make_mesh.

    python examples/02_batch_and_mesh.py
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import transform360_tpu as t360
from transform360_tpu.parallel import make_mesh

mesh = make_mesh()  # 1-D batch mesh over all visible devices
print(f"mesh: {mesh.devices.size} devices")

t = t360.open_filter(
    "cube_edge_length=128:interpolation_alg=linear:enable_low_pass_filter=0",
    in_w=512,
    in_h=256,
    mesh=mesh,
)

B = 16  # must be a multiple of the mesh size
rng = np.random.default_rng(0)
y = rng.integers(0, 256, (B, 256, 512), np.uint8)
u = rng.integers(0, 256, (B, 128, 256), np.uint8)
v = rng.integers(0, 256, (B, 128, 256), np.uint8)

oy, ou, ov = t.transform(y, u, v)  # computed sharded on the frame axis
print("output:", oy.shape, oy.dtype)

# Batched output is byte-identical to frame-at-a-time (also a test invariant).
t1 = t360.open_filter(
    "cube_edge_length=128:interpolation_alg=linear:enable_low_pass_filter=0",
    in_w=512,
    in_h=256,
)
o0 = np.asarray(t1.transform(y[0], u[0], v[0])[0])
assert np.array_equal(np.asarray(oy)[0], o0)
print("OK: sharded batch matches single-frame output")
