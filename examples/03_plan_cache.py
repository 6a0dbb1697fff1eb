"""Plan serialization: precompute once, restart without re-deriving maps.

The reference builds its warp maps lazily on frame 1 and holds them in
memory (vf_transform360.c:346-352) — they die with the process.  Here the
compiled plan (warp maps, tap banks, filter kernels, segment raster) is a
versioned .npz you can ship between jobs, keyed by config.

    python examples/03_plan_cache.py
"""

import os
import tempfile

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import transform360_tpu as t360

OPTS = "cube_edge_length=128:interpolation_alg=cubic"

t = t360.open_filter(OPTS, in_w=512, in_h=256)
path = os.path.join(tempfile.mkdtemp(), "plan.npz")
t.save_plan(path)
print(f"saved plan: {os.path.getsize(path)} bytes at {path}")

# A fresh engine loads the plan instead of rebuilding the maps.
t2 = t360.open_filter(OPTS, in_w=512, in_h=256, eager=False)
t2.load_plan(path)

rng = np.random.default_rng(1)
y = rng.integers(0, 256, (256, 512), np.uint8)
u = rng.integers(0, 256, (128, 256), np.uint8)
v = rng.integers(0, 256, (128, 256), np.uint8)

a = np.asarray(t.transform(y, u, v)[0])
b = np.asarray(t2.transform(y, u, v)[0])
assert np.array_equal(a, b)
print("OK: loaded-plan output is byte-identical")
