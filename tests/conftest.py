"""Test environment: force an 8-device virtual CPU mesh before JAX loads.

Tests run on CPU (deterministic, no TPU needed); multi-chip sharding is
validated on the virtual device mesh as per the project brief.
"""

import os

# Force-override: the ambient environment pins JAX_PLATFORMS=axon (TPU
# tunnel) and its sitecustomize registers the plugin at interpreter start,
# which would route every eager test op through the remote chip.  The env
# var alone is not enough (the plugin registration already updated jax
# config), so set the config explicitly too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite compiles hundreds of XLA/Mosaic
# programs; caching them makes re-runs several times faster (first run
# unaffected beyond cache writes).
from transform360_tpu.utils.backend import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    # Function-scoped on purpose: a session-scoped stream makes every
    # test's inputs depend on which tests ran before it, so marginal
    # rounding-tie assertions flake only under specific orderings.
    return np.random.default_rng(42)


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)
