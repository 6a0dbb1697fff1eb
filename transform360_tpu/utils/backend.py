"""Backend bring-up guard for benchmark/tool entry points.

The development environment pins JAX at a remote-TPU plugin via
sitecustomize (both the ``JAX_PLATFORMS`` env var and ``jax.config``).
That registration is occasionally flaky (tunnel handshake) or stale (the
plugin may register under a different platform name than the pin), in
which case the very first ``jax.devices()`` raises ``RuntimeError:
Unable to initialize backend ...`` even though a working backend exists.

:func:`ensure_device` retries with the platform pin cleared so JAX
auto-selects the best available backend (TPU over CPU).  Harmless when
the ambient pin is healthy.
"""

from __future__ import annotations

import os

_CACHE_DIR = os.path.expanduser("~/.cache/transform360_tpu/jax_cache")


def enable_compilation_cache(cache_dir: str = _CACHE_DIR) -> None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    The full 4K pipeline takes minutes to compile over the remote-TPU
    tunnel; the on-disk cache makes every later process start (bench
    re-runs, CLI invocations) skip straight to execution.  Safe across
    libtpu versions — the cache key includes the compiler build.
    """
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def ensure_device(compilation_cache: bool = True):
    """Return ``jax.devices()[0]``, recovering from a broken platform pin."""
    import jax

    if compilation_cache:
        enable_compilation_cache()
    try:
        return jax.devices()[0]
    except RuntimeError:
        jax.config.update("jax_platforms", "")
        return jax.devices()[0]
