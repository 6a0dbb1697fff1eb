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


def ensure_device():
    """Return ``jax.devices()[0]``, recovering from a broken platform pin."""
    import jax

    try:
        return jax.devices()[0]
    except RuntimeError:
        jax.config.update("jax_platforms", "")
        return jax.devices()[0]
