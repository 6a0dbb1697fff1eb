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

import hashlib
import os

_CACHE_DIR = os.path.expanduser("~/.cache/transform360_tpu/jax_cache")


def _host_fingerprint() -> str:
    """Hash of the host CPU's identity AND feature flags.

    XLA:CPU caches AOT executables compiled for the *build* machine's CPU;
    loading them on a different host can SIGILL (XLA warns exactly this).
    Scoping the cache directory by CPU fingerprint keeps a home directory
    shared across heterogeneous machines (NFS) safe.  The flags line alone
    is NOT enough: LLVM derives tuning bits such as ``prefer-no-gather``
    from the CPU *model* (via cpuid), so two hosts with identical cpuinfo
    flags can still produce incompatible AOT code — include vendor/family/
    model/stepping/model-name too.  TPU entries are unaffected either way
    — their key includes the compiler build.
    """
    keys = (
        # x86
        "vendor_id", "cpu family", "model", "stepping", "model name",
        "flags",
        # ARM (/proc/cpuinfo has no x86 keys there; 'Features' is the
        # flags analog, the rest identify the core)
        "CPU implementer", "CPU architecture", "CPU variant", "CPU part",
        "CPU revision", "Features",
    )
    ident = {}
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                k, _, v = line.partition(":")
                k = k.strip()
                if k in keys and k not in ident:
                    v = v.strip()
                    if k in ("flags", "Features"):
                        v = " ".join(sorted(v.split()))
                    ident[k] = v
    except OSError:
        pass
    if ident:
        feats = "|".join(f"{k}={ident.get(k, '')}" for k in keys)
        return hashlib.sha256(feats.encode()).hexdigest()[:12]
    import platform

    return hashlib.sha256(
        f"{platform.machine()}-{platform.processor()}".encode()
    ).hexdigest()[:12]


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Point JAX's persistent compilation cache at ``cache_dir``
    (default: a per-host-CPU subdirectory of ``~/.cache/transform360_tpu``).

    The full 4K pipeline takes minutes to compile over the remote-TPU
    tunnel; the on-disk cache makes every later process start (bench
    re-runs, CLI invocations) skip straight to execution.  Safe across
    libtpu versions — the cache key includes the compiler build.
    """
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(_CACHE_DIR, _host_fingerprint())
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
