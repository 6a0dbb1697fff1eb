"""Tracing / profiling helpers (SURVEY §5: the reference has only av_log
breadcrumbs; the rebuild provides jax.profiler traces and per-stage timers).

Timing on remote-tunnel TPU backends is hostile to naive wall-clock loops
(per-dispatch overheads of hundreds of ms, dispatch dedup of identical
requests); :func:`time_jitted` implements the reliable in-jit
chain-difference method used by bench.py.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler device trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_jitted(
    fn: Callable,
    x: jnp.ndarray,
    n_short: int = 2,
    n_long: int = 18,
    repeats: int = 3,
    consts: tuple = (),
) -> float:
    """Steady-state seconds per invocation of ``fn(x, *consts)``.

    Builds two jitted chains of different lengths where each step consumes
    the previous output (device-serialized, dedup-proof), and divides the
    wall-clock difference — immune to dispatch overhead and result caching.

    ``consts`` (e.g. staged plan arrays) are passed as jit arguments so
    they are never embedded in the chained program's HLO.
    """

    def make(n):
        @jax.jit
        def chain(a, c):
            for _ in range(n):
                o = fn(a, *c)
                a = a + o.reshape(-1)[0].astype(a.dtype)
            return a

        return chain

    # Materialize a scalar from every result: on tunneled backends
    # block_until_ready can return before deferred compilation/execution
    # has actually happened, so a host read is the only reliable fence.
    # The read cost (one RTT) is identical for both chain lengths and
    # cancels in the difference.
    def fence(r):
        return float(jnp.asarray(r).reshape(-1)[0])

    cs, cl = make(n_short), make(n_long)
    fence(cs(x, consts))
    fence(cl(x, consts))

    def run(c, k):
        xi = x + x.dtype.type(k)
        t0 = time.perf_counter()
        fence(c(xi, consts))
        return time.perf_counter() - t0

    ts = min(run(cs, k) for k in range(1, repeats + 1))
    tl = min(run(cl, k) for k in range(repeats + 1, 2 * repeats + 1))
    return max(tl - ts, 1e-9) / (n_long - n_short)


def time_frame_step(
    plan,
    y,
    u,
    v,
    n_short: int = 2,
    n_long: int = 26,
    repeats: int = 3,
) -> float:
    """Steady-state seconds per full-frame step (3 planes) on device.

    Same chain-difference methodology as :func:`time_jitted`, specialized
    to the plane executors: the whole N-step chain runs inside ONE jitted
    program, each step consuming the previous outputs (dedup-proof), with
    plan constants passed as runtime arguments (staged)."""
    import numpy as np

    from ..pipeline import plane_executor

    lfn, _, lc = plane_executor(plan.luma).staged_for(y)
    if plan.chroma is None:  # single-plane formats (gray)
        cfn, cc = None, None
    else:
        cfn, _, cc = plane_executor(plan.chroma).staged_for(u)

    def make(n):
        @jax.jit
        def chain(y, u, v, lc, cc):
            for _ in range(n):
                oy = lfn(y, lc)
                # chain on ALL outputs (an unused plane would be DCE'd)
                d = oy[0, 0, 0]
                if cfn is not None:
                    ou, ov = cfn(u, cc), cfn(v, cc)
                    d = d + ou[0, 0, 0] + ov[0, 0, 0]
                    u = u + d
                    v = v + d
                y = y + d
            return y, u, v

        return chain

    # host-read fence: see time_jitted (block_until_ready alone is not a
    # reliable completion fence on tunneled backends)
    def fence(r):
        return float(jnp.asarray(r[0]).reshape(-1)[0])

    cs, cl = make(n_short), make(n_long)
    fence(cs(y, u, v, lc, cc))
    fence(cl(y, u, v, lc, cc))

    def run(chain, k):
        t0 = time.perf_counter()
        fence(chain(y + np.uint8(k), u, v, lc, cc))
        return time.perf_counter() - t0

    ts = min(run(cs, k) for k in range(1, repeats + 1))
    tl = min(run(cl, k) for k in range(repeats + 1, 2 * repeats + 1))
    return max(tl - ts, 1e-9) / (n_long - n_short)


class StageStats:
    """Structured per-batch throughput logging (metrics/observability
    analog; the reference has none — SURVEY §5)."""

    def __init__(self, stream=None):
        self.stream = stream or sys.stderr
        self.frames = 0
        self.batches = 0
        self.seconds = 0.0

    def record(self, n_frames: int, seconds: float) -> None:
        """``seconds`` is the time spent BLOCKED waiting for device
        results; with overlapped IO the compute hidden behind host work
        is excluded by design."""
        self.frames += n_frames
        self.batches += 1
        self.seconds += seconds

    def emit(self, wall_seconds: Optional[float] = None, **extra) -> None:
        """One JSON line.  ``fps`` is end-to-end (frames / wall_seconds)
        when a wall time is given; otherwise frames / blocked time."""
        denom = wall_seconds if wall_seconds is not None else self.seconds
        payload = {
            "frames": self.frames,
            "batches": self.batches,
            # "seconds" kept as a deprecated alias of blocked_seconds for
            # consumers of the pre-overlap schema
            "seconds": round(self.seconds, 4),
            "blocked_seconds": round(self.seconds, 4),
            "fps": round(self.frames / denom, 2) if denom else None,
            **({"wall_seconds": wall_seconds} if wall_seconds is not None else {}),
            **extra,
        }
        print(json.dumps(payload), file=self.stream)
