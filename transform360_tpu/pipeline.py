"""Batched frame pipeline: plan-specialized jitted executors.

The reference's steady-state path loops planes per frame and crosses a C ABI
into the engine (``vf_transform360.c:338-402``).  Here the whole per-plane
flow — prefilter → uint8 round → gather/interpolate → optional INTER_AREA —
is one jitted XLA program, **specialized to the plan**: the static warp
indices, tap weights, prefilter taps, and masks enter the graph as literals.
That specialization is what unlocks XLA's constant-index gather fast path
on TPU (see :mod:`transform360_tpu.sampling`); the cost is a per-config
compile, amortized over a video stream.

Layout: the device-side fast path is **batch-minor** ``[H, W, B]`` uint8
(:func:`transform_planes`).  Every remap tap then fetches one contiguous
``B``-lane row with a compile-time-static address, the prefilter's shifts
broadcast across lanes, and the ``[H, W, B] → [H*W, B]`` flatten is a free
view (leading-dims merge).  Host-side batch assembly costs the same for
batch-minor as batch-major (``np.stack`` copies either way), so nothing is
lost at the API boundary; :func:`transform_batch` accepts conventional
``[B, H, W]`` arrays and converts at the edges.

The batch axis is the sharding axis for multi-chip execution — the
TPU-native replacement for the reference's pthread-per-segment fan-out
(SURVEY §5): shard ``B`` over an ICI mesh and every stage stays
device-local.

Rounding parity: the reference filters into a uint8 plane, remaps it with
fixed-point arithmetic, and (when supersampling) round-trips through uint8
again before INTER_AREA (``VideoFrameTransform.cpp:620-777``).  We round
with ``floor(x + 0.5)`` + uint8 saturation at the same three points.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .filtering import apply_blur
from .plan import PlanePlan, TransformPlan
from .sampling import (
    MAX_CONST_BYTES,
    apply_area_resize,
    const_budget_bytes,
    remap_const,
    remap_traced,
)


def _round_u8(x: jnp.ndarray) -> jnp.ndarray:
    """OpenCV-style half-up rounding with uint8 saturation."""
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0).astype(jnp.uint8)


def _plane_program(pp: PlanePlan, use_const: bool):
    """Build the traceable per-plane program: uint8 [H, W, B] → uint8
    [out_h, out_w, B].  With ``use_const`` the sampling constants embed as
    literals; otherwise spec arrays are passed as device operands."""
    spec = pp.spec

    if not use_const:
        by = jax.device_put(spec.base_y)
        bx = jax.device_put(spec.base_x)
        fy = jax.device_put(spec.frac_y)
        fx = jax.device_put(spec.frac_x)
        va = None if spec.valid is None else jax.device_put(spec.valid)

    def program(x):
        if pp.blur is not None:
            x = _round_u8(apply_blur(pp.blur, x.astype(jnp.float32)))
        flat = x.reshape(-1, x.shape[-1])  # [H*W, B]: free leading-dim merge
        if use_const:
            out = remap_const(spec, flat, float(pp.fill))
        else:
            out = remap_traced(spec, flat, by, bx, fy, fx, va, float(pp.fill))
        out = _round_u8(out).reshape(pp.scaled_h, pp.scaled_w, -1)
        if pp.area_row is not None:
            out = _round_u8(
                apply_area_resize(
                    out.astype(jnp.float32),
                    jnp.asarray(pp.area_row),
                    jnp.asarray(pp.area_col),
                )
            )
        return out

    return program


_EXEC_CACHE: Dict[str, Callable] = {}


def plane_executor(pp: PlanePlan) -> Callable:
    """Jitted executor for one plane class, cached by plan identity."""
    fn = _EXEC_CACHE.get(pp.key)
    if fn is None:
        use_const = const_budget_bytes(pp.spec) <= MAX_CONST_BYTES
        fn = jax.jit(_plane_program(pp, use_const))
        _EXEC_CACHE[pp.key] = fn
    return fn


def clear_executor_cache() -> None:
    _EXEC_CACHE.clear()


def device_put_plan(plan: TransformPlan, device=None) -> TransformPlan:
    """Kept for API compatibility: plans are numpy-resident (their arrays
    embed into the compiled executable); nothing to transfer."""
    del device
    return plan


def transform_planes(plan: TransformPlan, y, u, v):
    """Fast path: batch-minor uint8 planes.

    ``y``: [H, W, B]; ``u``/``v``: [ceil(H/2), ceil(W/2), B].  Returns the
    transformed batch-minor planes.  Three image planes share two map
    planes (plane 1 and 2 both use the chroma plan —
    ``vf_transform360.c:372``)."""
    luma = plane_executor(plan.luma)
    chroma = plane_executor(plan.chroma)
    return luma(y), chroma(u), chroma(v)


# Backwards-compatible internal alias used by benches/tools.
_frame_step = transform_planes


def _to_minor(a) -> jnp.ndarray:
    """[B, H, W] (or [H, W]) → [H, W, B]; numpy inputs convert on host."""
    if isinstance(a, np.ndarray):
        a = np.ascontiguousarray(np.moveaxis(a, 0, -1)) if a.ndim == 3 else a[..., None]
        return jnp.asarray(a)
    a = jnp.asarray(a)
    return jnp.moveaxis(a, 0, -1) if a.ndim == 3 else a[..., None]


def _from_minor(a: jnp.ndarray, batched: bool):
    return jnp.moveaxis(a, -1, 0) if batched else a[..., 0]


def transform_batch(
    plan: TransformPlan,
    y,
    u,
    v,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Transform a batch of YUV420 frames in conventional layout.

    ``y``: uint8 [B, H, W] (or [H, W] single frame); ``u``/``v``: the
    ceil-halved chroma planes.  Returns uint8 planes in the same layout at
    the negotiated output size.  For peak throughput stage batch-minor
    arrays on device and call :func:`transform_planes` directly.
    """
    batched = np.asarray(y).ndim == 3 if isinstance(y, np.ndarray) else jnp.asarray(y).ndim == 3
    oy, ou, ov = transform_planes(plan, _to_minor(y), _to_minor(u), _to_minor(v))
    return (
        _from_minor(oy, batched),
        _from_minor(ou, batched),
        _from_minor(ov, batched),
    )


def transform_frame(plan: TransformPlan, y, u, v):
    """Single-frame convenience wrapper (prefer batched entry points)."""
    return transform_batch(plan, y, u, v)


def transform_plane(
    plan: TransformPlan, plane, map_plane_index: int
) -> jnp.ndarray:
    """Single-plane entry, mirroring the C ABI's
    ``VideoFrameTransform_transformFramePlane``
    (``VideoFrameTransformHandler.h:36-47``): the caller picks the map
    plane (0 = luma, 1 = chroma) for the given image plane."""
    pp = plan.luma if map_plane_index == 0 else plan.chroma
    batched = np.asarray(plane).ndim == 3
    out = plane_executor(pp)(_to_minor(plane))
    return _from_minor(out, batched)
