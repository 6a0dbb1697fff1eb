"""Batched frame pipeline: plan-specialized jitted executors.

The reference's steady-state path loops planes per frame and crosses a C ABI
into the engine (``vf_transform360.c:338-402``).  Here the whole per-plane
flow — prefilter → uint8 round → gather/interpolate → optional INTER_AREA —
is one jitted XLA program, **specialized to the plan**: the static warp
indices, tap weights, prefilter taps, and masks enter the graph as literals.
That specialization is what unlocks XLA's constant-index gather fast path
on TPU (see :mod:`transform360_tpu.sampling`); the cost is a per-config
compile, amortized over a video stream.

Layout: planes stay ``[B, H, W]`` uint8 end to end (no transposes); the
remap view is ``[B, H*W]`` so each tap gathers along the lane axis.  The
batch axis is the sharding axis for multi-chip execution — the TPU-native
replacement for the reference's pthread-per-segment fan-out (SURVEY §5):
shard ``B`` over an ICI mesh and every stage stays device-local.

Rounding parity: the reference filters into a uint8 plane, remaps it with
fixed-point arithmetic, and (when supersampling) round-trips through uint8
again before INTER_AREA (``VideoFrameTransform.cpp:620-777``).  We round
with ``floor(x + 0.5)`` + uint8 saturation at the same three points.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

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
    """Build the traceable per-plane program: uint8 [B, H, W] → uint8
    [B, out_h, out_w].  With ``use_const`` the sampling constants embed as
    literals; otherwise spec arrays are passed as device args."""
    spec = pp.spec

    if use_const:

        def program(x):
            if pp.blur is not None:
                x = _round_u8(apply_blur(pp.blur, x.astype(jnp.float32)))
            out = remap_const(spec, x.reshape(x.shape[0], -1), float(pp.fill))
            out = _round_u8(out).reshape(-1, pp.scaled_h, pp.scaled_w)
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

    # traced fallback: spec arrays as runtime operands
    by = jax.device_put(spec.base_y)
    bx = jax.device_put(spec.base_x)
    fy = jax.device_put(spec.frac_y)
    fx = jax.device_put(spec.frac_x)
    va = None if spec.valid is None else jax.device_put(spec.valid)

    def program(x):
        if pp.blur is not None:
            x = _round_u8(apply_blur(pp.blur, x.astype(jnp.float32)))
        out = remap_traced(
            spec, x.reshape(x.shape[0], -1), by, bx, fy, fx, va, float(pp.fill)
        )
        out = _round_u8(out).reshape(-1, pp.scaled_h, pp.scaled_w)
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


def _frame_step(plan: TransformPlan, y, u, v):
    """Full YUV420 frame batch. Three image planes share two map planes
    (plane 1 and 2 both use the chroma plan — ``vf_transform360.c:372``)."""
    luma = plane_executor(plan.luma)
    chroma = plane_executor(plan.chroma)
    return luma(y), chroma(u), chroma(v)


def transform_batch(
    plan: TransformPlan,
    y: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Transform a batch of YUV420 frames.

    ``y``: uint8 [B, H, W]; ``u``/``v``: uint8 [B, ceil(H/2), ceil(W/2)].
    Returns the transformed uint8 planes at the negotiated output size.
    """
    y = jnp.asarray(y)
    u = jnp.asarray(u)
    v = jnp.asarray(v)
    if y.ndim == 2:
        oy, ou, ov = _frame_step(plan, y[None], u[None], v[None])
        return oy[0], ou[0], ov[0]
    return _frame_step(plan, y, u, v)


def transform_frame(plan: TransformPlan, y, u, v):
    """Single-frame convenience wrapper (prefer :func:`transform_batch`)."""
    return transform_batch(plan, jnp.asarray(y), jnp.asarray(u), jnp.asarray(v))


def transform_plane(
    plan: TransformPlan, plane, map_plane_index: int
) -> jnp.ndarray:
    """Single-plane entry, mirroring the C ABI's
    ``VideoFrameTransform_transformFramePlane``
    (``VideoFrameTransformHandler.h:36-47``): the caller picks the map
    plane (0 = luma, 1 = chroma) for the given image plane."""
    pp = plan.luma if map_plane_index == 0 else plan.chroma
    plane = jnp.asarray(plane)
    squeeze = plane.ndim == 2
    if squeeze:
        plane = plane[None]
    out = plane_executor(pp)(plane)
    return out[0] if squeeze else out
