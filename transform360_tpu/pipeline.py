"""Batched frame pipeline: the jitted per-frame driver.

The reference's steady-state path loops planes per frame and crosses a C ABI
into the engine (``vf_transform360.c:338-402``).  Here the whole frame —
prefilter → gather/interpolate → optional INTER_AREA — is one jitted XLA
program per plane class, batched over frames.

Layout: planes enter as uint8 ``[B, H, W]`` and are transposed to
batch-minor ``[H, W, B]`` on device, so the remap gathers fetch contiguous
``B``-lane rows and the prefilter's weighted shifts broadcast across lanes.
This batch axis is also the sharding axis for multi-chip execution (the
TPU-native replacement for the reference's pthread-per-segment fan-out —
SURVEY §5): shard ``B`` over an ICI mesh and every stage stays local, no
collectives in the math path.

Rounding parity: OpenCV's fixed-point remap accumulates to integers and
rounds half-up; we use ``floor(x + 0.5)`` with uint8 saturation, applied
once after remap and once after the INTER_AREA epilogue (the reference
round-trips through uint8 between the two, VideoFrameTransform.cpp:755-777).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import TransformConfig
from .filtering import BandSpec, BlurPlan, apply_blur
from .plan import PlanePlan, TransformPlan
from .sampling import SampleSpec, apply_area_resize, remap_plane

# --- pytree registration: arrays are traced leaves, structure is static ---

jax.tree_util.register_dataclass(
    SampleSpec,
    data_fields=["base_y", "base_x", "frac_y", "frac_x", "valid"],
    meta_fields=["in_w", "in_h", "interp", "wrap"],
)
jax.tree_util.register_dataclass(
    BandSpec, data_fields=["kx", "ky"], meta_fields=["top", "height"]
)
jax.tree_util.register_dataclass(
    BlurPlan,
    data_fields=["bands"],
    meta_fields=["eye_w", "eye_h", "n_tiles", "tile_w", "stereo"],
)
jax.tree_util.register_dataclass(
    PlanePlan,
    data_fields=["spec", "blur", "area_row", "area_col"],
    meta_fields=[
        "in_w", "in_h", "out_w", "out_h", "scaled_w", "scaled_h", "fill",
    ],
)
jax.tree_util.register_dataclass(
    TransformPlan,
    data_fields=["luma", "chroma"],
    meta_fields=["cfg", "in_w", "in_h", "out_w", "out_h"],
)


def device_put_plan(plan: TransformPlan, device=None) -> TransformPlan:
    """Move all plan arrays to device once (plans are reused across frames)."""
    return jax.device_put(plan, device)


def _round_u8(x: jnp.ndarray) -> jnp.ndarray:
    """OpenCV-style half-up rounding with uint8 saturation."""
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0).astype(jnp.uint8)


def _plane_forward(pp: PlanePlan, plane_hwb: jnp.ndarray) -> jnp.ndarray:
    """Transform one plane class: f32 [H, W, B] → uint8 [out_h, out_w, B]."""
    x = apply_blur(pp.blur, plane_hwb)
    spec = pp.spec
    out = remap_plane(
        spec,
        spec.base_y,
        spec.base_x,
        spec.frac_y,
        spec.frac_x,
        spec.valid,
        x,
        float(pp.fill),
    )
    out = _round_u8(out)
    if pp.area_row is not None:
        resized = apply_area_resize(
            out.astype(jnp.float32), pp.area_row, pp.area_col
        )
        out = _round_u8(resized)
    return out


@jax.jit
def _plane_step(pp: PlanePlan, plane_bhw: jnp.ndarray) -> jnp.ndarray:
    """uint8 [B, H, W] → uint8 [B, out_h, out_w]."""
    hwb = plane_bhw.transpose(1, 2, 0).astype(jnp.float32)
    out = _plane_forward(pp, hwb)
    return out.transpose(2, 0, 1)


@jax.jit
def _frame_step(plan: TransformPlan, y, u, v):
    """Full YUV420 frame batch. Three image planes share two map planes
    (plane 1 and 2 both use the chroma plan — ``vf_transform360.c:372``)."""
    return (
        _plane_step(plan.luma, y),
        _plane_step(plan.chroma, u),
        _plane_step(plan.chroma, v),
    )


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
    out = _plane_step(pp, plane)
    return out[0] if squeeze else out
