"""Batched frame pipeline: plan-specialized jitted executors.

The reference's steady-state path loops planes per frame and crosses a C ABI
into the engine (``vf_transform360.c:338-402``).  Here the whole per-plane
flow — prefilter → uint8 round → remap → optional INTER_AREA — is one jitted
XLA program per plane class, specialized to the plan (warp windows, tap
indices, filter taps and masks are plan-time artifacts).

Layout: planes are conventional batch-major uint8 ``[B, H, W]`` end to end.

Remap backend selection (per plane, at executor build):

* **pallas** — the window-gather kernel (:mod:`ops.remap_pallas`): the
  production TPU path, ~40x faster than XLA's gather.  Chosen automatically
  on TPU backends when the plan built kernel classes for the plane.
* **xla** — portable gather path (:mod:`sampling`), used on CPU, for tiny
  planes, and when ``TRANSFORM360_FORCE_XLA=1``.

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

import os
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .filtering import apply_blur
from .ops.blur_lane import blur_lane, build_blur_lane
from .ops.remap_lane import (
    build_lane_merged,
    build_lane_pack,
    build_lane_remap,
    remap_lane,
    remap_lane_hwb,
    remap_lane_hwb_pack,
)
from .ops.remap_pallas import pallas_eligible, remap_pallas
from .ops.staging import stage_program, staged
from .plan import PlanePlan, TransformPlan
from . import sampling
from .sampling import (
    apply_area_resize,
    const_budget_bytes,
    fixup_values,
    partial_fixup,
    remap_const,
    remap_traced,
)

# Batch size at or above which the lane-batched kernel (batch in vector
# lanes) is preferred.  A padded lane pass costs the same regardless of
# how many of the 128 lanes hold real frames (the minor dim is
# hardware-padded either way): 106 ms plain, 95.4 ms merged-pack2
# (flagship), while the window-gather path costs 100.8 ms at batch 8 /
# 63.5 at 4 / 43.5 at 2 / 35.3 at 1 (tools/probe_small_batch.py,
# 2026-08-20 post-CLASS_T).  Crossover: lane wins from batch 8 (95.4 vs
# 100.8); below 8 the window chunks are cheaper.  tools/psnr_check.py
# forces BOTH paths so each keeps real-chip fidelity evidence.
LANE_MIN_BATCH = int(os.environ.get("TRANSFORM360_LANE_MIN_BATCH", "8"))

# Low-occupancy tile packing: at batch <= 128/K the real frames are
# duplicated into every lane group of width 128/K and the lane remap
# runs K tiles per grid step (one per group), sharing the
# x-contraction/round/store between them (ops/remap_lane.py,
# LanePackClass).  LANE_PACK_MAX caps K (1 disables packing).  The
# default is 2 from measurement, not a scaling law: the pass is
# body-bound per tile (slice+FMA dominate; only the shared contraction
# amortizes), so the flagship pass costs 106 ms plain, 99.8 packed x2,
# 101.8 x4 (bigger windows lose the f32 pre-unpack), 146.9 x8 (loses
# double-buffered window DMA too) — tools/probe_pack_cost.py,
# docs/perf.md "Small batch".  Env: TRANSFORM360_LANE_PACK_MAX, or the
# legacy TRANSFORM360_LANE_PACK2=0 to disable.
LANE_PACK_MAX = int(
    os.environ.get(
        "TRANSFORM360_LANE_PACK_MAX",
        "1" if os.environ.get("TRANSFORM360_LANE_PACK2") == "0" else "2",
    )
)

# Below this batch size the prefilter runs in IMAGE layout (apply_blur on
# [B, H, W], W in the vector lanes — full lane occupancy) instead of the
# lane-layout blur pass, whose cost is occupancy-independent (~33 ms
# luma+chroma per pass regardless of how many of the 128 lanes are real;
# the XLA blur is HBM-bound at ~0.75 ms/frame, so it wins below ~2 dozen
# frames).  Crossover measured by tools/probe_small_batch.py.
BLUR_IMG_MAX_BATCH = int(
    os.environ.get("TRANSFORM360_BLUR_IMG_MAX_BATCH", "16")
)

# Merged-window packing: group K spatially-adjacent tiles and DMA ONE
# bounding-box window per group instead of K windows, so the f32
# pre-unpack and double-buffering survive at K >= 4 (the VMEM forfeits
# that capped slot-packing at K=2 — NOTES.md "Pack-K").  Falls back to
# slot-packing per plane when nothing merges.
# Env: TRANSFORM360_LANE_MERGED=0 disables.
LANE_MERGED = os.environ.get("TRANSFORM360_LANE_MERGED", "1") != "0"

_LANE_CACHE: Dict[str, object] = {}
_LANE_MISS = object()


def _lane_plan(pp: PlanePlan):
    """Lane-kernel plan for a plane class, built lazily (it walks every
    output tile in Python) and cached by plan identity."""
    lp = _LANE_CACHE.get(pp.key, _LANE_MISS)
    if lp is _LANE_MISS:
        lp = build_lane_remap(pp.spec, float(pp.fill))
        _LANE_CACHE[pp.key] = lp
    return lp


def _blur_lane_plan(pp: PlanePlan):
    key = ("blur", pp.key)
    bl = _LANE_CACHE.get(key, _LANE_MISS)
    if bl is _LANE_MISS:
        bl = build_blur_lane(pp.blur, pp.in_h, pp.in_w)
        _LANE_CACHE[key] = bl
    return bl


def _lane_pack_plan(pp: PlanePlan, k: int):
    key = ("pack", k, LANE_MERGED, pp.key)
    lp = _LANE_CACHE.get(key, _LANE_MISS)
    if lp is _LANE_MISS:
        lp = build_lane_merged(_lane_plan(pp), k) if LANE_MERGED else None
        if lp is None:
            lp = build_lane_pack(_lane_plan(pp), k)
        _LANE_CACHE[key] = lp
    return lp


def _pack_k_for_batch(b: int) -> int:
    """Largest pack factor K in {2,4,8} (capped by LANE_PACK_MAX) whose
    lane group of 128/K lanes still holds the batch; 1 = no packing."""
    k = 1
    while k < LANE_PACK_MAX and 2 * k <= 8 and b <= 128 // (2 * k):
        k *= 2
    return k


def _fixup(pp: PlanePlan):
    """BORDER_TRANSPARENT partial-footprint correction set for the kernel
    backends (see sampling.partial_fixup), cached by plan identity."""
    key = ("fixup", pp.key)
    f = _LANE_CACHE.get(key, _LANE_MISS)
    if f is _LANE_MISS:
        f = partial_fixup(pp.spec, float(pp.fill))
        _LANE_CACHE[key] = f
    return f


def _lane_chunked(pp: PlanePlan, lane, x, interpret):
    """Full lane-layout plane program for uint8 [B, H, W]: one transpose
    into [H, W, 128] per 128-frame chunk, blur (when the lane blur covers
    the config) and remap both batch-in-lanes, transpose back."""
    bl = _blur_lane_plan(pp) if pp.blur is not None else None
    if bl is not None and x.shape[0] <= BLUR_IMG_MAX_BATCH:
        # low occupancy: the image-layout XLA blur (full lanes) beats the
        # occupancy-independent lane-layout pass
        bl = None
    if pp.blur is not None and bl is None:
        # prefilter config outside the lane blur's scope (or a small
        # batch): XLA blur first
        x = _round_u8(apply_blur(pp.blur, x.astype(jnp.float32)))
    fix = _fixup(pp)
    B = x.shape[0]
    pack_k = _pack_k_for_batch(B)
    if pack_k > 1:
        packp = _lane_pack_plan(pp, pack_k)
        if packp is not None:
            # duplicate the (zero-padded) frames into every lane group of
            # width 128/K so each step serves K tiles at full occupancy
            G = 128 // pack_k
            c = x
            if c.shape[0] < G:
                c = jnp.concatenate(
                    [c, jnp.zeros((G - c.shape[0],) + c.shape[1:],
                                  jnp.uint8)],
                    axis=0,
                )
            c = jnp.concatenate([c] * pack_k, axis=0)
            ct = jnp.transpose(c, (1, 2, 0))
            if bl is not None:
                ct = blur_lane(bl, ct, interpret=interpret)
            o = remap_lane_hwb_pack(packp, ct, interpret=interpret)
            if fix is not None:
                vals = _round_u8(
                    fixup_values(fix, ct.reshape(-1, 128).T)[:G]
                )
                of = o.reshape(o.shape[0], -1)
                o = of.at[:, jnp.asarray(fix[0])].set(vals).reshape(o.shape)
            return o[:B]
    outs = []
    for k in range(0, B, 128):
        c = x[k : k + 128]
        if c.shape[0] < 128:
            c = jnp.concatenate(
                [c, jnp.zeros((128 - c.shape[0],) + c.shape[1:], jnp.uint8)],
                axis=0,
            )
        ct = jnp.transpose(c, (1, 2, 0))
        if bl is not None:
            ct = blur_lane(bl, ct, interpret=interpret)
        o = remap_lane_hwb(lane, ct, interpret=interpret)
        if fix is not None:
            # exact BORDER_TRANSPARENT partial footprints — same math as
            # the window-gather path (sampling.fixup_values); the lane
            # layout is transposed to its [B, H*W] contract
            vals = _round_u8(fixup_values(fix, ct.reshape(-1, 128).T))
            of = o.reshape(o.shape[0], -1)
            o = of.at[:, jnp.asarray(fix[0])].set(vals).reshape(o.shape)
        outs.append(o)
    out = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    return out[:B]


def _round_u8(x: jnp.ndarray) -> jnp.ndarray:
    """OpenCV-style half-up rounding with uint8 saturation."""
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0).astype(jnp.uint8)


def _round_px(x: jnp.ndarray, maxval: float, dtype) -> jnp.ndarray:
    """OpenCV-style half-up rounding saturated to the sample maximum
    (255 at 8 bit; 1023/4095/65535 for the deep formats)."""
    return jnp.clip(jnp.floor(x + 0.5), 0.0, float(maxval)).astype(dtype)


def _use_pallas(pp: PlanePlan) -> bool:
    if os.environ.get("TRANSFORM360_FORCE_XLA") == "1":
        return False
    if pp.depth > 8:
        # the lane/window kernels are uint8-specialized; deep formats
        # run the XLA path (an intentional capability beyond the
        # reference, which corrupts >8-bit planes — see config.PixelFormat)
        return False
    if not pallas_eligible(pp.spec):
        return False
    return jax.default_backend() not in ("cpu",)


def _plane_program(pp: PlanePlan, use_pallas: bool, interpret: bool = False):
    """Traceable per-plane program: [B, H, W] samples in the plan's
    dtype (uint8, or uint16 for deep formats) → same dtype [B, oh, ow]."""
    spec = pp.spec
    if pp.depth <= 8:
        rnd = _round_u8
    else:
        mx, dt = float((1 << pp.depth) - 1), jnp.uint16

        def rnd(v):
            return _round_px(v, mx, dt)

    def program(x):
        lane = None
        if use_pallas and x.shape[0] >= LANE_MIN_BATCH:
            lane = _lane_plan(pp)
        if lane is not None:
            out = _lane_chunked(pp, lane, x, interpret)
        else:
            if pp.blur is not None:
                x = rnd(apply_blur(pp.blur, x.astype(jnp.float32)))
            if use_pallas:
                out = remap_pallas(pp.pallas.get(), x, interpret=interpret)
                fix = _fixup(pp)
                if fix is not None:
                    vals = fixup_values(fix, x.reshape(x.shape[0], -1))
                    of = out.reshape(out.shape[0], -1)
                    out = (
                        of.at[:, jnp.asarray(fix[0])]
                        .set(_round_u8(vals))
                        .reshape(out.shape)
                    )
            else:
                flat = x.reshape(x.shape[0], -1)
                if const_budget_bytes(spec) > sampling.MAX_CONST_BYTES:
                    # Oversized tap tables (e.g. lanczos4 at 4K) would bloat
                    # the HLO as literals; stage the spec arrays as runtime
                    # args and resolve taps in-graph instead.
                    scaled = remap_traced(
                        spec,
                        flat,
                        staged(spec.base_y),
                        staged(spec.base_x),
                        staged(spec.frac_y),
                        staged(spec.frac_x),
                        None if spec.valid is None else staged(spec.valid),
                        float(pp.fill),
                    )
                else:
                    scaled = remap_const(spec, flat, float(pp.fill))
                out = rnd(scaled).reshape(-1, pp.scaled_h, pp.scaled_w)
        if pp.area_row is not None:
            out = rnd(
                apply_area_resize(
                    out.astype(jnp.float32),
                    staged(pp.area_row),
                    staged(pp.area_col),
                )
            )
        return out

    return program


_EXEC_CACHE: Dict[Tuple[str, bool], Callable] = {}


class _StagedExecutor:
    """Shape-specialized jitted executor with plan arrays hoisted into
    runtime arguments (see :mod:`ops.staging`) — big plans would otherwise
    be embedded in the HLO as constants, bloating every compile."""

    def __init__(self, program: Callable):
        self._program = program
        self._by_shape: Dict[Tuple, Tuple[Callable, Tuple]] = {}

    def staged_for(self, x) -> Tuple[Callable, Callable, Tuple]:
        """(fn, jitted_fn, device_consts) for this input shape;
        ``fn(x, consts)`` is traceable inside a larger jit (benches
        chain it).  LANE_MIN_BATCH is part of the key: the batch-routing
        decision is baked in at trace time, so tools that flip it (e.g.
        psnr_check's dual-path sweep) must not reuse stale traces."""
        key = (tuple(x.shape), x.dtype, LANE_MIN_BATCH, LANE_PACK_MAX,
               LANE_MERGED, BLUR_IMG_MAX_BATCH)
        ent = self._by_shape.get(key)
        if ent is None:
            fn, consts = stage_program(
                self._program, jax.ShapeDtypeStruct(x.shape, x.dtype)
            )
            ent = (fn, jax.jit(fn), jax.device_put(consts))
            self._by_shape[key] = ent
        return ent

    def __call__(self, x):
        _, jfn, consts = self.staged_for(x)
        return jfn(x, consts)


def plane_executor(pp: PlanePlan) -> Callable:
    """Jitted executor for one plane class, cached by plan identity (and
    the batch-routing threshold, which the program bakes in at trace
    time)."""
    use_pallas = _use_pallas(pp)
    key = (pp.key, use_pallas, LANE_MIN_BATCH, LANE_PACK_MAX, LANE_MERGED,
           BLUR_IMG_MAX_BATCH)
    fn = _EXEC_CACHE.get(key)
    if fn is None:
        fn = _StagedExecutor(_plane_program(pp, use_pallas))
        _EXEC_CACHE[key] = fn
    return fn


def clear_executor_cache() -> None:
    _EXEC_CACHE.clear()
    _LANE_CACHE.clear()


def device_put_plan(plan: TransformPlan, device=None) -> TransformPlan:
    """Kept for API compatibility: plans are numpy-resident (their arrays
    are staged by the executors); nothing to transfer eagerly."""
    del device
    return plan


def _spans_processes(x) -> bool:
    """True for a jax.Array sharded across more than one process (a
    multi-host global batch)."""
    try:
        devs = x.sharding.device_set
    except AttributeError:
        return False
    return len({d.process_index for d in devs}) > 1


def transform_frame_planes(plan: TransformPlan, planes):
    """N-plane device fast path: uint8 [B, H, W] planes in, same layout out.

    Plane 0 uses the luma map; every other plane shares the chroma map
    (``vf_transform360.c:372``: ``plane==1||2 ? 1 : 0``).  All chroma
    planes are stacked into ONE kernel invocation — they share every plan
    constant, so this divides the chroma launch/window overhead.

    Multi-host exception: for globally-sharded inputs the chroma planes
    run individually — the eager re-slice of a stacked result would lose
    the batch sharding (XLA replicates the slice, an implicit DCN
    all-gather), whereas per-plane outputs keep their input's sharding
    and every frame stays on the process that fed it."""
    if len(planes) != plan.n_planes:
        raise ValueError(
            f"expected {plan.n_planes} plane(s) for {plan.pix_fmt}, got "
            f"{len(planes)}"
        )
    outs = [plane_executor(plan.luma)(planes[0])]
    rest = planes[1:]
    if rest:
        chroma = plane_executor(plan.chroma)
        if any(_spans_processes(p) for p in rest):
            outs.extend(chroma(p) for p in rest)
        else:
            stacked = chroma(jnp.concatenate(rest, axis=0))
            off = 0
            for p in rest:
                outs.append(stacked[off : off + p.shape[0]])
                off += p.shape[0]
    return tuple(outs)


def transform_planes(plan: TransformPlan, y, u, v):
    """YUV 3-plane convenience over :func:`transform_frame_planes`."""
    return transform_frame_planes(plan, (y, u, v))

def transform_batch(
    plan: TransformPlan,
    y,
    u=None,
    v=None,
) -> Tuple[jnp.ndarray, ...]:
    """Transform a batch of planar frames.

    ``y``: uint8 [B, H, W] (or [H, W] single frame); ``u``/``v``: the
    chroma planes (omit for single-plane formats).  Returns uint8 planes
    at the negotiated output size.
    """
    planes = [jnp.asarray(p) for p in (y, u, v) if p is not None]
    squeeze = planes[0].ndim == 2
    if squeeze:
        planes = [p[None] for p in planes]
    outs = transform_frame_planes(plan, tuple(planes))
    if squeeze:
        outs = tuple(o[0] for o in outs)
    return outs if len(outs) > 1 else outs[0]


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
    if pp is None:
        raise ValueError(f"plan has no map plane {map_plane_index} ({plan.pix_fmt})")
    plane = jnp.asarray(plane)
    squeeze = plane.ndim == 2
    if squeeze:
        plane = plane[None]
    out = plane_executor(pp)(plane)
    return out[0] if squeeze else out
