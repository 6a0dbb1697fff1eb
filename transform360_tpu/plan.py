"""Transform plans: the cached per-config artifact.

The reference builds its warp maps lazily on frame 1 and keeps them for the
stream's lifetime (``vf_transform360.c:338-352``); the kernels/segment
configs live beside them in the engine object
(``VideoFrameTransform.h:147-159``).  The TPU analog is an explicit
:class:`TransformPlan`: per map-plane (0 = luma, 1 = chroma — U and V share
the chroma plane, ``vf_transform360.c:372``) it holds the quantized sample
spec, the prefilter plan, and the optional INTER_AREA matrices.  Plans are
memoized by (config hash, dims) and serializable to ``.npz`` so pipelines
restart without re-deriving maps (the checkpoint/resume analog noted in
SURVEY §5).

Plans are registered as JAX pytrees: device arrays are leaves (traced), all
structure (tap counts, band raster, dims) is static aux data — one compiled
executable serves any number of frames for a given plan shape.
"""

from __future__ import annotations

import dataclasses
import io
import json
import pickle
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from . import geometry, sampling
from .config import Interpolation, Layout, StereoFormat, TransformConfig, chroma_dims
from .filtering import BandSpec, BlurPlan, build_blur_plan
from .sampling import SampleSpec, area_matrix, make_sample_spec


@dataclasses.dataclass(frozen=True)
class PlanePlan:
    """Everything needed to transform one plane class (luma or chroma)."""

    key: str  # identity for the compiled-executor cache
    spec: SampleSpec  # static structure + host arrays
    pallas: Optional[object]  # ops.remap_pallas.PallasRemapPlan or None
    blur: Optional[BlurPlan]
    in_w: int
    in_h: int
    out_w: int  # final output dims (post INTER_AREA if scaled)
    out_h: int
    scaled_w: int  # warp-map dims (== out dims unless supersampling)
    scaled_h: int
    fill: int  # transparent-border fill: 0 luma, 128 chroma
    area_row: Optional[np.ndarray]  # [out_h, scaled_h]
    area_col: Optional[np.ndarray]  # [out_w, scaled_w]


@dataclasses.dataclass(frozen=True)
class TransformPlan:
    cfg: TransformConfig
    in_w: int
    in_h: int
    out_w: int
    out_h: int
    luma: PlanePlan
    chroma: PlanePlan


def _build_plane_plan(
    cfg: TransformConfig,
    in_w: int,
    in_h: int,
    out_w: int,
    out_h: int,
    map_plane_index: int,
) -> PlanePlan:
    """Build one plane-class plan (generateMapForPlane analog,
    VideoFrameTransform.cpp:504-576)."""
    cfg.validate()
    warp = np.asarray(geometry.build_warp_map(cfg, in_w, in_h, out_w, out_h))
    scaled_h, scaled_w = warp.shape[:2]
    is_barrel = cfg.output_layout in (Layout.BARREL, Layout.BARREL_SPLIT)
    spec = make_sample_spec(
        warp, in_w, in_h, cfg.interpolation_alg, wrap=not is_barrel
    )
    blur = build_blur_plan(cfg, in_w, in_h, scaled_w, scaled_h)
    need_resize = (scaled_w != out_w) or (scaled_h != out_h)
    key = f"{cfg.cache_key()}:{in_w}x{in_h}:{out_w}x{out_h}:p{map_plane_index}"
    from .ops.remap_pallas import build_pallas_remap

    pallas_plan = build_pallas_remap(spec, 128.0 if map_plane_index else 0.0)
    return PlanePlan(
        key=key,
        spec=spec,
        pallas=pallas_plan,
        blur=blur,
        in_w=in_w,
        in_h=in_h,
        out_w=out_w,
        out_h=out_h,
        scaled_w=scaled_w,
        scaled_h=scaled_h,
        fill=128 if map_plane_index else 0,
        area_row=area_matrix(scaled_h, out_h) if need_resize else None,
        area_col=area_matrix(scaled_w, out_w) if need_resize else None,
    )


_PLAN_CACHE: Dict[Tuple, TransformPlan] = {}


def build_plan(
    cfg: TransformConfig, in_w: int, in_h: int, out_w: int, out_h: int
) -> TransformPlan:
    """Build (or fetch the memoized) full-frame plan.

    Stereo GUESS must already be resolved (see
    :func:`transform360_tpu.config.negotiate_output_geometry`).
    Two map planes serve three image planes: chroma dims are the yuv420
    ceil-halved dims (``vf_transform360.c:87-97,147-162``).
    """
    if StereoFormat.GUESS in (cfg.input_stereo_format, cfg.output_stereo_format):
        raise ValueError("resolve GUESS stereo formats before building a plan")
    key = (cfg.cache_key(), in_w, in_h, out_w, out_h)
    hit = _PLAN_CACHE.get(key)
    if hit is not None:
        return hit
    c_in_w, c_in_h = chroma_dims(in_w, in_h)
    c_out_w, c_out_h = chroma_dims(out_w, out_h)
    plan = TransformPlan(
        cfg=cfg,
        in_w=in_w,
        in_h=in_h,
        out_w=out_w,
        out_h=out_h,
        luma=_build_plane_plan(cfg, in_w, in_h, out_w, out_h, 0),
        chroma=_build_plane_plan(cfg, c_in_w, c_in_h, c_out_w, c_out_h, 1),
    )
    _PLAN_CACHE[key] = plan
    return plan


def clear_plan_cache() -> None:
    _PLAN_CACHE.clear()


# ---------------------------------------------------------------------------
# Serialization (checkpoint/resume analog)
# ---------------------------------------------------------------------------


def save_plan(plan: TransformPlan, path: str) -> None:
    """Serialize a plan to disk so restarts skip map generation."""
    with open(path, "wb") as f:
        pickle.dump(plan, f)


def load_plan(path: str) -> TransformPlan:
    with open(path, "rb") as f:
        plan = pickle.load(f)
    if not isinstance(plan, TransformPlan):
        raise ValueError(f"{path} does not contain a TransformPlan")
    return plan
