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
import threading
import json
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from . import geometry, sampling
from .config import (
    Interpolation,
    Layout,
    StereoFormat,
    TransformConfig,
    chroma_dims,
    get_pixel_format,
)
from .filtering import BandSpec, BlurPlan, _expand_cols, build_blur_plan
from .sampling import SampleSpec, area_matrix, make_sample_spec


class _LazyWindowPlan:
    """Deferred window-gather kernel plan (ops.remap_pallas).

    Building it is by far the most expensive plan stage (~80% of
    build_plan for large plans — 11.8s of 14.5s for the 4K->3072 cubic
    config) yet it only serves batches below pipeline.LANE_MIN_BATCH;
    the lane path covers everything else.  Defer it until the first
    small-batch call; `.get()` is memoized and thread-safe."""

    def __init__(self, spec: SampleSpec, fill: float):
        self._spec = spec
        self._fill = fill
        self._built = False
        self._plan = None
        self._lock = threading.Lock()

    def get(self):
        with self._lock:
            if not self._built:
                from .ops.remap_pallas import build_pallas_remap

                self._plan = build_pallas_remap(self._spec, self._fill)
                self._built = True
            return self._plan


@dataclasses.dataclass(frozen=True)
class PlanePlan:
    """Everything needed to transform one plane class (luma or chroma)."""

    key: str  # identity for the compiled-executor cache
    spec: SampleSpec  # static structure + host arrays
    pallas: "_LazyWindowPlan"  # deferred ops.remap_pallas plan (see class)
    blur: Optional[BlurPlan]
    in_w: int
    in_h: int
    out_w: int  # final output dims (post INTER_AREA if scaled)
    out_h: int
    scaled_w: int  # warp-map dims (== out dims unless supersampling)
    scaled_h: int
    fill: int  # transparent-border fill: 0 luma, neutral chroma (128<<d-8)
    area_row: Optional[np.ndarray]  # [out_h, scaled_h]
    area_col: Optional[np.ndarray]  # [out_w, scaled_w]
    depth: int = 8  # sample bit depth; >8 routes to the XLA path (u16)


@dataclasses.dataclass(frozen=True)
class TransformPlan:
    cfg: TransformConfig
    in_w: int
    in_h: int
    out_w: int
    out_h: int
    luma: PlanePlan
    chroma: Optional[PlanePlan]  # None for single-plane formats (gray)
    pix_fmt: str = "yuv420p"
    n_planes: int = 3


def _build_plane_plan(
    cfg: TransformConfig,
    in_w: int,
    in_h: int,
    out_w: int,
    out_h: int,
    map_plane_index: int,
    depth: int = 8,
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
    if depth != 8:
        key += f":d{depth}"
    # barrel UV fill 128 (VideoFrameTransform.cpp:743-762), scaled to the
    # format's neutral value at higher bit depths
    fill = (128 << (depth - 8)) if map_plane_index else 0
    return PlanePlan(
        key=key,
        spec=spec,
        pallas=_LazyWindowPlan(spec, float(fill)),
        blur=blur,
        in_w=in_w,
        in_h=in_h,
        out_w=out_w,
        out_h=out_h,
        scaled_w=scaled_w,
        scaled_h=scaled_h,
        fill=fill,
        area_row=area_matrix(scaled_h, out_h) if need_resize else None,
        area_col=area_matrix(scaled_w, out_w) if need_resize else None,
        depth=depth,
    )


_PLAN_CACHE: Dict[Tuple, TransformPlan] = {}


def build_plan(
    cfg: TransformConfig,
    in_w: int,
    in_h: int,
    out_w: int,
    out_h: int,
    pix_fmt="yuv420p",
) -> TransformPlan:
    """Build (or fetch the memoized) full-frame plan.

    Stereo GUESS must already be resolved (see
    :func:`transform360_tpu.config.negotiate_output_geometry`).
    Two map planes serve all image planes: chroma dims come from the
    pixel format's log2 chroma shifts, so yuv422p/yuv444p/gray work
    through the same machinery (``vf_transform360.c:87-97,147-162``).
    """
    if StereoFormat.GUESS in (cfg.input_stereo_format, cfg.output_stereo_format):
        raise ValueError("resolve GUESS stereo formats before building a plan")
    pf = get_pixel_format(pix_fmt)
    key = (cfg.cache_key(), in_w, in_h, out_w, out_h, pf.name)
    hit = _PLAN_CACHE.get(key)
    if hit is not None:
        return hit
    chroma = None
    if pf.n_planes > 1:
        c_in_w, c_in_h = chroma_dims(in_w, in_h, pf)
        c_out_w, c_out_h = chroma_dims(out_w, out_h, pf)
        chroma = _build_plane_plan(
            cfg, c_in_w, c_in_h, c_out_w, c_out_h, 1, depth=pf.depth
        )
    plan = TransformPlan(
        cfg=cfg,
        in_w=in_w,
        in_h=in_h,
        out_w=out_w,
        out_h=out_h,
        luma=_build_plane_plan(
            cfg, in_w, in_h, out_w, out_h, 0, depth=pf.depth
        ),
        chroma=chroma,
        pix_fmt=pf.name,
        n_planes=pf.n_planes,
    )
    _PLAN_CACHE[key] = plan
    return plan


def clear_plan_cache() -> None:
    _PLAN_CACHE.clear()


# ---------------------------------------------------------------------------
# Serialization (checkpoint/resume analog): versioned .npz — numpy arrays
# plus a JSON header.  No pickle anywhere, so untrusted plan files cannot
# execute code on load; unknown versions are rejected.
# ---------------------------------------------------------------------------

PLAN_FORMAT = "transform360_tpu-plan"
# v1: sample spec + blur bands + INTER_AREA matrices
# v2: + derived lane-kernel plans (remap classes, MXU blur work items) so
#     a restarted process skips the Python kernel-plan rebuild too
#     (measured cold-start: flagship 4K ~4.6 s -> ~1.4 s of pure Python;
#     the 4K->3072 cubic plan ~12.4 s -> load-bound).  v1 files still
#     load (kernel plans rebuild lazily as before).
# v3: exact quantized array storage.  Every payload value is already
#     low-entropy by construction — fractions/tap weights derive from the
#     1/32 cv::convertMaps quantization (sampling.py: INTER_TAB_SIZE), so
#     a float32 array holds at most a few dozen distinct values, and lane
#     index rows are window-relative u8-range offsets — so integer arrays
#     downcast to the smallest dtype that holds their range and float
#     arrays with few distinct values store as a value table + u8/u16
#     codes.  Reconstruction is bit-exact (the decoder gathers the very
#     float32 values that were saved).  v1/v2 files still load.
PLAN_FORMAT_VERSION = 3

_ENUM_FIELDS = {
    "input_layout": Layout,
    "output_layout": Layout,
    "input_stereo_format": StereoFormat,
    "output_stereo_format": StereoFormat,
    "interpolation_alg": Interpolation,
}


# ---- v3 exact quantized array codec -------------------------------------

def _encode_arrays(arrays: Dict[str, np.ndarray]):
    """Shrink plan arrays losslessly for storage (see v3 note above).

    Returns ``(packed, enc)`` where ``enc`` maps an array name to its
    encoding record: ``{"c": "int", "dtype": d}`` (integer downcast —
    restore by casting back to ``d``) or ``{"c": "dict", "dtype": d}``
    (value-table lookup: ``name`` holds the codes, ``name.enc_uniq`` the
    table).  Arrays that gain nothing stay raw and get no record.
    """
    packed: Dict[str, np.ndarray] = {}
    enc: Dict[str, dict] = {}
    for k, a in arrays.items():
        a = np.asarray(a)
        if a.dtype.kind in "iu" and a.size and a.itemsize > 1:
            lo, hi = int(a.min()), int(a.max())
            for dt in (np.uint8, np.int16, np.uint16, np.int32):
                info = np.iinfo(dt)
                if info.min <= lo and hi <= info.max:
                    break
            if np.dtype(dt).itemsize < a.itemsize:
                packed[k] = a.astype(dt)
                enc[k] = {"c": "int", "dtype": a.dtype.name}
                continue
        elif a.dtype.kind == "f" and a.size > 4096:
            uniq, codes = np.unique(a, return_inverse=True)
            if uniq.size <= np.iinfo(np.uint16).max + 1:
                ct = np.uint8 if uniq.size <= 256 else np.uint16
                packed[k] = codes.astype(ct).reshape(a.shape)
                packed[f"{k}.enc_uniq"] = uniq
                enc[k] = {"c": "dict", "dtype": a.dtype.name}
                continue
        packed[k] = a
    return packed, enc


class _DecodingReader:
    """Read-through view of a plan .npz that undoes the v3 encoding, so
    the v1/v2 loaders index it unchanged."""

    def __init__(self, data, enc: Dict[str, dict]):
        self._data = data
        self._enc = enc

    def __contains__(self, k: str) -> bool:
        return k in getattr(self._data, "files", self._data)

    def __getitem__(self, k: str) -> np.ndarray:
        a = self._data[k]
        e = self._enc.get(k)
        if e is None:
            return a
        if e["c"] == "int":
            return a.astype(e["dtype"])
        return self._data[f"{k}.enc_uniq"].astype(e["dtype"])[a]


def _plane_arrays(prefix: str, pp: PlanePlan) -> Dict[str, np.ndarray]:
    arrs = {
        f"{prefix}.base_y": pp.spec.base_y,
        f"{prefix}.base_x": pp.spec.base_x,
        f"{prefix}.frac_y": pp.spec.frac_y,
        f"{prefix}.frac_x": pp.spec.frac_x,
    }
    if pp.spec.valid is not None:
        arrs[f"{prefix}.valid"] = pp.spec.valid
    if pp.blur is not None:
        for k, band in enumerate(pp.blur.bands):
            arrs[f"{prefix}.band{k}.kx"] = band.kx
            arrs[f"{prefix}.band{k}.ky"] = band.ky
    if pp.area_row is not None:
        arrs[f"{prefix}.area_row"] = pp.area_row
        arrs[f"{prefix}.area_col"] = pp.area_col
    return arrs


def _plane_meta(pp: PlanePlan) -> dict:
    meta = {
        "key": pp.key,
        "in_w": pp.in_w,
        "in_h": pp.in_h,
        "out_w": pp.out_w,
        "out_h": pp.out_h,
        "scaled_w": pp.scaled_w,
        "scaled_h": pp.scaled_h,
        "fill": pp.fill,
        "depth": pp.depth,
        "wrap": pp.spec.wrap,
        "interp": int(pp.spec.interp),
        "blur": None,
    }
    if pp.blur is not None:
        meta["blur"] = {
            "eye_w": pp.blur.eye_w,
            "eye_h": pp.blur.eye_h,
            "n_tiles": pp.blur.n_tiles,
            "tile_w": pp.blur.tile_w,
            "stereo": int(pp.blur.stereo),
            "bands": [
                {"top": b.top, "height": b.height} for b in pp.blur.bands
            ],
        }
    return meta


def _plane_from_npz(prefix: str, meta: dict, data) -> PlanePlan:
    spec = SampleSpec(
        base_y=data[f"{prefix}.base_y"],
        base_x=data[f"{prefix}.base_x"],
        frac_y=data[f"{prefix}.frac_y"],
        frac_x=data[f"{prefix}.frac_x"],
        valid=data[f"{prefix}.valid"] if f"{prefix}.valid" in data else None,
        in_w=meta["in_w"],
        in_h=meta["in_h"],
        interp=Interpolation(meta["interp"]),
        wrap=meta["wrap"],
    )
    blur = None
    if meta["blur"] is not None:
        bm = meta["blur"]

        def band(k, b):
            kx = data[f"{prefix}.band{k}.kx"]
            ky = data[f"{prefix}.band{k}.ky"]
            # column-expanded taps are derived, not serialized
            return BandSpec(
                top=b["top"],
                height=b["height"],
                kx=kx,
                ky=ky,
                kx_col=_expand_cols(kx, bm["tile_w"], bm["eye_w"]),
                ky_col=_expand_cols(ky, bm["tile_w"], bm["eye_w"]),
            )

        blur = BlurPlan(
            bands=tuple(band(k, b) for k, b in enumerate(bm["bands"])),
            eye_w=bm["eye_w"],
            eye_h=bm["eye_h"],
            n_tiles=bm["n_tiles"],
            tile_w=bm["tile_w"],
            stereo=StereoFormat(bm["stereo"]),
        )
    has_area = f"{prefix}.area_row" in data
    return PlanePlan(
        key=meta["key"],
        spec=spec,
        pallas=_LazyWindowPlan(spec, float(meta["fill"])),
        blur=blur,
        in_w=meta["in_w"],
        in_h=meta["in_h"],
        out_w=meta["out_w"],
        out_h=meta["out_h"],
        scaled_w=meta["scaled_w"],
        scaled_h=meta["scaled_h"],
        fill=meta["fill"],
        area_row=data[f"{prefix}.area_row"] if has_area else None,
        area_col=data[f"{prefix}.area_col"] if has_area else None,
        depth=meta.get("depth", 8),
    )


def _lane_plan_meta_and_arrays(prefix: str, pp: PlanePlan):
    """Serialized form of the derived lane-kernel plans (remap + blur).

    Builds them through the pipeline's caches (so a later transform uses
    the very objects being saved).  The x-contraction weight table and
    pack-K groupings are cheap derivations and are rebuilt on load; the
    blur precision is an environment knob, never serialized."""
    from . import pipeline

    meta: dict = {}
    arrays: Dict[str, np.ndarray] = {}
    lane = pipeline._lane_plan(pp)
    if lane is not None:
        meta["lane"] = {
            "pad_y": lane.pad_y,
            "pad_left": lane.pad_left,
            "hp": lane.hp,
            "wp": lane.wp,
            "out_hp": lane.out_hp,
            "out_wp": lane.out_wp,
            "n_tiles": lane.n_tiles,
            "fill": lane.fill,
            "classes": [
                {
                    "win_h": c.win_h,
                    "win_w": c.win_w,
                    "n": c.n,
                    "double_buf": c.double_buf,
                    "unpack_f32": c.unpack_f32,
                }
                for c in lane.classes
            ],
            "has_fb": lane.fb_ids is not None,
        }
        for k, c in enumerate(lane.classes):
            arrays[f"{prefix}.lane.c{k}.meta"] = c.meta
            arrays[f"{prefix}.lane.c{k}.idx"] = c.idx
            arrays[f"{prefix}.lane.c{k}.wyb"] = c.wyb
        if lane.fb_ids is not None:
            for nm in ("fb_ids", "fb_idx", "fb_wy", "fb_wx", "fb_bias"):
                arrays[f"{prefix}.lane.{nm}"] = getattr(lane, nm)
    if pp.blur is not None:
        bl = pipeline._blur_lane_plan(pp)
        if bl is not None:
            meta["blur_lane"] = {
                "H": bl.H,
                "W": bl.W,
                "Wt": bl.Wt,
                "rxq_g": bl.rxq_g,
                "ry_g": bl.ry_g,
                "wwp": bl.wwp,
                "n_ty": bl.n_ty,
                "n_tx": bl.n_tx,
                "n_tiles": bl.n_tiles,
                "n_work": bl.n_work,
                "zero_w_from": bl.zero_w_from,
            }
            arrays[f"{prefix}.blur_lane.meta"] = bl.meta
            arrays[f"{prefix}.blur_lane.tapsy"] = bl.tapsy
            arrays[f"{prefix}.blur_lane.mx_bank"] = bl.mx_bank
    return meta, arrays


def _seed_lane_caches(prefix: str, pp: PlanePlan, kmeta: dict, data) -> None:
    """Rebuild the derived kernel plans from a v2 file and seed the
    pipeline caches so no Python kernel-plan rebuild runs."""
    from . import pipeline
    from .ops.blur_lane import BlurLanePlan, _env_precision
    from .ops.remap_lane import LaneClass, LaneRemapPlan, _weight_table

    lm = kmeta.get("lane")
    if lm is not None:
        classes = tuple(
            LaneClass(
                win_h=cm["win_h"],
                win_w=cm["win_w"],
                n=cm["n"],
                double_buf=cm["double_buf"],
                unpack_f32=cm["unpack_f32"],
                meta=data[f"{prefix}.lane.c{k}.meta"],
                idx=data[f"{prefix}.lane.c{k}.idx"],
                wyb=data[f"{prefix}.lane.c{k}.wyb"],
            )
            for k, cm in enumerate(lm["classes"])
        )
        fb = {
            nm: (data[f"{prefix}.lane.{nm}"] if lm["has_fb"] else None)
            for nm in ("fb_ids", "fb_idx", "fb_wy", "fb_wx", "fb_bias")
        }
        lane = LaneRemapPlan(
            interp=pp.spec.interp,
            taps=sampling._TAPS[pp.spec.interp],
            in_h=pp.spec.in_h,
            in_w=pp.spec.in_w,
            pad_y=lm["pad_y"],
            pad_left=lm["pad_left"],
            hp=lm["hp"],
            wp=lm["wp"],
            out_h=pp.scaled_h,
            out_w=pp.scaled_w,
            out_hp=lm["out_hp"],
            out_wp=lm["out_wp"],
            n_tiles=lm["n_tiles"],
            fill=lm["fill"],
            wrap=pp.spec.wrap,
            wt=_weight_table(pp.spec.interp),
            classes=classes,
            **fb,
        )
        pipeline._LANE_CACHE[pp.key] = lane
    bm = kmeta.get("blur_lane")
    if bm is not None:
        pipeline._LANE_CACHE[("blur", pp.key)] = BlurLanePlan(
            H=bm["H"],
            W=bm["W"],
            Wt=bm["Wt"],
            rxq_g=bm["rxq_g"],
            ry_g=bm["ry_g"],
            wwp=bm["wwp"],
            n_ty=bm["n_ty"],
            n_tx=bm["n_tx"],
            n_tiles=bm["n_tiles"],
            n_work=bm["n_work"],
            meta=data[f"{prefix}.blur_lane.meta"],
            tapsy=data[f"{prefix}.blur_lane.tapsy"],
            mx_bank=data[f"{prefix}.blur_lane.mx_bank"],
            zero_w_from=bm["zero_w_from"],
            precision=_env_precision(),
        )


def save_plan(
    plan: TransformPlan, path: str, include_kernel_plans: bool = True
) -> None:
    """Serialize a plan to a versioned .npz so restarts skip map generation.

    ``include_kernel_plans`` additionally embeds the derived lane-kernel
    plans (remap tile classes, MXU blur work items) — the v2 payload that
    lets a restart skip the Python kernel-plan rebuild as well."""
    kernel_meta: dict = {}
    kernel_arrays: Dict[str, np.ndarray] = {}
    if include_kernel_plans:
        km, ka = _lane_plan_meta_and_arrays("luma", plan.luma)
        kernel_meta["luma"] = km
        kernel_arrays.update(ka)
        if plan.chroma is not None:
            km, ka = _lane_plan_meta_and_arrays("chroma", plan.chroma)
            kernel_meta["chroma"] = km
            kernel_arrays.update(ka)
    payload = {
        **_plane_arrays("luma", plan.luma),
        **({} if plan.chroma is None else _plane_arrays("chroma", plan.chroma)),
        **kernel_arrays,
    }
    packed, enc = _encode_arrays(payload)
    header = {
        "format": PLAN_FORMAT,
        "version": PLAN_FORMAT_VERSION,
        "cfg": {
            k: (int(v) if isinstance(v, (Layout, StereoFormat, Interpolation)) else v)
            for k, v in dataclasses.asdict(plan.cfg).items()
        },
        "in_w": plan.in_w,
        "in_h": plan.in_h,
        "out_w": plan.out_w,
        "out_h": plan.out_h,
        "pix_fmt": plan.pix_fmt,
        "n_planes": plan.n_planes,
        "luma": _plane_meta(plan.luma),
        "chroma": None if plan.chroma is None else _plane_meta(plan.chroma),
        "kernel_plans": kernel_meta,
        "enc": enc,
    }
    arrays = {
        "header": np.frombuffer(
            json.dumps(header).encode("utf-8"), dtype=np.uint8
        ),
        **packed,
    }
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_plan(path: str) -> TransformPlan:
    """Load a plan saved by :func:`save_plan`; rejects unknown versions.

    Derived per-backend artifacts (the Pallas kernel plan) are rebuilt from
    the loaded spec — only plan-time *data* lives in the file."""
    with np.load(path, allow_pickle=False) as raw:
        try:
            header = json.loads(bytes(raw["header"]).decode("utf-8"))
        except KeyError:
            raise ValueError(f"{path} is not a transform360_tpu plan file")
        if header.get("format") != PLAN_FORMAT:
            raise ValueError(f"{path} is not a transform360_tpu plan file")
        if header.get("version") not in (1, 2, PLAN_FORMAT_VERSION):
            raise ValueError(
                f"unsupported plan version {header.get('version')!r} "
                f"(supported: 1, 2, {PLAN_FORMAT_VERSION})"
            )
        # v3 quantized arrays decode on access; v1/v2 have no "enc" map
        data = _DecodingReader(raw, header.get("enc") or {})
        cfg_d = dict(header["cfg"])
        for k, enum_t in _ENUM_FIELDS.items():
            cfg_d[k] = enum_t(cfg_d[k])
        cfg = TransformConfig(**cfg_d)
        plan = TransformPlan(
            cfg=cfg,
            in_w=header["in_w"],
            in_h=header["in_h"],
            out_w=header["out_w"],
            out_h=header["out_h"],
            pix_fmt=header.get("pix_fmt", "yuv420p"),
            n_planes=header.get("n_planes", 3),
            luma=_plane_from_npz("luma", header["luma"], data),
            chroma=(
                None
                if header["chroma"] is None
                else _plane_from_npz("chroma", header["chroma"], data)
            ),
        )
        # v2 payload: pre-seed the derived kernel plans (a v1 file simply
        # rebuilds them lazily as before)
        kmeta = header.get("kernel_plans") or {}
        if "luma" in kmeta:
            _seed_lane_caches("luma", plan.luma, kmeta["luma"], data)
        if plan.chroma is not None and "chroma" in kmeta:
            _seed_lane_caches("chroma", plan.chroma, kmeta["chroma"], data)
        return plan
