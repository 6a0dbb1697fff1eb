"""CPU golden oracle: a numpy/OpenCV transcription of the reference math.

The reference library (``/root/reference/Transform360``) only builds against
OpenCV + a hand-patched FFmpeg, so tests instead validate the TPU pipeline
against this oracle, which transcribes the math of
``VideoFrameTransform.cpp`` into per-pixel Python/numpy and uses
``cv2.remap``/``cv2.sepFilter2D``/``cv2.resize`` — the exact primitives the
reference calls — for the resampling stages.

This module is intentionally written in scalar, branch-sequential style
(mirroring the C++ control flow) so that agreement with the vectorized
JAX implementation in :mod:`transform360_tpu.geometry` is a meaningful
cross-check rather than two copies of the same code.

Host-side only; never imported by the TPU compute path.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

from .config import FaceType, Interpolation, Layout, StereoFormat, TransformConfig

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in the target env
    cv2 = None

_EPS = 1e-9
K_SIDE = 0.5  # kCubemapSideDistance, VideoFrameTransform.cpp:30

# Cube corner / axis tables, VideoFrameTransform.cpp:38-49
_P0 = (-0.5, -0.5, -0.5)
_P1 = (0.5, -0.5, -0.5)
_P3 = (0.5, 0.5, -0.5)
_P4 = (-0.5, -0.5, 0.5)
_P5 = (0.5, -0.5, 0.5)
_P6 = (-0.5, 0.5, 0.5)
_PX = (1.0, 0.0, 0.0)
_PY = (0.0, 1.0, 0.0)
_PZ = (0.0, 0.0, 1.0)
_NX = (-1.0, 0.0, 0.0)
_NZ = (0.0, 0.0, -1.0)

# face -> (p, vx, vy), standard cubemap basis (VideoFrameTransform.cpp:1153-1184)
_FACE_BASIS = {
    FaceType.RIGHT: (_P5, _NZ, _PY),
    FaceType.LEFT: (_P0, _PZ, _PY),
    FaceType.TOP: (_P6, _PX, _NZ),
    FaceType.BOTTOM: (_P0, _PX, _PZ),
    FaceType.FRONT: (_P4, _PX, _PY),
    FaceType.BACK: (_P1, _NX, _PY),
}

# face -> (p, vx, vy), 2x3 offcenter basis (VideoFrameTransform.cpp:1120-1151)
_FACE_BASIS_OFFCENTER = {
    FaceType.RIGHT: (_P4, _PY, _NZ),
    FaceType.LEFT: (_P3, _NX, _PZ),
    FaceType.TOP: (_P5, _PY, _NX),
    FaceType.BOTTOM: (_P1, _NX, _PY),
    FaceType.FRONT: (_P1, _PY, _PZ),
    FaceType.BACK: (_P5, _NX, _NZ),
}


def intersect_sphere_offset(x, y, z, ox, oy, oz) -> float:
    """Ray/unit-sphere intersection distance (VideoFrameTransform.cpp:53-75)."""
    loc = x * -ox + y * -oy + z * -oz
    odot = ox * ox + oy * oy + oz * oz
    root = loc * loc - odot + 1.0
    if root <= 0.0:
        return 0.0
    root = math.sqrt(root)
    if root < loc:
        return 0.0
    return root - loc


def normalize_equirectangular(x: float, y: float) -> Tuple[float, float]:
    """Wrap out-of-range equirect coords (VideoFrameTransform.cpp:101-123)."""
    if y >= 1.0:
        y = 2.0 - y
        x += 0.5
    elif y < 0.0:
        y = -y
        x += 0.5
    if x >= 1.0:
        x -= int(x)
    elif x < 0.0:
        x += int(-x) + 1
    return x, y


def _transform_cube_face_pos(cfg: TransformConfig, tx, ty, tz) -> Tuple[float, float]:
    """Unit direction -> CUBEMAP_32-packed input coords
    (VideoFrameTransform.cpp:796-861). Returns (-1, 0) when no face matches."""
    c = cfg.input_expand_coef
    if tz <= -K_SIDE:
        x, y = tx / tz, ty / tz
        if -1.0 <= x <= 1.0 and -1.0 <= y <= 1.0:
            return (5.0 + x / c) / 6.0, (3.0 + y / c) / 4.0
    if tz >= K_SIDE:
        x, y = tx / tz, ty / tz
        if -1.0 <= x <= 1.0 and -1.0 <= y <= 1.0:
            return (3.0 + x / c) / 6.0, (3.0 - y / c) / 4.0
    if tx <= -K_SIDE:
        x, y = tz / tx, ty / tx
        if -1.0 <= x <= 1.0 and -1.0 <= y <= 1.0:
            return (3.0 - x / c) / 6.0, (1.0 + y / c) / 4.0
    if tx >= K_SIDE:
        x, y = tz / tx, ty / tx
        if -1.0 <= x <= 1.0 and -1.0 <= y <= 1.0:
            return (1.0 - x / c) / 6.0, (1.0 - y / c) / 4.0
    if ty <= -K_SIDE:
        x, y = tx / ty, tz / ty
        if -1.0 <= x <= 1.0 and -1.0 <= y <= 1.0:
            return (1.0 - x / c) / 6.0, (3.0 + y / c) / 4.0
    if ty >= K_SIDE:
        x, y = tx / ty, tz / ty
        if -1.0 <= x <= 1.0 and -1.0 <= y <= 1.0:
            return (5.0 + x / c) / 6.0, (1.0 + y / c) / 4.0
    return -1.0, 0.0


def _transform_input_pos(
    cfg: TransformConfig, tx, ty, tz, input_pixel_width
) -> Tuple[float, float]:
    """3D direction -> normalized input coords (VideoFrameTransform.cpp:863-891)."""
    d = math.sqrt(tx * tx + ty * ty + tz * tz)
    if cfg.input_layout == Layout.CUBEMAP_32:
        return _transform_cube_face_pos(cfg, tx / d, ty / d, tz / d)
    out_x = -math.atan2(-tx / d, tz / d) / (2.0 * math.pi) + 0.5
    if cfg.output_layout in (Layout.BARREL, Layout.BARREL_SPLIT):
        out_x = min(out_x, 1.0 - input_pixel_width * 0.5)
        out_x = max(out_x, input_pixel_width * 0.5)
    out_y = math.asin(-ty / d) / math.pi + 0.5
    return out_x, out_y


def transform_pos(
    cfg: TransformConfig, x: float, y: float, input_pixel_width: float
) -> Tuple[float, float, bool]:
    """Scalar transcription of transformPos (VideoFrameTransform.cpp:893-1316).

    Maps one normalized output coordinate to a normalized input coordinate.
    Returns (out_x, out_y, has_mapping); when has_mapping is False, the
    outputs are the reference's outside markers (-1, 0).
    """
    is_right = 0
    # Output stereo eye split (:903-931); skipped entirely for MONO input.
    if cfg.input_stereo_format != StereoFormat.MONO:
        if cfg.output_stereo_format == StereoFormat.LR:
            if x > 0.5:
                x = (x - 0.5) / 0.5
                is_right = 1
            else:
                x = x / 0.5
        elif cfg.output_stereo_format == StereoFormat.TB:
            if y > 0.5:
                y = (y - 0.5) / 0.5
                if cfg.vflip:
                    y = 1.0 - y
                is_right = 1
            else:
                y = y / 0.5

    has_mapping = True
    if cfg.output_layout != Layout.FLAT_FIXED:
        y = 1.0 - y  # vertical flip (:936-938)

    face = 0
    yaw = pitch = 0.0
    lay = cfg.output_layout
    coef = cfg.expand_coef

    # Per-layout decode (:942-1083)
    if lay == Layout.CUBEMAP_32:
        v_face, h_face = int(y * 2), int(x * 3)
        x, y = x * 3.0 - h_face, y * 2.0 - v_face
        face = h_face + (1 - v_face) * 3
    elif lay == Layout.CUBEMAP_23_OFFCENTER:
        v_face, h_face = int(y * 3), int(x * 2)
        x, y = x * 2.0 - h_face, y * 3.0 - v_face
        face = h_face + (2 - v_face) * 2
    elif lay == Layout.FLAT_FIXED:
        pass
    elif lay == Layout.EQUIRECT:
        yaw = (2.0 * x - 1.0) * math.pi
        pitch = (y - 0.5) * math.pi
    elif lay == Layout.BARREL:
        if x <= 0.8:
            yaw = (2.5 * x - 1.0) * coef * math.pi
            pitch = (y * 0.5 - 0.25) * coef * math.pi
            face = -1
        else:
            v_face = int(y * 2)
            face = int(FaceType.TOP) if v_face == 1 else int(FaceType.BOTTOM)
            x = x * 5.0 - 4.0
            y = y * 2.0 - v_face
    elif lay == Layout.BARREL_SPLIT:
        if 3.0 * x <= 2.0:
            v_face = int(y * 2)
            yaw = ((1.5 * x - 0.5) * coef - v_face + 1.0) * math.pi
            pitch = (y - 0.25 - 0.5 * v_face) * coef * math.pi
            face = -1
        else:
            half_v_face = int(y * 4)
            face = (
                int(FaceType.TOP) if half_v_face in (1, 3) else int(FaceType.BOTTOM)
            )
            x = x * 3.0 - 2.0
            if half_v_face == 0:
                y = y * 2.0
                x = 1.0 - x
                y = (0.5 - y) * coef
            elif half_v_face == 1:
                y = y * 2.0
                x = 1.0 - x
                y = 1.0 - coef * (y - 0.5)
            elif half_v_face == 2:
                y = y * 2.0 - 0.5
                y = 1.0 - coef * (1.0 - y)
            else:
                y = y * 2.0 - 1.5
                y = y * coef
    elif lay == Layout.EAC_32:
        v_face, h_face = int(y * 2), int(x * 3)
        x, y = x * 3.0 - h_face, y * 2.0 - v_face
        x = math.tan((x - 0.5) * math.pi * 0.5) * 0.5 + 0.5
        y = math.tan((y - 0.5) * math.pi * 0.5) * 0.5 + 0.5
        face = h_face + (1 - v_face) * 3

    if lay == Layout.FLAT_FIXED:
        # Direct rectilinear-viewport path (:1265-1271); no rotation matrix.
        out_x = ((x - 0.5) * cfg.fixed_hfov + cfg.fixed_yaw) / 360.0 + 0.5
        out_y = ((y - 0.5) * cfg.fixed_vfov - cfg.fixed_pitch) / 180.0 + 0.5
        out_x, out_y = normalize_equirectangular(out_x, out_y)
    else:
        if lay == Layout.EQUIRECT or (
            lay in (Layout.BARREL, Layout.BARREL_SPLIT) and face < 0
        ):
            # Spherical direction from yaw/pitch (:1095-1101)
            qx = math.sin(yaw) * math.cos(pitch)
            qy = math.sin(pitch)
            qz = math.cos(yaw) * math.cos(pitch)
        else:
            if lay in (Layout.BARREL, Layout.BARREL_SPLIT):
                radius = (x - 0.5) ** 2 + (y - 0.5) ** 2
                if radius > 0.25 * coef * coef:
                    has_mapping = False  # outside polar circle (:1106-1113)
            if has_mapping:
                x = (x - 0.5) * coef + 0.5
                y = (y - 0.5) * coef + 0.5
                basis = (
                    _FACE_BASIS_OFFCENTER
                    if lay == Layout.CUBEMAP_23_OFFCENTER
                    else _FACE_BASIS
                )
                p, vx, vy = basis[FaceType(face)]
                qx = p[0] + vx[0] * x + vy[0] * y
                qy = p[1] + vx[1] * x + vy[1] * y
                qz = p[2] + vx[2] * x + vy[2] * y

        if has_mapping:
            ox, oy, oz = (
                cfg.fixed_cube_offcenter_x,
                cfg.fixed_cube_offcenter_y,
                cfg.fixed_cube_offcenter_z,
            )
            if abs(ox) > _EPS or abs(oy) > _EPS or abs(oz) > _EPS:
                # Off-center sphere re-intersection (:1192-1230)
                d = math.sqrt(qx * qx + qy * qy + qz * qz)
                qx, qy, qz = qx / d, qy / d, qz / d
                if cfg.is_horizontal_offset:
                    # NB: the reference divides qy by the horizontal norm
                    # too (:1201-1204); preserved for parity.
                    d = math.sqrt(qx * qx + qz * qz)
                    qx, qy, qz = qx / d, qy / d, qz / d
                    dist = intersect_sphere_offset(qx, 0.0, qz, ox, 0.0, oz)
                    if dist > 0.0:
                        qx = qx * dist - ox
                        qz = qz * dist - oz
                else:
                    dist = intersect_sphere_offset(qx, qy, qz, ox, oy, oz)
                    if dist > 0.0:
                        qx = qx * dist - ox
                        qy = qy * dist - oy
                        qz = qz * dist - oz

            # Yaw/pitch/roll rotation (:1232-1246)
            s1 = math.sin(cfg.fixed_yaw * math.pi / 180.0)
            s2 = math.sin(cfg.fixed_pitch * math.pi / 180.0)
            s3 = math.sin(cfg.fixed_roll * math.pi / 180.0)
            c1 = math.cos(cfg.fixed_yaw * math.pi / 180.0)
            c2 = math.cos(cfg.fixed_pitch * math.pi / 180.0)
            c3 = math.cos(cfg.fixed_roll * math.pi / 180.0)
            tx = (
                qx * (c1 * c3 + s1 * s2 * s3)
                - qy * (c3 * s1 * s2 - c1 * s3)
                + qz * (c2 * s1)
            )
            ty = qx * (c2 * s3) - qy * (c2 * c3) + qz * (-s2)
            tz = (
                qx * (c1 * s2 * s3 - c3 * s1)
                - qy * (c1 * c3 * s2 + s1 * s3)
                + qz * (c1 * c2)
            )
            ty = -ty
            out_x, out_y = _transform_input_pos(cfg, tx, ty, tz, input_pixel_width)

    if has_mapping:
        # Input stereo re-pack (:1279-1300)
        if cfg.input_stereo_format == StereoFormat.TB:
            out_y = out_y * 0.5 + (0.5 if is_right else 0.0)
        elif cfg.input_stereo_format == StereoFormat.LR:
            out_x = out_x * 0.5 + (0.5 if is_right else 0.0)
        return out_x, out_y, True
    return -1.0, 0.0, False


def build_warp_map(
    cfg: TransformConfig, in_w: int, in_h: int, out_w: int, out_h: int
) -> np.ndarray:
    """Oracle warp map, float32 [H', W', 2] in input-pixel coordinates.

    Transcribes generateMapForPlane (VideoFrameTransform.cpp:504-576):
    output sampled at pixel centers (+0.5), stored with the -0.5 OpenCV
    pixel-center shift, at the scale-factor-scaled output size.
    """
    scaled_w = int(cfg.width_scale_factor * out_w + 0.5)
    scaled_h = int(cfg.height_scale_factor * out_h + 0.5)
    input_pixel_width = 1.0 / in_w
    if cfg.input_stereo_format == StereoFormat.LR:
        input_pixel_width *= 2
    warp = np.empty((scaled_h, scaled_w, 2), np.float32)
    for i in range(scaled_h):
        y = np.float32(i + 0.5) / np.float32(scaled_h)
        for j in range(scaled_w):
            x = np.float32(j + 0.5) / np.float32(scaled_w)
            ox, oy, _ = transform_pos(cfg, float(x), float(y), input_pixel_width)
            warp[i, j, 0] = ox * in_w - 0.5
            warp[i, j, 1] = oy * in_h - 0.5
    return warp


# ---------------------------------------------------------------------------
# Adaptive low-pass prefilter (plan math transcription of
# VideoFrameTransform.cpp:77-94,125-170,210-501)
# ---------------------------------------------------------------------------


def calculate_kernel(sigma: float) -> np.ndarray:
    """1-D Gaussian taps, half-length int(2*sigma) (VideoFrameTransform.cpp:78-94).
    The truncation is float32 like the reference's float arithmetic."""
    box_half = int(np.float32(sigma) * np.float32(2))
    ker = np.zeros(box_half * 2 + 1, np.float32)
    sigma_component = 0.0 if abs(sigma) < _EPS else 0.5 / (sigma * sigma)
    for u in range(-box_half, box_half + 1):
        ker[u + box_half] = math.exp(-(u * u * sigma_component))
    return ker / ker.sum()


def angular_distance(yaw1, pitch1, yaw2, pitch2) -> float:
    """VideoFrameTransform.cpp:125-130."""
    v = math.sin(pitch1) * math.sin(pitch2) + math.cos(pitch1) * math.cos(
        pitch2
    ) * math.cos(yaw1 - yaw2)
    return math.acos(max(-1.0, min(1.0, v)))


def _sampling_arc(offset, render_arc):
    return math.pi - 2 * math.atan2(
        math.cos(0.5 * render_arc) - offset, math.sin(0.5 * render_arc)
    )


def _spherical_area(angle):
    return (1 - math.cos(0.5 * angle)) * 2 * math.pi


_K_FOV = 0.5333 * math.pi
_K_SPHERE_AREA = 4 * math.pi


def get_effective_ratio(angular_dist, offset, fov=_K_FOV) -> float:
    """Off-center sampling-density model (VideoFrameTransform.cpp:140-170)."""
    if angular_dist - _EPS > fov / 2:
        if angular_dist + fov / 2 > math.pi:
            edge1 = _sampling_arc(offset, (2 * math.pi - angular_dist - fov / 2) * 2) / 2
            edge2 = _sampling_arc(offset, (angular_dist - fov / 2) * 2) / 2
            major = (2 * math.pi - edge1 - edge2) / fov
        else:
            major = (
                _sampling_arc(offset, 2 * angular_dist + fov)
                - _sampling_arc(offset, 2 * angular_dist - fov)
            ) / 2 / fov
    else:
        major = (
            _sampling_arc(offset, 2 * angular_dist + fov)
            + _sampling_arc(offset, fov - 2 * angular_dist)
        ) / 2 / fov
    dist_to_covertex = angular_distance(angular_dist, 0.5 * fov, 0.0, 0.0)
    minor = _sampling_arc(offset, dist_to_covertex * 2) / (dist_to_covertex * 2)
    return min(major * minor * _spherical_area(fov) / _K_SPHERE_AREA, 1.0)


class SegmentConfig:
    """One prefilter segment: rect + its 1-D kernels."""

    __slots__ = ("left", "top", "width", "height", "kernel_x", "kernel_y")

    def __init__(self, left, top, width, height, kernel_x, kernel_y):
        self.left, self.top = left, top
        self.width, self.height = width, height
        self.kernel_x, self.kernel_y = kernel_x, kernel_y


_LAYOUT_FOV = {
    # output layout -> (hFov, vFov), VideoFrameTransform.cpp:405-446
    Layout.CUBEMAP_32: (270.0, 180.0),
    Layout.CUBEMAP_23_OFFCENTER: (180.0, 270.0),
    Layout.EQUIRECT: (360.0, 180.0),
    Layout.BARREL: (450.0, 90.0),
    Layout.BARREL_SPLIT: (450.0, 90.0),
    Layout.EAC_32: (270.0, 180.0),
    # FLAT_FIXED uses cfg.fixed_hfov / cfg.fixed_vfov
}


def compute_sigma_y(
    cfg: TransformConfig, in_w: int, in_h: int, out_w: int, out_h: int
) -> float:
    """Base vertical sigma (VideoFrameTransform.cpp:448-454), applied to
    per-eye dims (stereo dims already halved by the caller)."""
    if cfg.output_layout == Layout.FLAT_FIXED:
        h_fov, v_fov = cfg.fixed_hfov, cfg.fixed_vfov
    else:
        h_fov, v_fov = _LAYOUT_FOV[cfg.output_layout]
    f = np.float32  # the reference evaluates this expression in C++ floats
    ratio = (
        f(cfg.kernel_height_scale_factor)
        * min(f(in_w) / f(360.0), f(in_h) / f(180.0))
        / max(f(out_w) / f(h_fov), f(out_h) / f(v_fov))
    )
    return float(
        f(0.5)
        * min(f(cfg.max_kernel_half_height),
              max(f(cfg.min_kernel_half_height), ratio))
    )


def _band_configs(
    cfg: TransformConfig,
    top: int,
    bottom: int,
    angle: float,
    sigma_y: float,
    kernel_y: np.ndarray,
    in_w: int,
    in_h: int,
) -> List[SegmentConfig]:
    """Per-band horizontal tiling + kernels (VideoFrameTransform.cpp:210-297)."""
    sigma_x = min(0.5 * in_w, sigma_y / (math.cos(angle) + _EPS))
    kernel_x = calculate_kernel(sigma_x)
    nhs = cfg.num_horizontal_segments if cfg.adjust_kernel else 1
    seg_w = math.ceil(1.0 * in_w / nhs)
    base_er = get_effective_ratio(0.0, 0.0)
    out = []
    i = 0
    while i < nhs and i * seg_w < in_w:
        width = min(seg_w, in_w - i * seg_w)
        if cfg.adjust_kernel:
            avg_yaw = (
                2
                * math.pi
                * ((i * seg_w + 0.5 * width) - 0.5 * in_w)
                / in_w
            )
            avg_pitch = 0.5 * math.pi * (in_h - top - bottom) / in_h
            yaw = cfg.fixed_yaw * math.pi / 180.0
            pitch = cfg.fixed_pitch * math.pi / 180.0
            offset = abs(cfg.fixed_cube_offcenter_z)
            if (
                abs(yaw) < _EPS
                and abs(pitch) < _EPS
                and (
                    abs(cfg.fixed_cube_offcenter_x) > _EPS
                    or abs(cfg.fixed_cube_offcenter_y) > _EPS
                    or cfg.fixed_cube_offcenter_z > _EPS
                )
            ):
                offset = math.sqrt(
                    cfg.fixed_cube_offcenter_x**2
                    + cfg.fixed_cube_offcenter_y**2
                    + cfg.fixed_cube_offcenter_z**2
                )
                yaw = math.atan2(
                    -cfg.fixed_cube_offcenter_x / offset,
                    -cfg.fixed_cube_offcenter_z / offset,
                )
                pitch = math.asin(-cfg.fixed_cube_offcenter_y / offset)
            dist = angular_distance(yaw, pitch, avg_yaw, avg_pitch)
            er = get_effective_ratio(dist, offset)
            scale = cfg.kernel_adjust_factor * base_er / er
            kx = calculate_kernel(scale * sigma_x)
            ky = calculate_kernel(scale * sigma_y)
        else:
            kx, ky = kernel_x, kernel_y
        out.append(
            SegmentConfig(i * seg_w, top, width, bottom - top + 1, kx, ky)
        )
        i += 1
    return out


def compute_filtering_configs(
    cfg: TransformConfig, in_w: int, in_h: int, out_w: int, out_h: int
) -> List[SegmentConfig]:
    """Full segment raster for one (per-eye) plane.

    Transcribes calcualteFilteringConfig [sic] + generateKernelsAndFilteringConfigs
    (VideoFrameTransform.cpp:318-501), including the stereo-halving of the
    dims and the odd-segment-count equator band.
    """
    if cfg.input_stereo_format == StereoFormat.LR:
        in_w = int(in_w * 0.5)
    elif cfg.input_stereo_format == StereoFormat.TB:
        in_h = int(in_h * 0.5)
    if cfg.output_stereo_format == StereoFormat.LR:
        out_w = int(out_w * 0.5)
    elif cfg.output_stereo_format == StereoFormat.TB:
        out_h = int(out_h * 0.5)

    sigma_y = compute_sigma_y(cfg, in_w, in_h, out_w, out_h)
    kernel_y = calculate_kernel(sigma_y)
    base_h = math.ceil(1.0 * in_h / cfg.num_vertical_segments)

    configs: List[SegmentConfig] = []

    def bands_from(start_top: int, start_bottom: int):
        # Top half: walk up from start_bottom (VideoFrameTransform.cpp:329-344)
        bottom = start_bottom
        while bottom >= 0:
            top = max(bottom - base_h + 1, 0)
            angle = 0.5 * math.pi * (in_h - top - bottom) / in_h
            configs.extend(
                _band_configs(cfg, top, bottom, angle, sigma_y, kernel_y, in_w, in_h)
            )
            bottom -= base_h
        # Bottom half: walk down from start_top (:348-363)
        top = start_top
        while top < in_h:
            bottom = min(top + base_h - 1, in_h - 1)
            angle = 0.5 * math.pi * (top + bottom - in_h) / in_h
            configs.extend(
                _band_configs(cfg, top, bottom, angle, sigma_y, kernel_y, in_w, in_h)
            )
            top += base_h

    if cfg.num_vertical_segments % 2 == 0:
        bands_from(int(0.5 * in_h), int(0.5 * in_h) - 1)
    else:
        # Odd count: one band centered on the equator (:474-500)
        top = int(0.5 * (in_h - base_h))
        bottom = top + base_h - 1
        configs.extend(
            _band_configs(cfg, top, bottom, 0.0, sigma_y, kernel_y, in_w, in_h)
        )
        bands_from(bottom + 1, top - 1)
    return configs


def filter_plane(
    cfg: TransformConfig, plane: np.ndarray, configs: List[SegmentConfig]
) -> np.ndarray:
    """Segment-wise separable Gaussian blur
    (VideoFrameTransform.cpp:173-204,579-704).

    The reference calls ``cv::sepFilter2D`` on non-isolated ROIs of the
    full plane with BORDER_REPLICATE: border taps read *real parent-image
    pixels* beyond the segment, replicating only at true plane edges.  A
    numpy slice passed to cv2 loses ROI parentage (behaves isolated), so
    the equivalent form used here extends each segment by the kernel radii
    with real neighbors (clamped at plane edges) before filtering, then
    crops the center — the crop never touches cv2's own border handling.
    """
    assert cv2 is not None, "oracle filtering requires opencv-python"
    blurred = np.zeros_like(plane)
    H, W = plane.shape

    def run(configs, left_off, top_off):
        for c in configs:
            l, t = c.left + left_off, c.top + top_off
            rx = (c.kernel_x.shape[0] - 1) // 2
            ry = (c.kernel_y.shape[0] - 1) // 2
            rows = np.clip(np.arange(t - ry, t + c.height + ry), 0, H - 1)
            cols = np.clip(np.arange(l - rx, l + c.width + rx), 0, W - 1)
            ext = np.ascontiguousarray(plane[np.ix_(rows, cols)])
            out = cv2.sepFilter2D(
                ext,
                -1,
                c.kernel_x.reshape(1, -1),
                c.kernel_y.reshape(1, -1),
                anchor=(-1, -1),
                delta=0,
                borderType=cv2.BORDER_REPLICATE,
            )
            blurred[t : t + c.height, l : l + c.width] = out[
                ry : ry + c.height, rx : rx + c.width
            ]

    if cfg.input_stereo_format == StereoFormat.LR:
        run(configs, 0, 0)
        run(configs, int(0.5 * plane.shape[1]), 0)
    elif cfg.input_stereo_format == StereoFormat.TB:
        run(configs, 0, 0)
        run(configs, 0, int(0.5 * plane.shape[0]))
    else:
        run(configs, 0, 0)
    return blurred


# ---------------------------------------------------------------------------
# Full plane transform (cv::remap path, VideoFrameTransform.cpp:707-794)
# ---------------------------------------------------------------------------

_CV_INTERP = {
    Interpolation.NEAREST: 0,
    Interpolation.LINEAR: 1,
    Interpolation.CUBIC: 2,
    Interpolation.LANCZOS4: 4,
}


def transform_plane(
    cfg: TransformConfig,
    plane: np.ndarray,
    warp: np.ndarray,
    out_w: int,
    out_h: int,
    map_plane_index: int,
    configs: Optional[List[SegmentConfig]] = None,
    depth16: int = 16,
) -> np.ndarray:
    """Oracle per-plane transform: optional prefilter, cv2.remap with the
    layout-dependent border mode, optional INTER_AREA downscale.

    ``depth16``: real sample bit depth when ``plane`` is uint16 (the deep
    formats store 10/12-bit samples in 16-bit containers)."""
    assert cv2 is not None, "oracle transform requires opencv-python"
    is_barrel = cfg.output_layout in (Layout.BARREL, Layout.BARREL_SPLIT)
    border = cv2.BORDER_TRANSPARENT if is_barrel else cv2.BORDER_WRAP

    temp = plane
    if cfg.enable_low_pass_filter:
        if configs is None:
            configs = compute_filtering_configs(
                cfg, plane.shape[1], plane.shape[0], warp.shape[1], warp.shape[0]
            )
        temp = filter_plane(cfg, plane, configs)

    need_resize = out_h != warp.shape[0] or out_w != warp.shape[1]
    # barrel UV pre-fill 128 (VideoFrameTransform.cpp:743-762), scaled to
    # the format's neutral for the deep (>8-bit, uint16) formats
    depth = 8 if plane.dtype == np.uint8 else int(depth16 or 16)
    fill = (128 << (depth - 8)) if map_plane_index else 0
    dst = np.full(warp.shape[:2], fill, plane.dtype)
    dst = cv2.remap(
        temp,
        warp[..., 0],
        warp[..., 1],
        _CV_INTERP[cfg.interpolation_alg],
        dst=dst,
        borderMode=border,
    )
    if need_resize:
        dst = cv2.resize(dst, (out_w, out_h), interpolation=cv2.INTER_AREA)
    return dst


def transform_frame_yuv420(
    cfg: TransformConfig,
    planes: Tuple[np.ndarray, np.ndarray, np.ndarray],
    out_w: int,
    out_h: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Oracle full-frame transform: 2 map planes for 3 image planes
    (vf_transform360.c:99-165,338-402).  YUV420 convenience over
    :func:`transform_frame_planar`."""
    return transform_frame_planar(cfg, planes, out_w, out_h, "yuv420p")


def transform_frame_planar(
    cfg: TransformConfig,
    planes,
    out_w: int,
    out_h: int,
    pix_fmt="yuv420p",
):
    """Oracle N-plane transform: plane 0 uses the luma map, every other
    plane the chroma map, with chroma dims from the format's log2 shifts
    (``vf_transform360.c:87-97,368-372``)."""
    from .config import chroma_dims, get_pixel_format

    pf = get_pixel_format(pix_fmt)
    assert len(planes) == pf.n_planes, (len(planes), pf.n_planes)
    in_h, in_w = planes[0].shape
    warp_luma = build_warp_map(cfg, in_w, in_h, out_w, out_h)
    cfgs_l = (
        compute_filtering_configs(
            cfg, in_w, in_h, warp_luma.shape[1], warp_luma.shape[0]
        )
        if cfg.enable_low_pass_filter
        else None
    )
    outs = [
        transform_plane(
            cfg, planes[0], warp_luma, out_w, out_h, 0, cfgs_l,
            depth16=pf.depth,
        )
    ]
    if pf.n_planes > 1:
        c_in_w, c_in_h = chroma_dims(in_w, in_h, pf)
        c_out_w, c_out_h = chroma_dims(out_w, out_h, pf)
        warp_c = build_warp_map(cfg, c_in_w, c_in_h, c_out_w, c_out_h)
        cfgs_c = (
            compute_filtering_configs(
                cfg, c_in_w, c_in_h, warp_c.shape[1], warp_c.shape[0]
            )
            if cfg.enable_low_pass_filter
            else None
        )
        for p in planes[1:]:
            outs.append(
                transform_plane(
                    cfg, p, warp_c, c_out_w, c_out_h, 1, cfgs_c,
                    depth16=pf.depth,
                )
            )
    return tuple(outs)
