"""ctypes bindings for the native C++ engine (libt360.so).

The native engine is a dependency-free C++17 implementation of the full
Transform360 pipeline with a C ABI mirroring the reference's stable library
surface (``VideoFrameTransformHandler.h:24-47``).  It serves as the CPU
fallback backend and as a third independent implementation for
cross-validation (JAX path vs numpy/OpenCV oracle vs native C++).

The shared library is built on demand with the checked-in Makefile; if no
toolchain is available, :func:`available` returns False and everything else
raises.
"""

from __future__ import annotations

import ctypes
import dataclasses
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

from ..config import TransformConfig, chroma_dims

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libt360.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


class _CtxStruct(ctypes.Structure):
    # Field order must match struct Ctx in t360.cpp.
    _fields_ = [
        ("input_layout", ctypes.c_int32),
        ("output_layout", ctypes.c_int32),
        ("input_stereo_format", ctypes.c_int32),
        ("output_stereo_format", ctypes.c_int32),
        ("vflip", ctypes.c_int32),
        ("input_expand_coef", ctypes.c_float),
        ("expand_coef", ctypes.c_float),
        ("interpolation_alg", ctypes.c_int32),
        ("width_scale_factor", ctypes.c_float),
        ("height_scale_factor", ctypes.c_float),
        ("fixed_yaw", ctypes.c_float),
        ("fixed_pitch", ctypes.c_float),
        ("fixed_roll", ctypes.c_float),
        ("fixed_hfov", ctypes.c_float),
        ("fixed_vfov", ctypes.c_float),
        ("fixed_cube_offcenter_x", ctypes.c_float),
        ("fixed_cube_offcenter_y", ctypes.c_float),
        ("fixed_cube_offcenter_z", ctypes.c_float),
        ("is_horizontal_offset", ctypes.c_int32),
        ("enable_low_pass_filter", ctypes.c_int32),
        ("kernel_height_scale_factor", ctypes.c_float),
        ("min_kernel_half_height", ctypes.c_float),
        ("max_kernel_half_height", ctypes.c_float),
        ("enable_multi_threading", ctypes.c_int32),
        ("num_vertical_segments", ctypes.c_int32),
        ("num_horizontal_segments", ctypes.c_int32),
        ("adjust_kernel", ctypes.c_int32),
        ("kernel_adjust_factor", ctypes.c_float),
    ]


def _cfg_to_struct(cfg: TransformConfig) -> _CtxStruct:
    s = _CtxStruct()
    for name, _ in _CtxStruct._fields_:
        setattr(s, name, getattr(cfg, name))
    return s


def _build() -> Optional[str]:
    try:
        subprocess.run(
            ["make", "-s", "-C", _DIR],
            check=True,
            capture_output=True,
            text=True,
        )
        return None
    except FileNotFoundError:
        return "make not found"
    except subprocess.CalledProcessError as e:  # pragma: no cover
        return e.stderr or str(e)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            return None
        if not os.path.exists(_LIB_PATH):
            err = _build()
            if err is not None:
                _build_error = err
                return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.T360_new.restype = ctypes.c_void_p
        lib.T360_new.argtypes = [ctypes.POINTER(_CtxStruct)]
        lib.T360_delete.argtypes = [ctypes.c_void_p]
        lib.T360_generateMapForPlane.restype = ctypes.c_int
        lib.T360_generateMapForPlane.argtypes = [ctypes.c_void_p] + [ctypes.c_int] * 5
        lib.T360_transformFramePlane.restype = ctypes.c_int
        lib.T360_transformFramePlane.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
        ] + [ctypes.c_int] * 8
        lib.T360_transformFramesPlane.restype = ctypes.c_int
        lib.T360_transformFramesPlane.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
        ] + [ctypes.c_int] * 10
        lib.T360_exportWarpMap.restype = ctypes.c_int
        lib.T360_exportWarpMap.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_void_p,
        ]
        lib.T360_planeDims.restype = ctypes.c_int
        lib.T360_planeDims.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
        return lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


class NativeTransform:
    """CPU-native engine instance: the C ABI surface as a Python object.

    Method shape mirrors the reference handler
    (``VideoFrameTransformHandler.h``): construct with a config, generate
    maps per plane class, transform raw plane buffers with strides.
    """

    def __init__(self, cfg: TransformConfig):
        from ..config import StereoFormat

        if StereoFormat.GUESS in (
            cfg.input_stereo_format,
            cfg.output_stereo_format,
        ):
            raise ValueError(
                "resolve GUESS stereo formats before constructing the "
                "native engine (config.resolve_stereo_formats)"
            )
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native engine unavailable: {_build_error}")
        self._lib = lib
        self._cfg = cfg
        ctx = _cfg_to_struct(cfg)
        self._h = lib.T360_new(ctypes.byref(ctx))
        if not self._h:
            raise MemoryError("T360_new failed")
        # generated-map memo: the C engine recomputes on every
        # T360_generateMapForPlane call (like the reference's
        # generateMapForPlane); the lazy once-per-stream behavior lives
        # here, mirroring vf_transform360.c:346-352.
        self._maps = {}

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.T360_delete(h)
            self._h = None

    def generate_map_for_plane(
        self, in_w: int, in_h: int, out_w: int, out_h: int, plane_idx: int
    ) -> None:
        key = (in_w, in_h, out_w, out_h, plane_idx)
        if self._maps.get(plane_idx) == key:
            return
        ok = self._lib.T360_generateMapForPlane(
            self._h, in_w, in_h, out_w, out_h, plane_idx
        )
        if not ok:
            raise ValueError("T360_generateMapForPlane failed")
        self._maps[plane_idx] = key

    def transform_frame_plane(
        self,
        plane: np.ndarray,
        out_w: int,
        out_h: int,
        plane_idx: int,
        image_plane_idx: int,
    ) -> np.ndarray:
        plane = np.ascontiguousarray(plane, np.uint8)
        in_h, in_w = plane.shape
        out = np.empty((out_h, out_w), np.uint8)
        ok = self._lib.T360_transformFramePlane(
            self._h,
            plane.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p),
            in_w,
            in_h,
            in_w,
            out_w,
            out_h,
            out_w,
            plane_idx,
            image_plane_idx,
        )
        if not ok:
            raise ValueError("T360_transformFramePlane failed")
        return out

    def transform_frames_plane(
        self,
        planes: np.ndarray,
        out_w: int,
        out_h: int,
        plane_idx: int,
        image_plane_idx: int,
        n_threads: int = 0,
    ) -> np.ndarray:
        """Frame-pool runner: uint8 [B, H, W] -> [B, out_h, out_w].

        Frame-level parallelism across a worker pool (the CPU analog of
        the TPU path's batch axis); ``n_threads <= 0`` uses hardware
        concurrency.  Maps must have been generated for ``plane_idx``."""
        planes = np.ascontiguousarray(planes, np.uint8)
        b, in_h, in_w = planes.shape
        out = np.empty((b, out_h, out_w), np.uint8)
        done = self._lib.T360_transformFramesPlane(
            self._h,
            planes.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p),
            b,
            in_w,
            in_h,
            in_w,
            out_w,
            out_h,
            out_w,
            plane_idx,
            image_plane_idx,
            n_threads,
        )
        if done != b:
            raise ValueError(f"frame pool transformed {done}/{b} frames")
        return out

    def transform_frames(
        self, y: np.ndarray, u: np.ndarray, v: np.ndarray, out_w: int, out_h: int
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Batched YUV420 frames: uint8 [B, ...] per plane, frame pool."""
        return self.transform_planar((y, u, v), out_w, out_h, "yuv420p")

    def transform_planar(
        self, planes, out_w: int, out_h: int, pix_fmt="yuv420p"
    ) -> Tuple[np.ndarray, ...]:
        """N-plane planar frames, single ([H, W] planes) or batched
        ([B, H, W], frame pool).  Plane 0 uses the luma map, every other
        plane the chroma map, with chroma dims from the format's log2
        shifts (``vf_transform360.c:87-97,368-372``)."""
        from ..config import get_pixel_format

        pf = get_pixel_format(pix_fmt)
        planes = [np.ascontiguousarray(p, np.uint8) for p in planes]
        if len(planes) != pf.n_planes:
            raise ValueError(
                f"expected {pf.n_planes} plane(s) for {pf.name}, got "
                f"{len(planes)}"
            )
        batched = planes[0].ndim == 3
        in_h, in_w = planes[0].shape[-2:]
        self.generate_map_for_plane(in_w, in_h, out_w, out_h, 0)
        if pf.n_planes > 1:
            c_in_w, c_in_h = chroma_dims(in_w, in_h, pf)
            c_out_w, c_out_h = chroma_dims(out_w, out_h, pf)
            self.generate_map_for_plane(c_in_w, c_in_h, c_out_w, c_out_h, 1)
        outs = []
        for i, p in enumerate(planes):
            mp = 0 if i == 0 else 1
            ow, oh = (out_w, out_h) if mp == 0 else (c_out_w, c_out_h)
            if batched:
                outs.append(self.transform_frames_plane(p, ow, oh, mp, i))
            else:
                outs.append(self.transform_frame_plane(p, ow, oh, mp, i))
        return tuple(outs)

    def export_warp_map(self, plane_idx: int) -> np.ndarray:
        """Quantized warp map [H', W', 2] for cross-validation."""
        w = ctypes.c_int()
        h = ctypes.c_int()
        if not self._lib.T360_planeDims(
            self._h, plane_idx, ctypes.byref(w), ctypes.byref(h)
        ):
            raise ValueError("no map for plane")
        out = np.empty((h.value, w.value, 2), np.float32)
        self._lib.T360_exportWarpMap(
            self._h, plane_idx, out.ctypes.data_as(ctypes.c_void_p)
        )
        return out

    def transform_frame(
        self, y: np.ndarray, u: np.ndarray, v: np.ndarray, out_w: int, out_h: int
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Full YUV420 frame: 2 map planes for 3 image planes."""
        return self.transform_planar((y, u, v), out_w, out_h, "yuv420p")
