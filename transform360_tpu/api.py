"""Public API: the TPU-native equivalent of the reference's two entry layers.

* :class:`Transform360` mirrors the stable C ABI surface
  (``VideoFrameTransformHandler.h:24-47``): construct from a config,
  generate maps per plane class, transform plane buffers.  Map generation
  is lazy-on-first-frame for drop-in behavioral parity
  (``vf_transform360.c:338-352``) but can be forced eagerly.
* :func:`open_filter` mirrors the FFmpeg filter shell: it takes the
  ffmpeg-style option string (``vf_transform360.c:407-987``), performs the
  output-geometry negotiation of ``config_output``
  (``vf_transform360.c:167-304``), and returns a ready Transform360.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .config import (
    FilterOptions,
    get_pixel_format,
    StereoFormat,
    TransformConfig,
    chroma_dims,
    negotiate_output_geometry,
    parse_options,
    resolve_stereo_formats,
)
from .pipeline import device_put_plan, transform_batch, transform_plane
from .plan import TransformPlan, build_plan, load_plan, save_plan


class Transform360:
    """Stateful transform engine for one (config, input-size, output-size).

    State parallels ``VideoFrameTransform`` (``VideoFrameTransform.h:147-159``):
    the immutable config copy plus the cached plan (warp maps + kernel bank).
    """

    def __init__(
        self,
        config: TransformConfig,
        out_w: Optional[int] = None,
        out_h: Optional[int] = None,
        backend: str = "auto",
        pix_fmt: str = "yuv420p",
        mesh=None,
    ):
        """``backend``: "auto" (TPU Pallas / XLA pipeline), or "native"
        (the dependency-free C++ engine — CPU fallback with the reference's
        threading model; see transform360_tpu.native).

        ``pix_fmt``: planar pixel format; chroma plane dims derive from
        its log2 chroma shifts (``vf_transform360.c:87-97``), so
        yuv422p/yuv444p/gray run through the same two-map-plane machinery.

        ``mesh``: optional ``jax.sharding.Mesh`` (see
        :func:`transform360_tpu.parallel.make_mesh`).  Batched inputs are
        sharded on the frame axis across its devices — the multi-chip
        replacement for the reference's pthread segment fan-out
        (``VideoFrameTransform.cpp:592-604``); batch size must be a
        multiple of the mesh size.
        """
        config.validate()
        if backend not in ("auto", "native"):
            raise ValueError(f"unknown backend {backend!r}")
        if mesh is not None and backend == "native":
            raise ValueError("mesh sharding requires the TPU backend")
        self._backend = backend
        self._cfg = config
        self._out_w = out_w
        self._out_h = out_h
        self._pix_fmt = get_pixel_format(pix_fmt)
        self._mesh = mesh
        self._plan: Optional[TransformPlan] = None
        self._native = None

    @property
    def config(self) -> TransformConfig:
        return self._cfg

    @property
    def plan(self) -> Optional[TransformPlan]:
        return self._plan

    def generate_map(self, in_w: int, in_h: int) -> TransformPlan:
        """Build (and cache on device) the warp maps + filter plan for
        this input size — the ``generateMapForPlane`` analog, covering both
        map planes at once."""
        if self._out_w is None or self._out_h is None:
            raise ValueError("output size not set; use open_filter or pass out_w/out_h")
        cfg = self._cfg
        if StereoFormat.GUESS in (cfg.input_stereo_format, cfg.output_stereo_format):
            in_fmt, out_fmt = resolve_stereo_formats(cfg, in_w, in_h)
            cfg = cfg.replace(
                input_stereo_format=in_fmt, output_stereo_format=out_fmt
            )
        plan = build_plan(
            cfg, in_w, in_h, self._out_w, self._out_h, self._pix_fmt
        )
        self._plan = device_put_plan(plan)
        return self._plan

    def _ensure_plan(self, in_w: int, in_h: int) -> TransformPlan:
        if (
            self._plan is None
            or self._plan.in_w != in_w
            or self._plan.in_h != in_h
        ):
            self.generate_map(in_w, in_h)
        return self._plan

    def transform(self, y, u=None, v=None):
        """Transform one frame or a batch of planar frames.

        ``y``: [H, W] or [B, H, W] samples in the format's dtype (uint8;
        uint16 for the deep ``*10le``/``*12le`` formats); ``u``/``v`` the
        chroma planes (omit for single-plane formats like gray).  Maps
        are generated lazily on the first frame, like the reference
        filter.  Returns numpy planes in the same dtype (a bare array
        for single-plane formats).
        """
        out = self.transform_async(y, u, v)
        if isinstance(out, tuple):
            return tuple(np.asarray(o) for o in out)
        return np.asarray(out)

    def transform_async(self, y, u=None, v=None):
        """Submit a transform without waiting for the result.

        Same contract as :meth:`transform` but returns device arrays
        under JAX's asynchronous dispatch: the call returns as soon as the
        work is enqueued, so the host can decode/encode neighboring
        batches while the chip computes (the pipelined-IO analog of the
        reference's decode->filter->encode FFmpeg graph running its
        stages concurrently).  ``np.asarray`` the results to wait.  On
        the native backend this is synchronous (numpy in, numpy out).
        """
        if self._backend == "native":
            return self._transform_native(y, u, v)
        if self._mesh is not None and np.ndim(y) == 3:
            from .parallel import shard_batch

            n = self._mesh.size
            if np.shape(y)[0] % n:
                raise ValueError(
                    f"batch {np.shape(y)[0]} is not divisible by the "
                    f"mesh size {n}"
                )
            planes = [p for p in (y, u, v) if p is not None]
            sharded = shard_batch(self._mesh, *planes)
            if not isinstance(sharded, tuple):
                sharded = (sharded,)
            y, u, v = (tuple(sharded) + (None, None))[:3]
        y = jnp.asarray(y)
        in_h, in_w = y.shape[-2:]
        plan = self._ensure_plan(in_w, in_h)
        return transform_batch(plan, y, u, v)

    def _transform_native(self, y, u, v):
        from . import native

        pf = self._pix_fmt
        if pf.depth > 8:
            raise ValueError(
                f"the native (C++) engine is 8-bit only — {pf.name} "
                "requires the default JAX backend (the reference engine "
                "wraps planes as CV_8U, VideoFrameTransform.cpp:1331-1335)"
            )
        planes = [np.asarray(p, np.uint8) for p in (y, u, v) if p is not None]
        if len(planes) != pf.n_planes:
            raise ValueError(
                f"expected {pf.n_planes} plane(s) for {pf.name}, got "
                f"{len(planes)}"
            )
        if self._out_w is None or self._out_h is None:
            raise ValueError("output size not set")
        cfg = self._cfg
        if StereoFormat.GUESS in (cfg.input_stereo_format, cfg.output_stereo_format):
            in_fmt, out_fmt = resolve_stereo_formats(
                cfg, planes[0].shape[-1], planes[0].shape[-2]
            )
            cfg = cfg.replace(
                input_stereo_format=in_fmt, output_stereo_format=out_fmt
            )
        if self._native is None or self._native._cfg != cfg:
            self._native = native.NativeTransform(cfg)
        # single frame, or batch via the C engine's frame-pool runner (one
        # worker per frame, maps generated once) — the CPU analog of the
        # TPU batch axis
        outs = self._native.transform_planar(
            planes, self._out_w, self._out_h, pf.name
        )
        return outs if len(outs) > 1 else outs[0]

    def transform_frame_plane(
        self, plane, map_plane_index: int, in_w: int, in_h: int
    ) -> np.ndarray:
        """Single-plane raw-buffer entry, mirroring
        ``VideoFrameTransform_transformFramePlane``
        (``VideoFrameTransformHandler.h:36-47``)."""
        plane = np.asarray(plane)
        if map_plane_index == 0:
            self._ensure_plan(in_w, in_h)
        elif self._plan is None:
            raise RuntimeError("generate luma map before transforming chroma planes")
        return np.asarray(
            transform_plane(self._plan, plane, map_plane_index)
        )

    def output_dims(self) -> Tuple[int, int]:
        return self._out_w, self._out_h

    def save_plan(self, path: str) -> None:
        if self._plan is None:
            raise RuntimeError("no plan to save; call generate_map first")
        save_plan(self._plan, path)

    def load_plan(self, path: str) -> None:
        plan = load_plan(path)
        if plan.pix_fmt != self._pix_fmt.name:
            raise ValueError(
                f"plan was built for pix_fmt {plan.pix_fmt!r} but this "
                f"engine is {self._pix_fmt.name!r}"
            )
        self._plan = device_put_plan(plan)
        self._out_w, self._out_h = plan.out_w, plan.out_h


def open_filter(
    options: str,
    in_w: int,
    in_h: int,
    eager: bool = True,
    backend: str = "auto",
    pix_fmt: str = "yuv420p",
    mesh=None,
) -> Transform360:
    """FFmpeg-shell analog: parse the option string, negotiate output
    geometry against the input size, and return a ready engine.

    ``pix_fmt`` plays the role of the inlink's negotiated pixel format
    (the option string itself has no such key, matching the reference).
    ``mesh``: shard batches over a device mesh (see :class:`Transform360`).
    """
    opts = parse_options(options)
    out_w, out_h, cfg = negotiate_output_geometry(opts, in_w, in_h)
    t = Transform360(
        cfg, out_w, out_h, backend=backend, pix_fmt=pix_fmt, mesh=mesh
    )
    if eager and backend != "native":
        t.generate_map(in_w, in_h)
    return t
