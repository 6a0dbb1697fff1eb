"""Raw YUV420 (I420) file IO.

The reference runs inside FFmpeg and receives decoded planes; this package
runs standalone, so the CLI works on raw planar YUV420 streams (the format
``ffmpeg -pix_fmt yuv420p -f rawvideo`` produces).  Decode/encode of
compressed video stays on the CPU side and out of scope for the TPU kernels
(SURVEY §7).
"""

from __future__ import annotations

import io
from typing import Iterator, Tuple

import numpy as np

from ..config import chroma_dims


def frame_size_bytes(w: int, h: int) -> int:
    cw, ch = chroma_dims(w, h)
    return w * h + 2 * cw * ch


def read_yuv420_frames(
    path: str, w: int, h: int, max_frames: int = 0
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Yield (Y, U, V) uint8 planes from a raw I420 file."""
    cw, ch = chroma_dims(w, h)
    ysz, csz = w * h, cw * ch
    n = 0
    with open(path, "rb") as f:
        while True:
            buf = f.read(ysz + 2 * csz)
            if len(buf) < ysz + 2 * csz:
                return
            y = np.frombuffer(buf, np.uint8, ysz).reshape(h, w)
            u = np.frombuffer(buf, np.uint8, csz, ysz).reshape(ch, cw)
            v = np.frombuffer(buf, np.uint8, csz, ysz + csz).reshape(ch, cw)
            yield y, u, v
            n += 1
            if max_frames and n >= max_frames:
                return


def read_yuv420_batch(
    path: str, w: int, h: int, max_frames: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Read a whole raw I420 file into stacked [B, ...] plane arrays."""
    ys, us, vs = [], [], []
    for y, u, v in read_yuv420_frames(path, w, h, max_frames):
        ys.append(y)
        us.append(u)
        vs.append(v)
    if not ys:
        raise ValueError(f"no complete {w}x{h} frames in {path}")
    return np.stack(ys), np.stack(us), np.stack(vs)


def write_yuv420_frames(path_or_file, planes_iter) -> int:
    """Write (Y, U, V) frames as raw I420. Returns frame count."""
    close = False
    f = path_or_file
    if isinstance(path_or_file, str):
        f = open(path_or_file, "wb")
        close = True
    n = 0
    try:
        for y, u, v in planes_iter:
            f.write(np.ascontiguousarray(y, np.uint8).tobytes())
            f.write(np.ascontiguousarray(u, np.uint8).tobytes())
            f.write(np.ascontiguousarray(v, np.uint8).tobytes())
            n += 1
    finally:
        if close:
            f.close()
    return n


def write_yuv420_batch(path: str, y: np.ndarray, u: np.ndarray, v: np.ndarray) -> int:
    if y.ndim == 2:
        return write_yuv420_frames(path, [(y, u, v)])
    return write_yuv420_frames(path, zip(y, u, v))
