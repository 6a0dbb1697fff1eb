"""Command-line interface — the FFmpeg filter-shell analog.

Accepts the reference filter's ffmpeg-style ``key=value:key=value`` option
string verbatim (``vf_transform360.c:407-987``) and applies the transform to
raw planar YUV420 (I420) input, batching frames across the chip::

    python -m transform360_tpu.cli \
        --vf "cube_edge_length=512:interpolation_alg=cubic" \
        --input-size 3840x2160 -i in.yuv -o out.yuv --batch 8

Use ffmpeg (or any decoder) to produce/consume the raw stream:
``ffmpeg -i in.mp4 -pix_fmt yuv420p -f rawvideo in.yuv``.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from .api import open_filter
from .utils.profiling import StageStats
from .utils.yuv import read_yuv420_frames, write_yuv420_frames


def _parse_size(s: str):
    try:
        w, h = s.lower().split("x")
        return int(w), int(h)
    except Exception as e:
        raise argparse.ArgumentTypeError(f"bad size {s!r}, expected WxH") from e


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="transform360_tpu",
        description="TPU-native 360 video re-projection (Transform360 parity).",
    )
    p.add_argument(
        "--vf",
        default="",
        help="ffmpeg-style transform360 option string (key=value:key=value)",
    )
    p.add_argument(
        "--input-size", type=_parse_size, required=True, metavar="WxH",
        help="input frame size, e.g. 3840x2160",
    )
    p.add_argument("-i", "--input", required=True, help="raw I420 input file")
    p.add_argument("-o", "--output", required=True, help="raw I420 output file")
    p.add_argument("--batch", type=int, default=8, help="frames per device step")
    p.add_argument("--frames", type=int, default=0, help="max frames (0 = all)")
    p.add_argument(
        "--save-plan", default=None, help="serialize the built plan to this path"
    )
    p.add_argument(
        "--load-plan", default=None, help="reuse a previously saved plan"
    )
    p.add_argument("--stats", action="store_true", help="print a JSON stats line")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    in_w, in_h = args.input_size

    t = open_filter(args.vf, in_w, in_h, eager=args.load_plan is None)
    if args.load_plan:
        t.load_plan(args.load_plan)

    stats = StageStats(stream=sys.stdout)
    t0 = time.perf_counter()

    def frames_out():
        batch_y, batch_u, batch_v = [], [], []

        def flush():
            if not batch_y:
                return
            tb = time.perf_counter()
            oy, ou, ov = t.transform(
                np.stack(batch_y), np.stack(batch_u), np.stack(batch_v)
            )
            stats.record(oy.shape[0], time.perf_counter() - tb)
            for k in range(oy.shape[0]):
                yield oy[k], ou[k], ov[k]
            batch_y.clear()
            batch_u.clear()
            batch_v.clear()

        for y, u, v in read_yuv420_frames(args.input, in_w, in_h, args.frames):
            batch_y.append(y)
            batch_u.append(u)
            batch_v.append(v)
            if len(batch_y) >= args.batch:
                yield from flush()
        yield from flush()

    write_yuv420_frames(args.output, frames_out())
    dt = time.perf_counter() - t0

    if args.save_plan:
        t.save_plan(args.save_plan)

    out_w, out_h = t.output_dims()
    if args.stats:
        stats.emit(
            in_size=f"{in_w}x{in_h}",
            out_size=f"{out_w}x{out_h}",
            wall_seconds=round(dt, 3),
        )
    else:
        print(
            f"{stats.frames} frames {in_w}x{in_h} -> {out_w}x{out_h} in {dt:.2f}s",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
