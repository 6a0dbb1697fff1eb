"""Command-line interface — the FFmpeg filter-shell analog.

Accepts the reference filter's ffmpeg-style ``key=value:key=value`` option
string verbatim (``vf_transform360.c:407-987``) and applies the transform,
batching frames across the chip::

    python -m transform360_tpu.cli \
        --vf "cube_edge_length=512:interpolation_alg=cubic" \
        -i in.mp4 -o out.mp4 --batch 8

Video containers (.mp4/.mkv/.avi/...) are decoded/encoded through the
:mod:`.utils.video` shim (ffmpeg subprocess when available, OpenCV
otherwise) — the drop-in analog of ``ffmpeg -vf transform360=...``
(reference ``README.md:84-95``).  Decode runs on its own thread and
device batches are dispatched asynchronously (``--prefetch`` batches in
flight), so host IO overlaps chip compute the way the reference's
FFmpeg graph overlaps its decode/filter/encode stages.  Raw planar YUV420 (.yuv/.raw/.i420)
streams are read/written directly and need ``--input-size``; ``-`` pipes
raw planes through stdin/stdout (the ffmpeg rawvideo idiom)::

    python -m transform360_tpu.cli --vf "w=1024:h=512" \
        --input-size 3840x2160 -i in.yuv -o out.yuv
    ffmpeg -i in.mp4 -f rawvideo -pix_fmt yuv420p - \
      | python -m transform360_tpu.cli --vf "cube_edge_length=512" \
          --input-size 3840x2160 -i - -o out.yuv
"""

from __future__ import annotations

import argparse
import queue
import sys
import threading
import time
from collections import deque

import numpy as np

from .api import open_filter
from .config import get_pixel_format
from .utils.profiling import StageStats
from .utils.video import VideoReader, VideoWriter, is_raw_path
from .utils.yuv import read_planar_frames, write_yuv420_frames


def _parse_size(s: str):
    try:
        w, h = s.lower().split("x")
        return int(w), int(h)
    except Exception as e:
        raise argparse.ArgumentTypeError(f"bad size {s!r}, expected WxH") from e


def start_reader(frames_in, batch: int):
    """Decode on a separate thread so container demux/decode overlaps the
    device step and the encode of earlier batches — the reference runs
    inside an FFmpeg graph whose decode/filter/encode stages likewise
    proceed concurrently.  The consumer must set ``stop`` on ANY exit
    (normal or error) so the reader never stays blocked on the bounded
    queue — an abandoned daemon thread would pin the open input file /
    decode subprocess for the life of an in-process caller.

    Returns ``(queue, stop_event)``; the queue carries per-frame plane
    tuples, then ``None`` at end of stream (exceptions are forwarded as
    queue items and re-raised by the consumer).
    """
    inq: queue.Queue = queue.Queue(maxsize=max(2 * batch, 8))
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                inq.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def read_loop():
        try:
            for planes in frames_in:
                if not _put(planes):
                    return
            _put(None)
        except BaseException as e:  # surfaced in the consumer
            _put(e)
        finally:
            close = getattr(frames_in, "close", None)
            if close is not None:
                close()

    threading.Thread(target=read_loop, daemon=True).start()
    return inq, stop


def batched_outputs(transform_async, inq, n_planes, batch, prefetch, stats):
    """Yield per-frame output plane tuples from a reader queue, dispatching
    padded ``batch``-frame device steps asynchronously (up to ``prefetch``
    batches in flight while the host decodes/encodes neighbors)."""
    batches = [[] for _ in range(n_planes)]
    # (n_real_frames, device arrays) of submitted-but-unretired batches;
    # JAX dispatch is asynchronous, so up to `prefetch` batches compute
    # on the chip while the host works on others.
    pending: deque = deque()

    def submit():
        n = len(batches[0])
        if not n:
            return
        stacked = [np.stack(b) for b in batches]
        if n < batch:
            # Pad a partial tail batch to the steady-state shape: the
            # executors are shape-specialized, so an odd-sized final
            # batch would otherwise trace and compile a whole second
            # program (minutes on remote backends) for a few frames.
            stacked = [
                np.concatenate([s, np.repeat(s[-1:], batch - n, 0)])
                for s in stacked
            ]
        pending.append((n, transform_async(*stacked)))
        for b in batches:
            b.clear()

    def retire():
        n, outs = pending.popleft()
        if not isinstance(outs, tuple):
            outs = (outs,)
        tb = time.perf_counter()
        host = [np.asarray(o) for o in outs]  # waits for the device
        # "seconds" counts time BLOCKED on device results; with
        # prefetch > 0 compute hidden behind host IO is excluded
        # (wall_seconds is the honest end-to-end number).
        stats.record(n, time.perf_counter() - tb)
        for k in range(n):
            yield tuple(h[k] for h in host)

    while True:
        item = inq.get()
        if item is None:
            break
        if isinstance(item, BaseException):
            raise item
        for b, p in zip(batches, item):
            b.append(p)
        if len(batches[0]) >= batch:
            submit()
            while len(pending) > max(prefetch, 0):
                yield from retire()
    submit()
    while pending:
        yield from retire()


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
        "--input-size", type=_parse_size, default=None, metavar="WxH",
        help="input frame size (required for raw .yuv input), e.g. 3840x2160",
    )
    p.add_argument(
        "-i", "--input", required=True,
        help="input video file, or raw planar stream (.yuv/.raw/.i420, "
             "or '-' for stdin)",
    )
    p.add_argument(
        "-o", "--output", required=True,
        help="output video file, or raw planar stream (.yuv/.raw/.i420, "
             "or '-' for stdout)",
    )
    p.add_argument(
        "--fps", type=float, default=None,
        help="output frame rate (default: input rate, or 30 for raw input)",
    )
    p.add_argument(
        "--pix-fmt", default="yuv420p",
        help="planar pixel format of raw streams (yuv420p/yuv422p/"
             "yuv444p/yuv411p/yuv410p/gray); video containers are yuv420p",
    )
    p.add_argument("--batch", type=int, default=8, help="frames per device step")
    p.add_argument(
        "--devices", type=int, default=None,
        help="batch mode: shard each batch over this many chips (0 = all "
             "available; --batch must be a multiple; default 1). With "
             "--latency-bands N: total local chips for the bands x frames "
             "grid — every N chips serve one frame's bands, so D chips "
             "keep D//N frames in flight, each at banded latency "
             "(default: all available)",
    )
    p.add_argument(
        "--latency-bands", type=int, default=0, metavar="N",
        help="single-frame LATENCY mode: band each frame's output rows "
             "over N devices (0 = off; -1 = one band per device) instead "
             "of batching frames — for live streams where per-frame "
             "latency matters more than throughput. Composes with "
             "--devices (bands x frames grid) and --distributed (N is "
             "the GLOBAL band count; each process runs a contiguous band "
             "group on its own chips and writes its own output row "
             "slice)",
    )
    p.add_argument(
        "--prefetch", type=int, default=1,
        help="batches in flight on the device while the host decodes/"
             "encodes neighboring batches (0 = fully synchronous)",
    )
    p.add_argument("--frames", type=int, default=0, help="max frames (0 = all)")
    p.add_argument(
        "--save-plan", default=None, help="serialize the built plan to this path"
    )
    p.add_argument(
        "--load-plan", default=None, help="reuse a previously saved plan"
    )
    p.add_argument("--stats", action="store_true", help="print a JSON stats line")
    p.add_argument(
        "--backend", choices=("auto", "native"), default="auto",
        help="'auto' = the JAX/TPU pipeline; 'native' = the dependency-"
             "free C++ engine (CPU, the reference's threading model) — "
             "no JAX required",
    )
    p.add_argument(
        "--distributed", default=None, metavar="SPEC",
        help="join a multi-host JAX run before building the mesh: 'env' "
             "(use JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/"
             "JAX_PROCESS_ID, or a managed TPU pod's auto-detection) or "
             "'HOST:PORT,NPROC,PID'; combine with --devices 0 for the "
             "global mesh. Each process feeds and writes its own frame "
             "slice.",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.latency_bands and args.backend == "native":
        print("error: --latency-bands requires the JAX backend",
              file=sys.stderr)
        return 2

    if args.backend == "native":
        if args.devices not in (None, 1):
            print("error: --devices requires the JAX backend",
                  file=sys.stderr)
            return 2
        if args.save_plan or args.load_plan:
            print("error: plan files apply to the JAX backend only",
                  file=sys.stderr)
            return 2
        if args.distributed:
            print("error: --distributed requires the JAX backend",
                  file=sys.stderr)
            return 2
    else:
        # Persistent compilation cache: repeat CLI invocations of the same
        # config skip the (minutes-long on remote backends) XLA compile.
        from .utils.backend import enable_compilation_cache

        enable_compilation_cache()

    pf = get_pixel_format(args.pix_fmt)
    if is_raw_path(args.input):
        if args.input_size is None:
            print("error: --input-size is required for raw YUV input",
                  file=sys.stderr)
            return 2
        in_w, in_h = args.input_size
        fps = args.fps or 30.0
        frames_in = read_planar_frames(
            args.input, in_w, in_h, args.frames, pf
        )
    else:
        if pf.name != "yuv420p":
            print("error: video containers decode as yuv420p; --pix-fmt "
                  "applies to raw streams only", file=sys.stderr)
            return 2
        reader = VideoReader(args.input, args.frames)
        in_w, in_h = reader.width, reader.height
        if args.input_size and args.input_size != (in_w, in_h):
            print(
                f"error: --input-size {args.input_size[0]}x{args.input_size[1]}"
                f" does not match the stream ({in_w}x{in_h})",
                file=sys.stderr,
            )
            return 2
        fps = args.fps or reader.fps
        frames_in = iter(reader)

    if not is_raw_path(args.output) and pf.name != "yuv420p":
        # validate before the reader thread starts (see read_loop)
        print("error: video-container output requires yuv420p",
              file=sys.stderr)
        return 2

    if args.latency_bands and args.distributed and not is_raw_path(
        args.output
    ):
        # each process emits its ROW SLICE of every frame; only raw
        # streams can carry partial frames (stitch slices by vertical
        # concatenation in process order)
        print("error: --latency-bands with --distributed writes per-"
              "process row slices; use raw output (.yuv/.raw/-)",
              file=sys.stderr)
        return 2

    if args.distributed:
        from .parallel import distributed as dist

        if args.distributed == "env":
            dist.initialize()
        else:
            try:
                coord, nproc, pid = args.distributed.split(",")
                dist.initialize(coord, int(nproc), int(pid))
            except ValueError:
                print("error: --distributed expects 'env' or "
                      "'HOST:PORT,NPROC,PID'", file=sys.stderr)
                return 2

    mesh = None
    if not args.latency_bands and args.devices not in (None, 1):
        import jax

        from .parallel import make_mesh

        avail = jax.devices()
        n = len(avail) if args.devices == 0 else args.devices
        if n > len(avail):
            print(
                f"error: --devices {n} but only {len(avail)} available",
                file=sys.stderr,
            )
            return 2
        if args.batch % n:
            print(
                f"error: --batch {args.batch} is not a multiple of "
                f"--devices {n}",
                file=sys.stderr,
            )
            return 2
        mesh = make_mesh(avail[:n])

    t = open_filter(
        args.vf, in_w, in_h, eager=args.load_plan is None, pix_fmt=pf,
        mesh=mesh, backend=args.backend,
    )
    if args.load_plan:
        t.load_plan(args.load_plan)

    # with stdout as the output stream, diagnostics must not corrupt it
    stats = StageStats(
        stream=sys.stderr if args.output == "-" else sys.stdout
    )
    t0 = time.perf_counter()

    inq, stop = start_reader(frames_in, args.batch)

    def frames_out_banded():
        """Latency mode: each frame's output rows banded over devices
        (parallel.latency).  With more local devices than bands, device
        group g serves frame k%G — up to G frames in flight, each still
        at banded per-frame latency.  Under --distributed, this process
        runs its contiguous group of the GLOBAL bands and yields its row
        slice of every frame (stitch outputs by vertical concatenation
        in process order)."""
        import jax

        from .parallel.latency import (
            local_band_range,
            transform_frame_banded_async,
        )

        devs = jax.local_devices()
        if args.devices not in (None, 0):
            if args.devices > len(devs):
                raise RuntimeError(
                    f"--devices {args.devices} but only {len(devs)} "
                    "local devices"
                )
            devs = devs[: args.devices]
        n_total = (
            len(jax.devices()) if args.latency_bands < 0
            else args.latency_bands
        )
        bslice = None
        if args.distributed:
            bslice = local_band_range(n_total)
            nb = bslice[1] - bslice[0]
        else:
            n_total = min(n_total, len(devs))
            nb = n_total
        n_use = min(max(nb, 1), len(devs))
        n_groups = max(1, len(devs) // n_use)
        plan = t.plan
        pending = deque()

        def retire():
            tb0, bf = pending.popleft()
            outs = bf.gather()
            stats.record(1, time.perf_counter() - tb0)
            return outs

        g = 0
        while True:
            item = inq.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            group = devs[(g % n_groups) * n_use:][:n_use]
            g += 1
            tb = time.perf_counter()
            # Uniform band edges.  The fitted cost model (row_costs=
            # "auto") existed for the ~2x equator/pole imbalance of the
            # pre-CLASS_P kernels; after CLASS_P/CLASS_T the measured
            # per-row profile is flat (~1.2x) and uniform edges BEAT the
            # model-balanced ones on chip at every band count
            # (2026-08-20: max band 9.53 vs 11.74 ms at n=4, 5.51 vs
            # 6.25 at n=8 — docs/perf.md "Latency sharding").  Uniform
            # edges also align to supertile rows, avoiding duplicated
            # edge rows.
            pending.append((tb, transform_frame_banded_async(
                plan, item, devices=group, n=n_total,
                row_costs=None, bands_slice=bslice,
            )))
            if len(pending) >= n_groups:
                yield retire()
        while pending:
            yield retire()

    def frames_out():
        return batched_outputs(
            t.transform_async, inq, pf.n_planes, args.batch, args.prefetch,
            stats,
        )

    out_iter = frames_out_banded if args.latency_bands else frames_out
    try:
        if is_raw_path(args.output):
            write_yuv420_frames(args.output, out_iter())
        else:
            out_w, out_h = t.output_dims()
            with VideoWriter(args.output, out_w, out_h, fps) as w:
                for oy, ou, ov in out_iter():
                    w.write(oy, ou, ov)
    finally:
        stop.set()  # release a reader blocked on the full queue
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
