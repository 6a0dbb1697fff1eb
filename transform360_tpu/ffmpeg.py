"""Drop-in ``ffmpeg`` front end: run an UNCHANGED reference command line.

The reference ships as an ``AVFilter`` compiled into libavfilter and is
driven as ``ffmpeg -i in.mp4 -vf transform360="k=v:k=v" out.mp4``
(reference ``README.md:84-95``, ``vf_transform360.c:1013-1023``).  This
module accepts that exact argv — swap ``ffmpeg`` for
``python -m transform360_tpu.ffmpeg`` and nothing else changes::

    python -m transform360_tpu.ffmpeg -y -i in.mp4 \
        -vf transform360="cube_edge_length=512:interpolation_alg=cubic" \
        -c:v libx264 out.mp4

It splits the command at the transform360 filter: filters BEFORE it run
in an ffmpeg decode subprocess, the transform itself runs on the TPU
(batched + prefetched, same pipeline as :mod:`.cli`), and filters AFTER
it plus every output option run in an ffmpeg encode subprocess.  The
raw pipes carry the stream's OWN negotiated pixel format whenever it is
in the pipeline's planar registry (yuv420p/422p/444p/411p/410p/440p,
gbrp, gray — matching the reference filter, which declares no format
list and processes whatever the graph negotiates,
``vf_transform360.c:87-97,107-108``); formats outside it convert to
yuv420p with a warning.  Audio from a container input is mapped through
with ``-c:a copy`` unless the command already routes streams itself
(``-map``/``-an``).  An argv with no transform360 filter is handed to
the real ``ffmpeg`` verbatim.

Wrapper-only knobs (stripped before ffmpeg parsing, or env vars):
``--t360-batch N`` / ``T360_BATCH`` (frames per device step, default 8),
``--t360-prefetch N`` / ``T360_PREFETCH`` (batches in flight, default 1),
``--t360-stats`` (JSON stats line on stderr).

Scope (documented, erroring loudly otherwise): one video input, one
output file; ``-filter_complex`` is accepted for LINEAR single-stream
graphs (``[0:v]...,transform360=...,...[v]`` with ``-map '[v]'`` and
optional source-audio maps — rewritten mechanically into the ``-vf``
split); multi-chain/multi-label graphs error with a rewrite hint.
ffmpeg options unknown to the tokenizer are assumed to take one value
(flag-style options are special-cased in ``FLAG_OPTS``).
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time
from typing import List, Optional, Tuple

import numpy as np

# ffmpeg options that take NO value argument.  Everything else starting
# with "-" is assumed to consume the next token.  (ffmpeg's real parser
# knows per-option arity; this list covers the common flag options so a
# typical command line tokenizes correctly.)
FLAG_OPTS = {
    "-y", "-n", "-an", "-vn", "-sn", "-dn", "-hide_banner", "-nostdin",
    "-stats", "-nostats", "-shortest", "-copyts", "-re", "-autorotate",
    "-noautorotate", "-ignore_unknown", "-xerror", "-benchmark",
    "-accurate_seek", "-noaccurate_seek", "-fix_sub_duration",
    "-apad", "-dump", "-hex", "-vstats", "-psnr", "-qphist",
}

# global ffmpeg options hoisted to BOTH subprocesses regardless of where
# they appeared in the argv
GLOBAL_FLAGS = {"-y", "-n", "-hide_banner", "-nostdin"}


class UsageError(ValueError):
    pass


def tokenize(argv: List[str]):
    """Partition an ffmpeg argv into input groups and the output group.

    Returns ``(inputs, out_opts, out_path, globals_)`` where ``inputs``
    is a list of ``(opts, path)`` — ``opts`` being ``(key, value|None)``
    pairs that preceded that ``-i`` — and ``out_opts`` the pairs between
    the last input and the output path.
    """
    inputs: List[Tuple[list, str]] = []
    globals_: List[str] = []
    cur: List[Tuple[str, Optional[str]]] = []
    out_path = None
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "-i":
            if i + 1 >= len(argv):
                raise UsageError("-i needs a path")
            inputs.append((cur, argv[i + 1]))
            cur = []
            i += 2
        elif a in GLOBAL_FLAGS:
            globals_.append(a)
            i += 1
        elif a.startswith("-") and len(a) > 1:
            if a in FLAG_OPTS:
                cur.append((a, None))
                i += 1
            else:
                if i + 1 >= len(argv):
                    raise UsageError(f"option {a} needs a value")
                cur.append((a, argv[i + 1]))
                i += 2
        else:
            if out_path is not None:
                raise UsageError(
                    f"multiple outputs ({out_path!r}, {a!r}) — the "
                    "transform360 wrapper supports one output file"
                )
            out_path = a
            out_opts, cur = cur, []
            i += 1
    if cur:
        raise UsageError(f"trailing options with no output file: {cur}")
    if out_path is None:
        raise UsageError("no output file in the command line")
    return inputs, out_opts, out_path, globals_


def split_filterchain(graph: str) -> List[str]:
    """Split a -vf filterchain on top-level commas, honoring ffmpeg's
    ``'...'`` quoting and backslash escapes."""
    parts, buf, quoted = [], [], False
    i = 0
    while i < len(graph):
        c = graph[i]
        if c == "\\" and i + 1 < len(graph):
            buf.append(c)
            buf.append(graph[i + 1])
            i += 2
            continue
        if c == "'":
            quoted = not quoted
        if c == "," and not quoted:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(c)
        i += 1
    parts.append("".join(buf))
    return [p.strip() for p in parts]


def _unquote(s: str) -> str:
    """Undo one level of ffmpeg filter-option quoting/escaping."""
    s = s.strip()
    if len(s) >= 2 and s[0] == "'" and s[-1] == "'":
        s = s[1:-1]
    return re.sub(r"\\(.)", r"\1", s)


_LBL = r"\[[^\]]+\]"
_FC_HINT = (
    "a linear single-stream graph works — [0:v]...,transform360=...,"
    "...[v] with -map '[v]' is accepted and handled like -vf; anything "
    "with multiple chains (';'), multiple input/output labels, or maps "
    "of other video streams must be rewritten"
)


def rewrite_filter_complex(out_opts):
    """Rewrite a LINEAR single-stream ``-filter_complex`` graph containing
    transform360 into the ``-vf`` form the wrapper splits.

    The reference filter runs anywhere libavfilter puts it
    (``vf_transform360.c:1013-1023``); the wrapper covers the linear
    single-stream case — one optional ``[0:v]``-style input label, the
    filter chain, one optional output label whose ``-map`` is absorbed
    (the piped video IS that stream) — and errors loudly with a rewrite
    hint on anything it cannot split mechanically.

    Returns ``(new_out_opts, needs_src_input)``: when a remaining
    ``-map 0:a...`` selects source audio it is renumbered to input 1 and
    ``needs_src_input`` tells the encode command to add the source file
    as that input.
    """
    for idx, (k, v) in enumerate(out_opts):
        if k == "-filter_complex" and "transform360" in (v or ""):
            break
    else:
        return out_opts, False
    graph = v.strip()
    if ";" in graph:
        raise UsageError(
            "transform360 inside a multi-chain -filter_complex is not "
            "supported; " + _FC_HINT
        )
    m = re.match(rf"^((?:{_LBL})*)(.*?)((?:{_LBL})*)$", graph, re.S)
    ins = re.findall(_LBL, m.group(1))
    outs = re.findall(_LBL, m.group(3))
    chain = m.group(2).strip()
    if len(ins) > 1 or len(outs) > 1:
        raise UsageError(
            "transform360 -filter_complex with multiple input/output "
            "labels is not supported; " + _FC_HINT
        )
    if ins and ins[0] not in ("[0:v]", "[0:v:0]", "[0]", "[v:0]"):
        raise UsageError(
            f"-filter_complex input {ins[0]} is not the first video "
            "stream; " + _FC_HINT
        )
    out_lbl = outs[0][1:-1] if outs else None

    new = []
    needs_src_input = False
    for i, (k2, v2) in enumerate(out_opts):
        if i == idx:
            new.append(("-vf", chain))
            continue
        if k2 == "-map" and v2 is not None:
            target = v2.strip().strip("'\"").strip("[]")
            if out_lbl is not None and target == out_lbl:
                continue  # the piped video IS this stream now
            if target.startswith("0:a"):
                # source audio: the encode command gets the source file
                # as input 1 (input 0 is the raw video pipe)
                new.append(("-map", "1:" + target[2:]))
                needs_src_input = True
                continue
            raise UsageError(
                f"-map {v2!r} alongside a transform360 -filter_complex "
                "selects a stream the wrapper cannot route; " + _FC_HINT
            )
        new.append((k2, v2))
    return new, needs_src_input


def find_transform360(out_opts):
    """Locate the video-filter option and the transform360 element in it.

    Returns ``(vf_index, pre_chain, t360_options, post_chain)`` or
    ``None`` when the command has no transform360 filter.
    """
    for idx, (k, v) in enumerate(out_opts):
        if k == "-filter_complex" and "transform360" in v:
            raise UsageError(
                "transform360 inside this -filter_complex is not "
                "supported; " + _FC_HINT
            )
        if k == "-vf" or k == "-filter:v" or k.startswith("-filter:v:"):
            chain = split_filterchain(v)
            for j, elem in enumerate(chain):
                name, _, opts = elem.partition("=")
                if name.strip() == "transform360":
                    return idx, chain[:j], _unquote(opts), chain[j + 1:]
    return None


_OUT_RE = re.compile(r"Output #0.*?(\d{2,5})x(\d{2,5})", re.S)
_FPS_RE = re.compile(r"([\d.]+) fps")
_PIX_RE = re.compile(r"Video:[^,]+,\s*([a-z0-9_]+)")


def probe_decoded(in_opts, in_path, pre_chain):
    """Size, rate, and pixel format of the stream ENTERING transform360.

    With no preceding filters this is an ffprobe of the input; otherwise
    one frame is pushed through the pre-chain into the null muxer and the
    Output #0 stream line is parsed — ffmpeg itself reports the
    negotiated post-filter geometry and format.  Returns
    ``(w, h, fps, pix_fmt)``.
    """
    from .utils.video import _probe_ffmpeg

    if not pre_chain:
        return _probe_ffmpeg(in_path)
    cmd = ["ffmpeg", "-hide_banner", *_flatten(in_opts), "-i", in_path,
           "-vf", ",".join(pre_chain), "-frames:v", "1", "-f", "null", "-"]
    r = subprocess.run(cmd, capture_output=True, text=True)
    tail = r.stderr.split("Output #0", 1)
    m = _OUT_RE.search("Output #0" + tail[1]) if len(tail) == 2 else None
    if r.returncode or not m:
        raise UsageError(
            "cannot determine the frame size after the pre-transform360 "
            f"filters {pre_chain}: {r.stderr.strip().splitlines()[-1:]}"
        )
    fm = _FPS_RE.search(tail[1])
    pm = _PIX_RE.search(tail[1])
    return (
        int(m.group(1)), int(m.group(2)),
        float(fm.group(1)) if fm else 30.0,
        pm.group(1) if pm else "yuv420p",
    )


def pipe_format(src_fmt: str) -> str:
    """Raw-pipe pixel format for a probed source format.

    The reference filter declares no pix-fmt list: it processes whatever
    planar format the graph negotiates, reading plane count and chroma
    shifts from the descriptor (``vf_transform360.c:87-97,107-108``).
    Formats in the pipeline's registry pass through losslessly (yuvj*
    renamed to their byte-identical yuv* twin — the rawvideo pipe has no
    JPEG-range tag); anything else (packed, semi-planar, alpha, >8-bit)
    converts to yuv420p with a loud warning, since the TPU pipeline is
    8-bit planar.
    """
    from .config import PIXEL_FORMATS

    fmt = (src_fmt or "yuv420p").lower()
    if fmt.startswith("yuvj"):
        fmt = "yuv" + fmt[4:]
    if fmt in PIXEL_FORMATS:
        return fmt
    print(
        f"warning: pix_fmt {src_fmt!r} is outside the TPU pipeline's "
        "planar-8-bit registry; converting to yuv420p at the decode pipe",
        file=sys.stderr,
    )
    return "yuv420p"


def _flatten(opts) -> List[str]:
    out = []
    for k, v in opts:
        out.append(k)
        if v is not None:
            out.append(v)
    return out


def _extract_t360_opts(argv: List[str]):
    batch = int(os.environ.get("T360_BATCH", "8"))
    prefetch = int(os.environ.get("T360_PREFETCH", "1"))
    stats = False
    rest: List[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--t360-batch":
            batch = int(argv[i + 1])
            i += 2
        elif a == "--t360-prefetch":
            prefetch = int(argv[i + 1])
            i += 2
        elif a == "--t360-stats":
            stats = True
            i += 1
        else:
            rest.append(a)
            i += 1
    return batch, prefetch, stats, rest


def build_commands(inputs, out_opts, out_path, globals_, found, size_rate,
                   out_dims, pix_fmt="yuv420p", needs_src_input=False):
    """Assemble the decode and encode ffmpeg argvs (pure, for tests)."""
    vf_idx, pre_chain, _, post_chain = found
    (in_opts, in_path) = inputs[0]
    in_w, in_h, fps = size_rate
    out_w, out_h = out_dims

    dec = ["ffmpeg", "-v", "error", "-nostdin", *_flatten(in_opts),
           "-i", in_path]
    if pre_chain:
        dec += ["-vf", ",".join(pre_chain)]
    dec += ["-f", "rawvideo", "-pix_fmt", pix_fmt, "-"]

    enc_opts = [p for i, p in enumerate(out_opts) if i != vf_idx]
    overwrite = [f for f in globals_ if f in ("-y", "-n")]
    enc = ["ffmpeg", "-v", "error", *overwrite,
           "-f", "rawvideo", "-pix_fmt", pix_fmt,
           "-s", f"{out_w}x{out_h}", "-r", f"{fps}", "-i", "-"]
    # carry the audio (and let -c:a copy skip a useless re-encode) the way
    # the in-process reference filter graph does — unless the user routes
    # streams explicitly or the IO is raw video anyway
    user_keys = {k for k, _ in enc_opts}
    raw_io = ("-f", "rawvideo") in enc_opts or in_path.endswith(
        (".yuv", ".raw", ".i420")
    )
    if needs_src_input:
        # a rewritten -filter_complex kept explicit source-audio maps
        # (renumbered to input 1): provide that input and map the piped
        # video as stream 0
        enc += ["-i", in_path, "-map", "0:v"]
    elif (
        not raw_io
        and "-map" not in user_keys
        and "-an" not in user_keys
    ):
        enc += ["-i", in_path, "-map", "0:v", "-map", "1:a?"]
        if not ({"-c:a", "-acodec", "-c"} & user_keys):
            enc += ["-c:a", "copy"]
    enc += _flatten(enc_opts)
    if post_chain:
        enc += ["-vf", ",".join(post_chain)]
    enc += [out_path]
    return dec, enc


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    batch, prefetch, want_stats, argv = _extract_t360_opts(argv)

    try:
        inputs, out_opts, out_path, globals_ = tokenize(argv)
        # -filter_complex is a global option: one parked before an -i is
        # hoisted to the output group, then rewritten like any other
        for opts, path in inputs:
            for item in [p for p in opts
                         if p[0] == "-filter_complex"
                         and "transform360" in (p[1] or "")]:
                opts.remove(item)
                out_opts.insert(0, item)
        out_opts, needs_src_input = rewrite_filter_complex(out_opts)
        found = find_transform360(out_opts)
    except UsageError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2

    if found is None:
        # no transform360 in the graph: behave exactly like ffmpeg
        try:
            return subprocess.call(["ffmpeg", *argv])
        except FileNotFoundError:
            print("error: no ffmpeg binary on PATH", file=sys.stderr)
            return 2

    if len(inputs) != 1:
        print(
            f"error: the transform360 wrapper supports exactly one input "
            f"(got {len(inputs)})", file=sys.stderr,
        )
        return 2

    from .api import open_filter
    from .config import get_pixel_format
    from .utils.backend import enable_compilation_cache
    from .utils.profiling import StageStats
    from .utils.video import have_ffmpeg
    from .utils.yuv import read_planar_frames

    if not have_ffmpeg():
        print("error: no ffmpeg binary on PATH", file=sys.stderr)
        return 2

    enable_compilation_cache()

    in_opts, in_path = inputs[0]
    try:
        in_w, in_h, fps, src_fmt = probe_decoded(in_opts, in_path, found[1])
    except (UsageError, subprocess.CalledProcessError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    fmt = pipe_format(src_fmt)

    t = open_filter(found[2], in_w, in_h, pix_fmt=fmt)
    out_w, out_h = t.output_dims()
    dec_cmd, enc_cmd = build_commands(
        inputs, out_opts, out_path, globals_, found,
        (in_w, in_h, fps), (out_w, out_h), pix_fmt=fmt,
        needs_src_input=needs_src_input,
    )

    from .cli import batched_outputs, start_reader

    stats = StageStats(stream=sys.stderr)
    t0 = time.perf_counter()
    dec = subprocess.Popen(dec_cmd, stdout=subprocess.PIPE)
    enc = subprocess.Popen(enc_cmd, stdin=subprocess.PIPE)
    pf = get_pixel_format(fmt)
    inq, stop = start_reader(
        read_planar_frames(dec.stdout, in_w, in_h, 0, pf), batch
    )
    try:
        for planes in batched_outputs(
            t.transform_async, inq, pf.n_planes, batch, prefetch, stats
        ):
            for p in planes:
                enc.stdin.write(np.ascontiguousarray(p, np.uint8).tobytes())
    finally:
        stop.set()
        dec.stdout.close()
        enc.stdin.close()
        rc_dec, rc_enc = dec.wait(), enc.wait()
    dt = time.perf_counter() - t0

    if rc_dec or rc_enc:
        print(
            f"error: ffmpeg subprocess failed (decode rc={rc_dec}, "
            f"encode rc={rc_enc})", file=sys.stderr,
        )
        return rc_dec or rc_enc
    if want_stats:
        stats.emit(
            in_size=f"{in_w}x{in_h}", out_size=f"{out_w}x{out_h}",
            wall_seconds=round(dt, 3),
        )
    else:
        print(
            f"{stats.frames} frames {in_w}x{in_h} -> {out_w}x{out_h} "
            f"in {dt:.2f}s", file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
