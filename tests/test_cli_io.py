"""CLI + raw YUV IO tests (the FFmpeg-shell analog, SURVEY C1/C10/C11)."""

import json

import numpy as np
import pytest

from transform360_tpu.cli import main as cli_main
from transform360_tpu.config import chroma_dims
from transform360_tpu.utils.yuv import (
    frame_size_bytes,
    read_yuv420_batch,
    read_yuv420_frames,
    write_yuv420_batch,
)


def make_stream(tmp_path, rng, n, w, h):
    cw, ch = chroma_dims(w, h)
    y = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
    u = rng.integers(0, 256, (n, ch, cw), dtype=np.uint8)
    v = rng.integers(0, 256, (n, ch, cw), dtype=np.uint8)
    path = tmp_path / "in.yuv"
    write_yuv420_batch(str(path), y, u, v)
    return path, (y, u, v)


def test_yuv_roundtrip(tmp_path, rng):
    path, (y, u, v) = make_stream(tmp_path, rng, 3, 64, 32)
    assert path.stat().st_size == 3 * frame_size_bytes(64, 32)
    ry, ru, rv = read_yuv420_batch(str(path), 64, 32)
    np.testing.assert_array_equal(ry, y)
    np.testing.assert_array_equal(ru, u)
    np.testing.assert_array_equal(rv, v)


def test_yuv_truncated_final_frame(tmp_path, rng):
    path, _ = make_stream(tmp_path, rng, 2, 64, 32)
    with open(path, "ab") as f:
        f.write(b"\x00" * 100)  # partial frame must be dropped
    frames = list(read_yuv420_frames(str(path), 64, 32))
    assert len(frames) == 2


def test_cli_end_to_end(tmp_path, rng, capsys):
    path, _ = make_stream(tmp_path, rng, 5, 128, 64)
    out = tmp_path / "out.yuv"
    rc = cli_main(
        [
            "--vf",
            "cube_edge_length=32:input_stereo_format=mono:"
            "interpolation_alg=linear:enable_low_pass_filter=0",
            "--input-size",
            "128x64",
            "-i",
            str(path),
            "-o",
            str(out),
            "--batch",
            "2",
            "--stats",
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip())
    assert stats["frames"] == 5
    assert stats["out_size"] == "96x64"
    assert out.stat().st_size == 5 * frame_size_bytes(96, 64)


def _make_video(tmp_path, n, w, h):
    """Synthesize a short video with the shim's own writer (ffmpeg if
    present, else cv2) and return (path, decoded frames)."""
    from transform360_tpu.utils.video import VideoReader, VideoWriter

    cw, ch = chroma_dims(w, h)
    path = tmp_path / "in.avi"
    with VideoWriter(str(path), w, h, fps=25.0) as wr:
        for k in range(n):
            yy, xx = np.mgrid[0:h, 0:w]
            y = ((xx * 2 + yy + 17 * k) % 256).astype(np.uint8)
            u = np.full((ch, cw), 90 + 10 * k, np.uint8)
            v = np.full((ch, cw), 150 - 10 * k, np.uint8)
            wr.write(y, u, v)
    decoded = list(VideoReader(str(path)))
    assert len(decoded) == n
    return path, decoded


def test_cli_video_file_roundtrip(tmp_path, capsys):
    """Drop-in video workflow: -i in.avi -o out.yuv end to end.  The
    output (lossless raw) must equal transforming the decoded frames
    directly — the container decode is the only extra step."""
    pytest.importorskip("cv2")
    from transform360_tpu import open_filter
    from transform360_tpu.utils.yuv import read_yuv420_batch

    w, h, n = 128, 64, 4
    path, decoded = _make_video(tmp_path, n, w, h)
    out = tmp_path / "out.yuv"
    vf = (
        "cube_edge_length=32:input_stereo_format=mono:"
        "interpolation_alg=linear:enable_low_pass_filter=0"
    )
    rc = cli_main(
        ["--vf", vf, "-i", str(path), "-o", str(out), "--batch", "2", "--stats"]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip())
    assert stats["frames"] == n

    t = open_filter(vf, w, h)
    oy, ou, ov = read_yuv420_batch(str(out), 96, 64)
    for k, (y, u, v) in enumerate(decoded):
        ey, eu, ev = t.transform(y, u, v)
        np.testing.assert_array_equal(oy[k], ey)
        np.testing.assert_array_equal(ou[k], eu)
        np.testing.assert_array_equal(ov[k], ev)


def test_cli_video_output(tmp_path, capsys):
    """Video-container output: encode, re-decode, PSNR-check a frame
    against the direct transform (output codec is the only lossy step)."""
    pytest.importorskip("cv2")
    from tests.conftest import psnr
    from transform360_tpu import open_filter
    from transform360_tpu.utils.video import VideoReader

    w, h, n = 128, 64, 3
    path, decoded = _make_video(tmp_path, n, w, h)
    out = tmp_path / "out.avi"
    vf = (
        "cube_edge_length=32:input_stereo_format=mono:"
        "interpolation_alg=linear:enable_low_pass_filter=0"
    )
    rc = cli_main(["--vf", vf, "-i", str(path), "-o", str(out)])
    assert rc == 0
    got = list(VideoReader(str(out)))
    assert len(got) == n
    t = open_filter(vf, w, h)
    ey, _, _ = t.transform(*decoded[0])
    assert got[0][0].shape == ey.shape
    assert psnr(got[0][0], ey) >= 28.0  # lossy codec round trip


def test_cli_tail_batch_padding(tmp_path, rng, capsys):
    """A partial final batch is padded to the steady-state batch shape so
    the shape-specialized executors are traced exactly once, and the
    padded frames never reach the output."""
    from transform360_tpu import open_filter, pipeline

    path, (y, u, v) = make_stream(tmp_path, rng, 5, 128, 64)
    out = tmp_path / "out.yuv"
    vf = (
        "cube_edge_length=32:input_stereo_format=mono:"
        "interpolation_alg=linear:enable_low_pass_filter=0"
    )
    pipeline.clear_executor_cache()
    rc = cli_main(
        ["--vf", vf, "--input-size", "128x64", "-i", str(path),
         "-o", str(out), "--batch", "4", "--stats"]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip())
    assert stats["frames"] == 5
    assert out.stat().st_size == 5 * frame_size_bytes(96, 64)
    # one staged shape per plane executor: the 1-frame tail reused the
    # batch-4 program instead of tracing a second one
    assert pipeline._EXEC_CACHE
    assert all(
        len(ex._by_shape) == 1 for ex in pipeline._EXEC_CACHE.values()
    )
    t = open_filter(vf, 128, 64)
    oy, ou, ov = read_yuv420_batch(str(out), 96, 64)
    ey, eu, ev = t.transform(y, u, v)
    np.testing.assert_array_equal(oy, np.asarray(ey))
    np.testing.assert_array_equal(ou, np.asarray(eu))
    np.testing.assert_array_equal(ov, np.asarray(ev))


@pytest.mark.parametrize("prefetch", [0, 2])
def test_cli_overlapped_pipeline(tmp_path, rng, prefetch):
    """The threaded decode + async-dispatch pipeline (any --prefetch
    depth, including fully synchronous 0) must produce frames in order,
    byte-identical to the direct API."""
    from transform360_tpu import open_filter

    vf = (
        "cube_edge_length=32:input_stereo_format=mono:"
        "interpolation_alg=linear:enable_low_pass_filter=0"
    )
    path, (y, u, v) = make_stream(tmp_path, rng, 10, 128, 64)
    out = tmp_path / "out.yuv"
    rc = cli_main(
        ["--vf", vf, "--input-size", "128x64", "-i", str(path),
         "-o", str(out), "--batch", "3", "--prefetch", str(prefetch)]
    )
    assert rc == 0
    oy, ou, ov = read_yuv420_batch(str(out), 96, 64)
    ey, eu, ev = open_filter(vf, 128, 64).transform(y, u, v)
    np.testing.assert_array_equal(oy, np.asarray(ey))
    np.testing.assert_array_equal(ou, np.asarray(eu))
    np.testing.assert_array_equal(ov, np.asarray(ev))


def test_cli_reader_error_propagates(tmp_path):
    """A decode failure on the reader thread must surface in the main
    thread (the raw stream is opened lazily on the reader thread), not
    hang or silently truncate."""
    out = tmp_path / "out.yuv"
    with pytest.raises(FileNotFoundError):
        cli_main(
            ["--vf", "w=64:h=32", "--input-size", "64x32",
             "-i", str(tmp_path / "missing.yuv"), "-o", str(out)]
        )

    # an empty stream is not an error: zero frames in, zero bytes out
    empty = tmp_path / "in.yuv"
    empty.write_bytes(b"")
    rc = cli_main(
        ["--vf", "w=64:h=32", "--input-size", "64x32",
         "-i", str(empty), "-o", str(out)]
    )
    assert rc == 0
    assert out.stat().st_size == 0


def test_cli_consumer_failure_releases_reader(tmp_path, rng):
    """If the consumer dies mid-stream (here: the output path is a
    directory), the reader thread must not stay blocked on the bounded
    queue pinning the input file — in-process callers would leak one
    thread + file handle per failed invocation."""
    import threading
    import time as _time

    path, _ = make_stream(tmp_path, rng, 64, 128, 64)  # >> queue capacity
    before = threading.active_count()
    with pytest.raises(OSError):  # writer open fails on a directory
        cli_main(
            ["--vf", "w=64:h=32", "--input-size", "128x64",
             "-i", str(path), "-o", str(tmp_path), "--batch", "2"]
        )
    deadline = _time.monotonic() + 5.0
    while threading.active_count() > before and _time.monotonic() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before


def test_cli_deep_format_raw_roundtrip(tmp_path, rng):
    """The CLI transforms a raw 10-bit (yuv420p10le) stream end-to-end:
    uint16 LE planes in, uint16 LE planes out, matching the library
    transform exactly (deep formats are beyond the reference — see
    docs/parity.md)."""
    from transform360_tpu import open_filter
    from transform360_tpu.utils.yuv import (
        read_planar_frames,
        write_yuv420_frames,
    )

    w, h = 64, 32
    cw, ch = chroma_dims(w, h)
    y = rng.integers(0, 1024, (2, h, w), dtype=np.uint16)
    u = rng.integers(0, 1024, (2, ch, cw), dtype=np.uint16)
    v = rng.integers(0, 1024, (2, ch, cw), dtype=np.uint16)
    path = tmp_path / "in10.yuv"
    write_yuv420_frames(str(path), zip(y, u, v))
    out = tmp_path / "out10.yuv"
    rc = cli_main(
        ["--vf", "w=32:h=16:enable_low_pass_filter=0", "--input-size",
         f"{w}x{h}", "--pix-fmt", "yuv420p10le", "-i", str(path),
         "-o", str(out)]
    )
    assert rc == 0
    t = open_filter(
        "w=32:h=16:enable_low_pass_filter=0", w, h, pix_fmt="yuv420p10le"
    )
    want = t.transform(y, u, v)
    frames = list(read_planar_frames(str(out), 32, 16, 0, "yuv420p10le"))
    assert len(frames) == 2
    for k, planes in enumerate(frames):
        for got, exp in zip(planes, want):
            assert got.dtype == np.dtype("<u2")
            np.testing.assert_array_equal(got, exp[k])


def test_cli_output_validation_before_reader(tmp_path, rng):
    """Invalid output combos (non-420 pix-fmt + container output) must be
    rejected before the decode thread starts."""
    import threading

    path, _ = make_stream(tmp_path, rng, 2, 64, 32)
    before = threading.active_count()
    rc = cli_main(
        ["--vf", "w=32:h=16", "--input-size", "64x32", "--pix-fmt",
         "yuv444p", "-i", str(path), "-o", str(tmp_path / "out.mp4")]
    )
    assert rc == 2
    assert threading.active_count() == before


def test_cli_raw_input_requires_size(tmp_path):
    rc = cli_main(
        ["--vf", "w=64:h=32", "-i", str(tmp_path / "x.yuv"), "-o",
         str(tmp_path / "y.yuv")]
    )
    assert rc == 2


def test_cli_plan_save_load(tmp_path, rng, capsys):
    path, _ = make_stream(tmp_path, rng, 2, 128, 64)
    plan_file = tmp_path / "plan.pkl"
    out1, out2 = tmp_path / "o1.yuv", tmp_path / "o2.yuv"
    common = [
        "--vf",
        "cube_edge_length=32:input_stereo_format=mono:"
        "interpolation_alg=linear:enable_low_pass_filter=0",
        "--input-size", "128x64", "-i", str(path), "--batch", "2",
    ]
    cli_main(common + ["-o", str(out1), "--save-plan", str(plan_file)])
    cli_main(common + ["-o", str(out2), "--load-plan", str(plan_file)])
    assert out1.read_bytes() == out2.read_bytes()


def test_split_i420_odd_dims():
    """Odd-width/-height yuv420p frames (ceil-halved chroma) split
    correctly from the flat byte stream — total bytes are not a multiple
    of the width, so a [h*3/2, w] view cannot exist."""
    from transform360_tpu.utils.video import _split_i420

    w, h = 639, 481
    cw, ch = (w + 1) // 2, (h + 1) // 2
    n = w * h + 2 * cw * ch
    buf = np.arange(n, dtype=np.int64).astype(np.uint8)
    y, u, v = _split_i420(buf, w, h)
    assert y.shape == (h, w) and u.shape == (ch, cw) and v.shape == (ch, cw)
    np.testing.assert_array_equal(y.reshape(-1), buf[: w * h])
    np.testing.assert_array_equal(u.reshape(-1), buf[w * h : w * h + cw * ch])
    np.testing.assert_array_equal(v.reshape(-1), buf[w * h + cw * ch :])


def test_parse_frame_rate():
    """ffprobe r_frame_rate parsing: fractions, integers, and the "0/0"
    degenerate report (regression: ZeroDivisionError)."""
    from transform360_tpu.utils.video import parse_frame_rate

    assert parse_frame_rate("30000/1001") == pytest.approx(29.97, abs=0.01)
    assert parse_frame_rate("25/1") == 25.0
    assert parse_frame_rate("24") == 24.0
    assert parse_frame_rate("0/0") == 30.0
    assert parse_frame_rate("0/1", default=15.0) == 15.0
    assert parse_frame_rate("garbage") == 30.0


def test_read_exact_on_chunky_stream():
    """Pipes return partial reads; frame reads must loop to the full size."""
    import io

    from transform360_tpu.utils.yuv import _read_exact

    class Chunky:
        def __init__(self, data, chunk):
            self._b, self._c = io.BytesIO(data), chunk

        def read(self, n):
            return self._b.read(min(n, self._c))

    data = bytes(range(256)) * 10
    src = Chunky(data, 7)
    assert _read_exact(src, 1000) == data[:1000]
    assert _read_exact(src, 2000) == data[1000:]  # short at EOF
    assert _read_exact(src, 10) == b""


def test_cli_stdin_stdout_pipe(tmp_path, rng, monkeypatch):
    """`-i - -o -` streams raw planes through stdin/stdout (the ffmpeg
    rawvideo idiom) and matches the file-path run byte for byte, with
    diagnostics kept off stdout."""
    import io
    import sys as _sys
    import types

    from tests.test_parallel import make_batch
    from transform360_tpu.utils.yuv import write_yuv420_batch

    y, u, v = make_batch(rng, 5, 64, 128)
    path = tmp_path / "in.yuv"
    write_yuv420_batch(str(path), y, u, v)
    vf = ("w=64:h=32:input_stereo_format=mono:output_layout=equirect:"
          "interpolation_alg=linear:enable_low_pass_filter=0")
    args = ["--vf", vf, "--input-size", "128x64", "--batch", "2", "--stats"]
    assert cli_main(args + ["-i", str(path), "-o", str(tmp_path / "want.yuv")]) == 0

    fake_in = types.SimpleNamespace(buffer=io.BytesIO(path.read_bytes()))
    fake_out = types.SimpleNamespace(buffer=io.BytesIO())
    monkeypatch.setattr(_sys, "stdin", fake_in)
    monkeypatch.setattr(_sys, "stdout", fake_out)
    try:
        rc = cli_main(args + ["-i", "-", "-o", "-"])
    finally:
        monkeypatch.undo()
    assert rc == 0
    assert fake_out.buffer.getvalue() == (tmp_path / "want.yuv").read_bytes()


def test_cli_native_backend(tmp_path, rng, capsys):
    from transform360_tpu import native

    if not native.available():
        pytest.skip("native engine unavailable")
    path, _ = make_stream(tmp_path, rng, 4, 128, 64)
    vf = (
        "cube_edge_length=32:input_stereo_format=mono:"
        "interpolation_alg=linear:enable_low_pass_filter=0"
    )
    common = ["--vf", vf, "--input-size", "128x64", "-i", str(path),
              "--batch", "2"]
    out_n = tmp_path / "out_native.yuv"
    rc = cli_main(common + ["-o", str(out_n), "--backend", "native"])
    assert rc == 0
    out_j = tmp_path / "out_jax.yuv"
    rc = cli_main(common + ["-o", str(out_j)])
    assert rc == 0
    assert out_n.stat().st_size == 4 * frame_size_bytes(96, 64)
    a = np.fromfile(out_n, np.uint8).astype(np.int32)
    b = np.fromfile(out_j, np.uint8).astype(np.int32)
    mse = max(((a - b) ** 2).mean(), 1e-12)
    assert 10 * np.log10(255.0**2 / mse) > 50  # independent impls agree


def test_cli_native_backend_rejects_jax_only_flags(tmp_path, rng):
    path, _ = make_stream(tmp_path, rng, 1, 64, 32)
    base = ["--vf", "w=32:h=16:enable_low_pass_filter=0", "--input-size",
            "64x32", "-i", str(path), "-o", str(path) + ".out",
            "--backend", "native"]
    assert cli_main(base + ["--devices", "2"]) == 2
    assert cli_main(base + ["--save-plan", str(path) + ".plan"]) == 2
