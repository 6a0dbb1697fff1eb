"""End-to-end test of the drop-in ffmpeg front end against a REAL ffmpeg
binary, exercising the reference README command shape
(``/root/reference/README.md:84-95``: ``ffmpeg -i in -vf
transform360="k=v:..." out``).

Skips where ffmpeg/ffprobe are not installed (this CI box has neither);
on a machine that has them it catches the failure modes the fake-pipe
tests (test_ffmpeg_wrapper.py) structurally cannot: real option arity in
the tokenizer, real rawvideo pipe framing, real probe-output parsing.

The output codec is lossless rawvideo-in-NUT so the comparison against
the direct API is exact (PSNR inf); geometry is checked against the
reference's negotiation rules (cube edge -> 3Lx2L).
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import psnr

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    shutil.which("ffmpeg") is None or shutil.which("ffprobe") is None,
    reason="no ffmpeg/ffprobe binary on PATH",
)

VF = "cube_edge_length=64:interpolation_alg=cubic"


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _wrapper(args, cwd):
    # the -c shim pins the CPU platform before the wrapper imports the
    # pipeline (ambient environments may pin a TPU plugin at interpreter
    # start, where the env var alone is not enough)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import sys\n"
        "from transform360_tpu.ffmpeg import main\n"
        "sys.exit(main(sys.argv[1:]))\n"
    )
    return subprocess.run(
        [sys.executable, "-c", code, *args],
        capture_output=True, text=True, env=_env(), cwd=cwd, timeout=600,
    )


def _synthesize(path, size="512x256", pix_fmt="yuv420p", frames=6):
    subprocess.run(
        ["ffmpeg", "-v", "error", "-y", "-f", "lavfi", "-i",
         f"testsrc2=size={size}:rate=5", "-frames:v", str(frames),
         "-pix_fmt", pix_fmt, "-c:v", "ffv1", path],
        check=True, capture_output=True,
    )


def _decode_planes(path, w, h, pix_fmt):
    from transform360_tpu.config import chroma_dims, get_pixel_format

    r = subprocess.run(
        ["ffmpeg", "-v", "error", "-i", path, "-f", "rawvideo",
         "-pix_fmt", pix_fmt, "-"],
        check=True, capture_output=True,
    )
    pf = get_pixel_format(pix_fmt)
    cw, ch = chroma_dims(w, h, pf)
    buf = np.frombuffer(r.stdout, np.uint8)
    fsz = w * h + (pf.n_planes - 1) * cw * ch
    assert buf.size % fsz == 0
    n = buf.size // fsz
    frames = buf.reshape(n, fsz)
    y = frames[:, : w * h].reshape(n, h, w)
    rest = frames[:, w * h :].reshape(n, pf.n_planes - 1, ch, cw)
    return (y, *(rest[:, k] for k in range(pf.n_planes - 1)))


@pytest.mark.parametrize("pix_fmt", ["yuv420p", "yuv444p"])
def test_readme_command_line_real_ffmpeg(tmp_path, pix_fmt):
    """An unchanged reference-style command line round-trips: output
    geometry follows the reference negotiation and the video payload is
    exactly the direct-API transform (lossless codec)."""
    from transform360_tpu import open_filter

    src = str(tmp_path / "in.mkv")
    dst = str(tmp_path / "out.nut")
    _synthesize(src, pix_fmt=pix_fmt)

    r = _wrapper(
        ["-y", "-i", src, "-vf", f"transform360={VF}",
         "-c:v", "rawvideo", dst],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr

    probe = subprocess.run(
        ["ffprobe", "-v", "error", "-select_streams", "v:0",
         "-show_entries", "stream=width,height,pix_fmt", "-of", "csv=p=0",
         dst],
        check=True, capture_output=True, text=True,
    ).stdout.strip().split(",")
    # 2:1 input -> GUESS resolves MONO; edge 64 -> 3Lx2L = 192x128
    assert probe[:2] == ["192", "128"]
    assert probe[2] == pix_fmt

    inp = _decode_planes(src, 512, 256, pix_fmt)
    want = open_filter(VF, 512, 256, pix_fmt=pix_fmt).transform(*inp)
    got = _decode_planes(dst, 192, 128, pix_fmt)
    for g, w in zip(got, want):
        assert g.shape == np.asarray(w).shape
        assert psnr(g, np.asarray(w)) == float("inf")


def test_filter_complex_linear_real_ffmpeg(tmp_path):
    """The linear -filter_complex form produces the same bytes as -vf."""
    src = str(tmp_path / "in.mkv")
    _synthesize(src)
    outs = []
    for name, args in [
        ("vf.nut", ["-vf", f"transform360={VF}"]),
        ("fc.nut", ["-filter_complex", f"[0:v]transform360={VF}[v]",
                    "-map", "[v]"]),
    ]:
        dst = str(tmp_path / name)
        r = _wrapper(["-y", "-i", src, *args, "-c:v", "rawvideo", dst],
                     cwd=str(tmp_path))
        assert r.returncode == 0, r.stderr
        outs.append(_decode_planes(dst, 192, 128, "yuv420p"))
    for a, b in zip(*outs):
        assert np.array_equal(a, b)


def test_filter_complex_multichain_real_ffmpeg(tmp_path):
    """A multi-chain graph — upstream scale chain, downstream hflip chain
    — splits at the transform and matches the equivalent -vf pipeline."""
    src = str(tmp_path / "in.mkv")
    _synthesize(src)
    vf_dst = str(tmp_path / "vf.nut")
    r = _wrapper(
        ["-y", "-i", src,
         "-vf", f"scale=256:128,transform360={VF},hflip",
         "-c:v", "rawvideo", vf_dst],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr

    fc_dst = str(tmp_path / "fc.nut")
    r = _wrapper(
        ["-y", "-i", src,
         "-filter_complex",
         f"[0:v]scale=256:128[s];[s]transform360={VF}[t];[t]hflip[v]",
         "-map", "[v]", "-c:v", "rawvideo", fc_dst],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr

    for a, b in zip(
        _decode_planes(vf_dst, 192, 128, "yuv420p"),
        _decode_planes(fc_dst, 192, 128, "yuv420p"),
    ):
        assert np.array_equal(a, b)
