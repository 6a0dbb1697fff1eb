"""Drop-in ffmpeg front end (transform360_tpu.ffmpeg).

The reference is driven as ``ffmpeg -i in -vf transform360="..." out``
(reference README.md:84-95); the wrapper accepts that argv unchanged.
No ffmpeg binary ships in CI, so the end-to-end test fakes the decode/
encode subprocesses with in-memory pipes — the argv parsing, command
assembly, and the batched transform pipeline are all real.
"""

import io
import subprocess

import numpy as np
import pytest

from transform360_tpu import ffmpeg as wrap

VF = (
    "cube_edge_length=32:input_stereo_format=mono:"
    "interpolation_alg=linear:enable_low_pass_filter=0"
)


# ---------------------------------------------------------------- parsing

def test_tokenize_basic():
    inputs, out_opts, out_path, g = wrap.tokenize(
        ["-y", "-ss", "10", "-i", "in.mp4", "-c:v", "libx264", "-an",
         "out.mp4"]
    )
    assert g == ["-y"]
    assert inputs == [([("-ss", "10")], "in.mp4")]
    assert out_opts == [("-c:v", "libx264"), ("-an", None)]
    assert out_path == "out.mp4"


def test_tokenize_rejects_multiple_outputs_and_missing_output():
    with pytest.raises(wrap.UsageError):
        wrap.tokenize(["-i", "a.mp4", "o1.mp4", "o2.mp4"])
    with pytest.raises(wrap.UsageError):
        wrap.tokenize(["-i", "a.mp4", "-c:v", "libx264"])
    with pytest.raises(wrap.UsageError):
        wrap.tokenize(["-i"])


def test_tokenize_outputs_multi():
    inputs, outputs, g = wrap.tokenize_outputs(
        ["-y", "-i", "in.mp4", "-vf", f"transform360={VF}", "-c:v",
         "libx264", "out1.mp4", "-c:v", "libx265", "-an", "out2.mp4"]
    )
    assert [p for _, p in outputs] == ["out1.mp4", "out2.mp4"]
    assert outputs[0][0][0] == ("-vf", f"transform360={VF}")
    assert outputs[1][0] == [("-c:v", "libx265"), ("-an", None)]


def test_build_command_extra_passthrough():
    cmd = wrap.build_command_extra(
        [([("-ss", "3")], "in.mp4")],
        [("-c:v", "libx265"), ("-an", None)],
        "out2.mp4",
        ["-y"],
    )
    assert cmd == ["ffmpeg", "-v", "error", "-nostdin", "-y", "-ss", "3",
                   "-i", "in.mp4", "-c:v", "libx265", "-an", "out2.mp4"]


def test_main_rejects_bad_multi_output_shapes(capsys):
    # transform in two outputs
    rc = wrap.main(
        ["-i", "in.mp4", "-vf", "transform360=w=64", "o1.mp4",
         "-vf", "transform360=w=64", "o2.mp4"]
    )
    assert rc == 2 and "more than one output" in capsys.readouterr().err
    # filter_complex transform with a second output
    rc = wrap.main(
        ["-i", "in.mp4", "-filter_complex", "[0:v]transform360=w=64[v]",
         "-map", "[v]", "o1.mp4", "-an", "o2.mp4"]
    )
    assert rc == 2 and "-filter_complex" in capsys.readouterr().err


def test_split_filterchain_quoting():
    assert wrap.split_filterchain("scale=640:320,transform360=w=64") == [
        "scale=640:320", "transform360=w=64",
    ]
    # commas inside ffmpeg '...' quoting or backslash-escaped do not split
    assert wrap.split_filterchain("crop='iw,2',t360") == ["crop='iw,2'", "t360"]
    assert wrap.split_filterchain(r"a=1\,2,b") == [r"a=1\,2", "b"]


def test_find_transform360_variants():
    found = wrap.find_transform360(
        [("-c:v", "libx264"),
         ("-vf", "scale=320:160,transform360=cube_edge_length=64,hflip")]
    )
    idx, pre, opts, post = found
    assert idx == 1
    assert pre == ["scale=320:160"]
    assert opts == "cube_edge_length=64"
    assert post == ["hflip"]

    # -filter:v alias; quoted option payload is unwrapped
    idx, pre, opts, post = wrap.find_transform360(
        [("-filter:v", "transform360='w=64:h=32'")]
    )
    assert (pre, opts, post) == ([], "w=64:h=32", [])

    assert wrap.find_transform360([("-vf", "scale=1:1"), ("-b:v", "1M")]) is None


def test_build_commands_structure():
    argv = ["-y", "-i", "in.mp4", "-vf",
            f"scale=256:128,transform360={VF},hflip",
            "-c:v", "libx264", "-crf", "18", "out.mp4"]
    inputs, out_opts, out_path, g = wrap.tokenize(argv)
    found = wrap.find_transform360(out_opts)
    dec, enc = wrap.build_commands(
        inputs, out_opts, out_path, g, found, (256, 128, 25.0), (96, 64)
    )
    # decode: pre-chain applied, rawvideo to stdout
    assert dec[:3] == ["ffmpeg", "-v", "error"]
    assert dec[-5:] == ["-f", "rawvideo", "-pix_fmt", "yuv420p", "-"]
    assert "-vf" in dec and dec[dec.index("-vf") + 1] == "scale=256:128"
    assert "transform360" not in " ".join(dec)
    # encode: -y carried, sized rawvideo stdin, audio mapped from the
    # source with stream-copy, post-chain + user opts + output preserved
    assert "-y" in enc
    assert enc[enc.index("-s") + 1] == "96x64"
    assert enc[enc.index("-map") + 1] == "0:v"
    assert "-c:a" in enc and enc[enc.index("-c:a") + 1] == "copy"
    assert "-crf" in enc and enc[enc.index("-crf") + 1] == "18"
    assert enc[enc.index("-vf") + 1] == "hflip"
    assert enc[-1] == "out.mp4"
    assert "transform360" not in " ".join(enc)


def test_build_commands_respects_user_stream_routing():
    for extra in (["-an"], ["-map", "0:v"]):
        argv = ["-i", "in.mp4", "-vf", f"transform360={VF}", *extra, "o.mp4"]
        inputs, out_opts, out_path, g = wrap.tokenize(argv)
        found = wrap.find_transform360(out_opts)
        _, enc = wrap.build_commands(
            inputs, out_opts, out_path, g, found, (128, 64, 30.0), (96, 64)
        )
        # no auto audio mapping when the user routes streams
        assert enc.count("-i") == 1
        assert "-c:a" not in enc


def test_probe_decoded_parses_ffmpeg_output(monkeypatch):
    stderr = (
        "Input #0, mov, from 'in.mp4':\n"
        "    Stream #0:0: Video: h264, yuv420p, 3840x2160, 30 fps\n"
        "Output #0, null, to 'pipe:':\n"
        "    Stream #0:0: Video: wrapped_avframe, yuv444p(tv, "
        "progressive), 1920x960 [SAR 1:1], q=2-31, 29.97 fps, 29.97 tbn\n"
    )
    monkeypatch.setattr(
        wrap.subprocess, "run",
        lambda *a, **k: subprocess.CompletedProcess(a, 0, "", stderr),
    )
    w, h, fps, fmt = wrap.probe_decoded([], "in.mp4", ["scale=1920:960"])
    assert (w, h) == (1920, 960)
    assert fps == pytest.approx(29.97)
    assert fmt == "yuv444p"


def test_pipe_format_registry_and_fallback(capsys):
    # registry formats pass through; yuvj names map to the byte-identical
    # yuv twin; packed formats fall back to yuv420p, loudly
    assert wrap.pipe_format("yuv444p") == "yuv444p"
    assert wrap.pipe_format("yuvj422p") == "yuv422p"
    assert wrap.pipe_format("gbrp") == "gbrp"
    assert wrap.pipe_format("yuv420p10le") == "yuv420p10le"
    assert capsys.readouterr().err == ""
    assert wrap.pipe_format("rgb24") == "yuv420p"
    assert "warning" in capsys.readouterr().err


def test_pipe_format_lossless_deep_twins(capsys):
    """Semi-planar / big-endian / 9-14-bit formats pipe as their
    information-preserving planar LE twin, not down to 8-bit."""
    cases = {
        "nv12": "yuv420p",            # 8-bit semi-planar: lossless
        "p010le": "yuv420p10le",      # hardware-decoder 10-bit staple
        "p016le": "yuv420p16le",
        "yuv420p10be": "yuv420p10le",  # byte-order swap
        "yuv444p12be": "yuv444p12le",
        "yuv420p9le": "yuv420p10le",   # left-shift promotions
        "yuv422p14le": "yuv422p16le",
        "yuv420p14be": "yuv420p16le",  # be -> le -> promote
        "gray16be": "gray16le",
    }
    for src, want in cases.items():
        assert wrap.pipe_format(src) == want, src
    err = capsys.readouterr().err
    assert "warning" not in err and "information-preserving" in err


def test_extract_t360_opts(monkeypatch):
    monkeypatch.setenv("T360_BATCH", "4")
    b, p, s, rest = wrap._extract_t360_opts(
        ["--t360-prefetch", "2", "-i", "x", "--t360-stats", "y.mp4"]
    )
    assert (b, p, s) == (4, 2, True)
    assert rest == ["-i", "x", "y.mp4"]


def test_filter_complex_linear_rewrite():
    """A linear single-stream -filter_complex graph is rewritten into the
    -vf form: labels stripped, the output-label -map absorbed, source
    audio maps renumbered to the encode command's input 1."""
    opts, needs = wrap.rewrite_filter_complex(
        [("-filter_complex",
          "[0:v]scale=320:160,transform360=cube_edge_length=64,hflip[v]"),
         ("-map", "[v]"), ("-c:v", "libx264")]
    )
    assert opts == [
        ("-vf", "scale=320:160,transform360=cube_edge_length=64,hflip"),
        ("-c:v", "libx264"),
    ]
    assert needs is False
    found = wrap.find_transform360(opts)
    assert found[1] == ["scale=320:160"] and found[3] == ["hflip"]

    # with explicit source-audio routing
    opts, needs = wrap.rewrite_filter_complex(
        [("-filter_complex", "transform360=w=64"), ("-map", "0:a")]
    )
    assert opts == [("-vf", "transform360=w=64"), ("-map", "1:a")]
    assert needs is True

    # no transform360 in the graph: untouched
    orig = [("-filter_complex", "[0:v]scale=2:2[v]"), ("-map", "[v]")]
    assert wrap.rewrite_filter_complex(list(orig)) == (orig, False)


def test_filter_complex_unsupported_shapes_error():
    for graph, maps in [
        ("[0:v]split[a][b];[a]transform360=w=64[v]", [("-map", "[v]")]),
        ("[0:v][1:v]overlay,transform360=w=64[v]", [("-map", "[v]")]),
        ("[1:v]transform360=w=64[v]", [("-map", "[v]")]),
        ("[0:v]transform360=w=64[v]", [("-map", "[v]"), ("-map", "0:v")]),
    ]:
        with pytest.raises(wrap.UsageError):
            wrap.rewrite_filter_complex(
                [("-filter_complex", graph), *maps]
            )
    with pytest.raises(wrap.UsageError):
        wrap.find_transform360(
            [("-filter_complex", "[0:v]transform360=w=64[out]")]
        )


def test_complex_split_upstream_chain():
    """A producer chain before transform360 runs in the decode command;
    the transform output label is re-created on the pipe for the maps."""
    cs = wrap.split_complex_graph(
        [("-filter_complex",
          "[0:v]scale=1920:960[s];[s]transform360=w=64[v]"),
         ("-map", "[v]"), ("-map", "0:a"), ("-c:a", "aac")]
    )
    assert cs.dec_fc == "[0:v]scale=1920:960[s]"
    assert cs.dec_map == "[s]"
    assert cs.enc_fc == "[0:v]null[v]"
    assert cs.t360_opts == "w=64"
    assert cs.needs_src_inputs is True  # the renumbered audio map
    assert cs.out_opts == [
        ("-map", "[v]"), ("-map", "1:a"), ("-c:a", "aac")
    ]


def test_complex_split_downstream_overlay_renumbers_inputs():
    """A second input consumed after the transform shifts one slot up on
    the encode side (the raw pipe takes input 0)."""
    cs = wrap.split_complex_graph(
        [("-filter_complex",
          "[0:v]transform360=w=64[t];[t][1:v]overlay=10:10[v]"),
         ("-map", "[v]")]
    )
    assert cs.dec_fc is None and cs.dec_map == "0:v"
    assert cs.enc_fc == "[0:v]null[t];[t][2:v]overlay=10:10[v]"
    assert cs.needs_src_inputs is True
    assert cs.out_opts == [("-map", "[v]")]

    inputs = [([], "in.mp4"), ([], "logo.png")]
    dec, enc = wrap.build_commands_complex(
        inputs, cs, "out.mp4", ["-y"], (128, 64, 30.0), (96, 64)
    )
    assert dec[dec.index("-map") + 1] == "0:v"
    # encode: pipe + both source files, in order
    i_args = [enc[i + 1] for i, a in enumerate(enc) if a == "-i"]
    assert i_args == ["-", "in.mp4", "logo.png"]
    assert enc[enc.index("-filter_complex") + 1] == cs.enc_fc


def test_complex_split_pre_post_and_audio_chain():
    """Filters inside the transform chain split around it; an audio chain
    is downstream work with its source stream renumbered."""
    cs = wrap.split_complex_graph(
        [("-filter_complex",
          "[1:v]hflip[x];[x]scale=100:50,transform360=w=64,hflip[t];"
          "[t]drawtext=text=hi[v];[0:a]volume=2[a]"),
         ("-map", "[v]"), ("-map", "[a]")]
    )
    assert cs.dec_fc == "[1:v]hflip[x];[x]scale=100:50[__t360in]"
    assert cs.dec_map == "[__t360in]"
    assert cs.enc_fc == (
        "[0:v]hflip[t];[t]drawtext=text=hi[v];[1:a]volume=2[a]"
    )
    assert cs.needs_src_inputs is True
    assert cs.out_opts == [("-map", "[v]"), ("-map", "[a]")]


def test_complex_split_unlabeled_tail_gets_default_mapping():
    """No output label and no downstream chains: the encode side is just
    the pipe, with the default audio carry."""
    cs = wrap.split_complex_graph(
        [("-filter_complex", "[0:v]scale=128:64[s];[s]transform360=w=64")]
    )
    assert cs.enc_fc is None and cs.needs_src_inputs is False
    dec, enc = wrap.build_commands_complex(
        [([], "in.mp4")], cs, "out.mp4", [], (128, 64, 30.0), (96, 64)
    )
    assert enc[enc.index("-map") + 1] == "0:v"
    assert "1:a?" in enc and "copy" in enc


def test_complex_split_unlabeled_tail_with_user_maps_keeps_video():
    """Transform chain ending with NO output label while other chains
    carry user maps: real ffmpeg implicitly maps the unlabeled filter
    output, so the encode command must map the pipe video explicitly —
    ahead of the user maps — instead of silently dropping it."""
    cs = wrap.split_complex_graph(
        [("-filter_complex",
          "[0:v]transform360=w=64;[0:a]volume=2[a]"),
         ("-map", "[a]")]
    )
    assert cs.pipe_consumed is False
    assert cs.enc_fc == "[1:a]volume=2[a]"
    dec, enc = wrap.build_commands_complex(
        [([], "in.mp4")], cs, "out.mp4", ["-y"], (128, 64, 30.0), (96, 64)
    )
    maps = [enc[i + 1] for i, a in enumerate(enc) if a == "-map"]
    assert maps == ["0:v", "[a]"]


def test_complex_split_bare_index_input_maps_video_only():
    """A bare file-index label ([1]) must pipe only that input's VIDEO
    stream — '-map 1' would interleave audio bytes into the raw pipe."""
    cs = wrap.split_complex_graph(
        [("-filter_complex",
          "[1]transform360=w=64[t];[t][0:v]overlay[v]"),
         ("-map", "[v]")]
    )
    assert cs.dec_map == "1:v"


def test_complex_split_rejects_map_of_internal_pipe_label():
    """[__t360in] exists only in the decode command; a user map of it
    must hit the wrapper's decode-side-label error, not a confusing
    failure inside ffmpeg."""
    with pytest.raises(wrap.UsageError):
        wrap.split_complex_graph(
            [("-filter_complex",
              "[0:v]hflip,transform360=w=64[v];[0:a]volume=2[a]"),
             ("-map", "[v]"), ("-map", "[__t360in]")]
        )


def test_complex_split_tees_source_fed_split_crossing():
    """A crossing label from a source-fed split chain is tee'd: decode
    keeps the transform branch, encode re-creates the crossing branch
    from the renumbered source input (the reference runs in-process and
    handles any graph, vf_transform360.c:1013-1023)."""
    cs = wrap.split_complex_graph(
        [("-filter_complex",
          "[0:v]split[a][b];[a]transform360=w=64[t];[t][b]overlay[v]"),
         ("-map", "[v]")]
    )
    assert cs.dec_fc == "[0:v]null[a]" and cs.dec_map == "[a]"
    assert cs.enc_fc == "[0:v]null[t];[t][b]overlay[v];[1:v]null[b]"
    assert cs.needs_src_inputs is True

    # pre-split filters are duplicated onto both sides
    cs = wrap.split_complex_graph(
        [("-filter_complex",
          "[0:v]hflip,split[a][b];[a]transform360=w=64[t];"
          "[t][b]overlay[v]"),
         ("-map", "[v]")]
    )
    assert cs.dec_fc == "[0:v]hflip[a]"
    assert "[1:v]hflip[b]" in cs.enc_fc

    # a 3-way split with two crossing branches keeps a split on the
    # encode side
    cs = wrap.split_complex_graph(
        [("-filter_complex",
          "[0:v]split=3[a][b][c];[a]transform360=w=64[t];"
          "[t][b]overlay[x];[x][c]overlay[v]"),
         ("-map", "[v]")]
    )
    assert cs.dec_fc == "[0:v]null[a]"
    assert "[1:v]split=2[b][c]" in cs.enc_fc


def test_complex_split_rejects_second_crossing_link():
    """A crossing link NOT re-creatable from a source (its producing
    chain does not end in a source-fed split) cannot be piped through
    one raw stream."""
    for graph, maps in [
        # [b] produced by a non-split chain, consumed downstream
        ("[0:v]hflip[a][b];[a]transform360=w=64[t];[t][b]overlay[v]",
         [("-map", "[v]")]),
        # split chain fed by an internal label, not a source
        ("[0:v]scale=64:32[s];[s]split[a][b];[a]transform360=w=64[t];"
         "[t][b]overlay[v]", [("-map", "[v]")]),
        # upstream chain output never consumed before the transform
        ("[0:v]split[a][b];[a]transform360=w=64[v]", [("-map", "[v]")]),
        # map of a decode-side label
        ("[0:v]hflip[x];[x]transform360=w=64[v]",
         [("-map", "[v]"), ("-map", "[x]")]),
        # two transforms
        ("[0:v]transform360=w=64[a];[a]transform360=w=64[v]",
         [("-map", "[v]")]),
        # cycle through the transform chain
        ("[t]hflip[x];[x]transform360=w=64[t]", [("-map", "[t]")]),
        # no input label in a multi-chain graph
        ("transform360=w=64[t];[t][1:v]overlay[v]", [("-map", "[v]")]),
    ]:
        with pytest.raises(wrap.UsageError):
            wrap.split_complex_graph([("-filter_complex", graph), *maps])
    # no transform360 or no ';': not this splitter's business
    assert wrap.split_complex_graph(
        [("-filter_complex", "[0:v]scale=2:2[a];[a]hflip[v]")]
    ) is None
    assert wrap.split_complex_graph(
        [("-filter_complex", "[0:v]transform360=w=64[v]")]
    ) is None


def test_filter_complex_build_commands_with_audio_map():
    argv = ["-y", "-i", "in.mp4",
            "-filter_complex", f"[0:v]transform360={VF}[v]",
            "-map", "[v]", "-map", "0:a", "-c:a", "aac", "out.mp4"]
    inputs, out_opts, out_path, g = wrap.tokenize(argv)
    out_opts, needs = wrap.rewrite_filter_complex(out_opts)
    assert needs is True
    found = wrap.find_transform360(out_opts)
    _, enc = wrap.build_commands(
        inputs, out_opts, out_path, g, found, (128, 64, 30.0), (96, 64),
        needs_src_input=True,
    )
    # two inputs: the raw pipe (0) and the source (1); video mapped from
    # the pipe, audio from the source with the user's codec
    assert enc.count("-i") == 2
    i0 = enc.index("-map")
    assert enc[i0 + 1] == "0:v"
    assert "1:a" in enc
    assert enc[enc.index("-c:a") + 1] == "aac"


def test_passthrough_without_transform360(monkeypatch):
    calls = []
    monkeypatch.setattr(
        wrap.subprocess, "call", lambda cmd: calls.append(cmd) or 0
    )
    argv = ["-i", "a.mp4", "-vf", "scale=64:32", "out.mp4"]
    assert wrap.main(argv) == 0
    assert calls == [["ffmpeg", *argv]]


# ------------------------------------------------------------ end to end

class _FakeProc:
    def __init__(self, stdout=None, stdin=None):
        self.stdout, self.stdin = stdout, stdin

    def wait(self):
        return 0


class _Sink(io.BytesIO):
    def close(self):  # keep the payload readable after the wrapper closes
        pass


@pytest.mark.parametrize("pix_fmt", ["yuv420p", "yuv444p"])
def test_wrapper_end_to_end_fake_pipes(pix_fmt, rng, monkeypatch, capsys):
    """Full wrapper run against in-memory decode/encode pipes: the encoded
    byte stream must equal the direct-API transform of the same frames.
    An unchanged yuv444p command line round-trips with no chroma loss
    (the pipes carry the probed format, not a hardcoded yuv420p)."""
    from transform360_tpu import open_filter
    from transform360_tpu.config import chroma_dims
    from transform360_tpu.utils import video

    w, h, n = 128, 64, 5
    cw, ch = chroma_dims(w, h, pix_fmt)
    y = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
    u = rng.integers(0, 256, (n, ch, cw), dtype=np.uint8)
    v = rng.integers(0, 256, (n, ch, cw), dtype=np.uint8)
    raw = b"".join(
        p.tobytes() for k in range(n) for p in (y[k], u[k], v[k])
    )

    sink = _Sink()
    spawned = []

    def fake_popen(cmd, stdout=None, stdin=None):
        spawned.append(cmd)
        if stdout is not None:  # the decode side
            return _FakeProc(stdout=io.BytesIO(raw))
        return _FakeProc(stdin=sink)

    monkeypatch.setattr(wrap.subprocess, "Popen", fake_popen)
    monkeypatch.setattr(video, "have_ffmpeg", lambda: True)
    monkeypatch.setattr(
        video, "_probe_ffmpeg", lambda path: (w, h, 30.0, pix_fmt)
    )

    rc = wrap.main(
        ["--t360-batch", "2", "--t360-stats", "-y", "-i", "in.mp4",
         "-vf", f"transform360={VF}", "out.mp4"]
    )
    assert rc == 0
    assert len(spawned) == 2
    for cmd in spawned:  # both raw pipes carry the probed format
        assert cmd[cmd.index("-pix_fmt") + 1] == pix_fmt

    ey, eu, ev = open_filter(VF, w, h, pix_fmt=pix_fmt).transform(y, u, v)
    want = b"".join(
        np.asarray(p).tobytes()
        for k in range(n)
        for p in (ey[k], eu[k], ev[k])
    )
    assert sink.getvalue() == want
    assert '"frames": 5' in capsys.readouterr().err


def test_wrapper_end_to_end_multi_output_fake_pipes(rng, monkeypatch):
    """Multi-output command: the transform output goes through the
    pipeline; the second output spawns its own passthrough ffmpeg
    process against the source with exactly its own options."""
    from transform360_tpu import open_filter
    from transform360_tpu.config import chroma_dims
    from transform360_tpu.utils import video

    w, h, n = 128, 64, 3
    cw, ch = chroma_dims(w, h)
    y = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
    u = rng.integers(0, 256, (n, ch, cw), dtype=np.uint8)
    v = rng.integers(0, 256, (n, ch, cw), dtype=np.uint8)
    raw = b"".join(
        p.tobytes() for k in range(n) for p in (y[k], u[k], v[k])
    )

    sink = _Sink()
    spawned = []

    def fake_popen(cmd, stdout=None, stdin=None):
        spawned.append((cmd, stdout is not None, stdin is not None))
        if stdout is not None:
            return _FakeProc(stdout=io.BytesIO(raw))
        return _FakeProc(stdin=sink if stdin is not None else None)

    monkeypatch.setattr(wrap.subprocess, "Popen", fake_popen)
    monkeypatch.setattr(video, "have_ffmpeg", lambda: True)
    monkeypatch.setattr(
        video, "_probe_ffmpeg", lambda path: (w, h, 30.0, "yuv420p")
    )

    rc = wrap.main(
        ["-y", "-i", "in.mp4", "-vf", f"transform360={VF}", "t.mp4",
         "-c:v", "libx265", "-an", "copy.mp4"]
    )
    assert rc == 0
    assert len(spawned) == 3
    extras = [c for c, has_out, has_in in spawned
              if not has_out and not has_in]
    assert extras == [["ffmpeg", "-v", "error", "-nostdin", "-y",
                       "-i", "in.mp4", "-c:v", "libx265", "-an",
                       "copy.mp4"]]
    ey, eu, ev = open_filter(VF, w, h).transform(y, u, v)
    want = b"".join(
        np.asarray(p).tobytes()
        for k in range(n)
        for p in (ey[k], eu[k], ev[k])
    )
    assert sink.getvalue() == want


def test_wrapper_end_to_end_multichain_fake_pipes(rng, monkeypatch):
    """Full wrapper run through the MULTI-chain -filter_complex path: the
    transform stream is cut out of the graph, piped through the real TPU
    pipeline, and the downstream overlay chain lands in the encode
    command with its source labels renumbered for the pipe at input 0."""
    from transform360_tpu import open_filter
    from transform360_tpu.config import chroma_dims
    from transform360_tpu.utils import video

    w, h, n = 128, 64, 4
    cw, ch = chroma_dims(w, h)
    y = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
    u = rng.integers(0, 256, (n, ch, cw), dtype=np.uint8)
    v = rng.integers(0, 256, (n, ch, cw), dtype=np.uint8)
    raw = b"".join(
        p.tobytes() for k in range(n) for p in (y[k], u[k], v[k])
    )

    sink = _Sink()
    spawned = []

    def fake_popen(cmd, stdout=None, stdin=None):
        spawned.append(cmd)
        if stdout is not None:
            return _FakeProc(stdout=io.BytesIO(raw))
        return _FakeProc(stdin=sink)

    monkeypatch.setattr(wrap.subprocess, "Popen", fake_popen)
    monkeypatch.setattr(video, "have_ffmpeg", lambda: True)
    monkeypatch.setattr(
        video, "_probe_ffmpeg", lambda path: (w, h, 30.0, "yuv420p")
    )

    rc = wrap.main(
        ["-y", "-i", "in.mp4", "-i", "logo.png",
         "-filter_complex",
         f"[0:v]transform360={VF}[t];[t][1:v]overlay=0:0[v]",
         "-map", "[v]", "-c:v", "libx264", "out.mp4"]
    )
    assert rc == 0
    assert len(spawned) == 2
    dec, enc = spawned
    assert dec[dec.index("-map") + 1] == "0:v"
    # encode side: pipe + both sources, graph renumbered for the pipe
    i_args = [enc[i + 1] for i, a in enumerate(enc) if a == "-i"]
    assert i_args == ["-", "in.mp4", "logo.png"]
    assert enc[enc.index("-filter_complex") + 1] == (
        f"[0:v]null[t];[t][2:v]overlay=0:0[v]"
    )
    assert enc[enc.index("-map", enc.index("-filter_complex")) + 1] == "[v]"

    # the piped payload is exactly the direct-API transform
    ey, eu, ev = open_filter(VF, w, h).transform(y, u, v)
    want = b"".join(
        np.asarray(p).tobytes()
        for k in range(n)
        for p in (ey[k], eu[k], ev[k])
    )
    assert sink.getvalue() == want
