"""Option-arity fixture for the drop-in ffmpeg wrapper's tokenizer.

The wrapper assumes unknown ``-option`` tokens consume one value and
special-cases flag-style (no-value) options in ``FLAG_OPTS``
(transform360_tpu/ffmpeg.py).  A misclassified option silently shifts
every later token of a user's real command line — the likeliest drop-in
breakage (the reference is driven from arbitrary ffmpeg command lines,
reference README.md:84-95).  This module vendors the arity of the
transcoding-relevant options from ffmpeg's OWN option table (fftools
``ffmpeg -h full`` / documentation sections "Main options" and
"Advanced options", ffmpeg 6.x) and checks the wrapper against it in
both directions — no ffmpeg binary needed.
"""

from transform360_tpu import ffmpeg as wrap

# ffmpeg boolean/flag options that take NO value (fftools option table:
# OPT_TYPE_BOOL, or func-arg options without HAS_ARG).  Transcoding
# subset; info-and-exit flags (-version, -formats, ...) never reach the
# wrapper mid-command and are omitted.
FFMPEG_FLAG_OPTIONS = [
    # main options
    "-y", "-n", "-stats", "-ignore_unknown", "-copy_unknown",
    "-recast_media", "-benchmark", "-benchmark_all", "-dump", "-hex",
    "-re", "-copyts", "-start_at_zero", "-shortest", "-xerror",
    "-stdin", "-hide_banner", "-report",
    # per-stream / expert options
    "-an", "-vn", "-sn", "-dn", "-accurate_seek", "-fix_sub_duration",
    "-autorotate", "-autoscale", "-copyinkf", "-bitexact", "-debug_ts",
    "-auto_conversion_filters", "-vstats", "-psnr", "-qphist",
]

# value-taking options, emphasizing lookalikes of the flags above (same
# prefix or same topic) that a sloppy flag list would misclassify.
FFMPEG_VALUE_OPTIONS = [
    # lookalikes of flag options
    "-apad",            # per-stream filter-args STRING (not a flag!)
    "-stats_period", "-vstats_file", "-vstats_version",
    "-copytb", "-abort_on", "-seek_timestamp", "-progress",
    "-stream_loop", "-dump_attachment", "-max_error_rate",
    "-fpsmax", "-readrate", "-isync",
    # the everyday value options
    "-i", "-f", "-t", "-to", "-ss", "-sseof", "-r", "-s", "-fs",
    "-c", "-c:v", "-c:a", "-codec", "-vcodec", "-acodec",
    "-b:v", "-b:a", "-crf", "-preset", "-tune", "-profile:v",
    "-map", "-map_metadata", "-map_chapters", "-metadata",
    "-pix_fmt", "-vf", "-af", "-filter:v", "-filter_complex",
    "-filter_complex_script", "-frames:v", "-vframes", "-aframes",
    "-qscale", "-q:v", "-threads", "-max_muxing_queue_size",
    "-fps_mode", "-vsync", "-async", "-ar", "-ac", "-sample_fmt",
    "-attach", "-target", "-pass", "-passlogfile",
    "-force_key_frames", "-hwaccel", "-hwaccel_device",
    "-init_hw_device", "-filter_hw_device", "-loglevel", "-v",
    "-max_alloc", "-fflags", "-avoid_negative_ts", "-muxdelay",
    "-muxpreload", "-timestamp", "-timelimit", "-dts_delta_threshold",
    "-top", "-aspect", "-disposition", "-program", "-shortest_buf_duration",
]


def test_every_vendored_flag_tokenizes_as_flag():
    missing = [o for o in FFMPEG_FLAG_OPTIONS if not wrap._is_flag_opt(o)]
    assert not missing, (
        f"flag options the tokenizer would treat as value-taking: {missing}"
    )


def test_negated_and_stream_specified_flags_tokenize_as_flags():
    # every ffmpeg boolean accepts -noX; per-stream booleans accept
    # a :stream specifier
    for o in ["-nostats", "-nostdin", "-noaccurate_seek", "-noautorotate",
              "-noautoscale", "-noauto_conversion_filters"]:
        assert wrap._is_flag_opt(o), o
    for o in ["-fix_sub_duration:s:0", "-autorotate:v", "-copyinkf:v:1"]:
        assert wrap._is_flag_opt(o), o


def test_no_value_option_is_classified_as_flag():
    wrong = [o for o in FFMPEG_VALUE_OPTIONS if wrap._is_flag_opt(o)]
    assert not wrong, (
        f"value-taking options the tokenizer would swallow as flags: {wrong}"
    )


def test_value_lookalike_tokenizes_with_its_value():
    """-apad burned this list once: a real command using it must keep its
    value attached instead of shifting the rest of the argv."""
    inputs, out_opts, out_path, g = wrap.tokenize(
        ["-y", "-i", "in.mp4", "-apad", "whole_dur=2", "-shortest",
         "out.mp4"]
    )
    assert out_opts == [("-apad", "whole_dur=2"), ("-shortest", None)]
    assert out_path == "out.mp4"
