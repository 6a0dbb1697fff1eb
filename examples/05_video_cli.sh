#!/bin/sh
# CLI recipes — the `ffmpeg -vf transform360="..."` replacement.
# Each line is standalone; all accept the reference's option string verbatim.
set -e

# Video containers (decode/encode on host CPU, transform on device).
# --prefetch overlaps decode with device compute.
python -m transform360_tpu.cli \
  --vf "cube_edge_length=512:interpolation_alg=cubic:enable_low_pass_filter=1" \
  -i in.mp4 -o out.mp4 --batch 8 --prefetch 1 --stats

# Raw planar streams of any planar pix_fmt (yuv420p/422p/444p/411p/410p/gray).
python -m transform360_tpu.cli --vf "w=1024:h=512" \
  --input-size 3840x2160 --pix-fmt yuv422p -i in.yuv -o out.yuv

# Pipe through stdin/stdout with '-' paths (e.g. inside an ffmpeg pipeline):
#   ffmpeg -i in.mp4 -f rawvideo -pix_fmt yuv420p - \
#     | python -m transform360_tpu.cli --vf "cube_edge_length=512" \
#         --input-size 3840x2160 -i - -o - \
#     | ffmpeg -f rawvideo -pix_fmt yuv420p -s 1536x1024 -i - out.mp4
python -m transform360_tpu.cli --vf "cube_edge_length=256" \
  --input-size 1024x512 -i - -o - < in.yuv > out.yuv

# Stereo + expression-sized output, plan reuse across runs:
python -m transform360_tpu.cli \
  --vf "input_stereo_format=TB:output_stereo_format=TB:w=out_h*2:h=1024" \
  --input-size 2048x2048 -i - -o out.yuv --save-plan plan.npz < in.yuv
python -m transform360_tpu.cli --vf "input_stereo_format=TB:output_stereo_format=TB:w=out_h*2:h=1024" \
  --input-size 2048x2048 -i - -o out2.yuv --load-plan plan.npz < in.yuv

# No TPU / no JAX? The dependency-free C++ engine runs the same CLI:
python -m transform360_tpu.cli --vf "cube_edge_length=512" \
  --input-size 3840x2160 -i in.yuv -o out.yuv --backend native

# Shard batches across N devices:
python -m transform360_tpu.cli --vf "cube_edge_length=512" \
  --input-size 3840x2160 -i in.yuv -o out.yuv --batch 16 --devices 8

# Single-frame LATENCY mode (live streams): band each frame's output
# rows over N devices (cost-balanced edges) instead of batching frames.
python -m transform360_tpu.cli --vf "cube_edge_length=512" \
  -i in.mp4 -o out.mp4 --latency-bands 8 --stats

# Or run an UNCHANGED reference ffmpeg command line — decode/encode and
# any surrounding filters stay in ffmpeg, transform360 runs on TPU,
# audio is mapped through (--t360-batch frames per device step):
python -m transform360_tpu.ffmpeg --t360-batch 16 -y -i in.mp4 \
  -vf "transform360=cube_edge_length=512:interpolation_alg=cubic" \
  -c:v libx264 out.mp4

# -filter_complex graphs split at the transform automatically: upstream
# chains run in the decode ffmpeg, downstream chains (overlays, audio
# filters, extra inputs) in the encode ffmpeg.
python -m transform360_tpu.ffmpeg -y -i in.mp4 -i logo.png \
  -filter_complex "[0:v]transform360=cube_edge_length=512[t];[t][1:v]overlay=W-w-10:10[v]" \
  -map "[v]" -map 0:a -c:v libx264 -c:a copy out.mp4
