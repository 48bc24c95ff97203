#!/bin/bash
# Feature-extraction driver — role-equivalent to the reference
# video-classification-3d-cnn-pytorch/run.sh: shard the video list across
# invocations and emit one <output>/<vid>.npy per video.
#
# Usage: ./scripts/run.sh <video_root> <output_dir> [start_idx] [end_idx]
# Env: MODEL=path/to/resnext-101-kinetics.pth (empty → random init, testing)
#      STRIDE (default 4), SAMPLE_DURATION (default 16)

video_root=${1:?usage: run.sh <video_root> <output_dir> [start] [end]}
output=${2:?}
start_idx=${3:-0}
end_idx=${4:--1}

python extract_features.py \
  --video_root "$video_root" \
  --output "$output" \
  --model "${MODEL:-}" \
  --mode feature \
  --spatio_temporal 1 \
  --sample_duration "${SAMPLE_DURATION:-16}" \
  --stride "${STRIDE:-4}" \
  --start_idx "$start_idx" \
  --end_idx "$end_idx"
