#!/bin/bash
# One-command real-data path: Waymo tfrecord -> scene dir -> train -> eval.
#
#   TFRECORD=segment-xxx.tfrecord SCENE_DIR=~/data/waymo/seg1 \
#     scripts/waymo_pipeline.sh [extra train flags]
#
# Requires waymo-open-dataset + tensorflow ONLY for the convert step (run it
# wherever those are installed; train/eval need just this repo). Pass
# SKY_MASKS=masks.npz to supply an off-the-shelf segmenter's sky masks
# (reference contract) instead of the LIDAR-horizon heuristic, and
# FACTORS="16 12 8 4" to emit the full c2f pyramid (then add
# "Config.use_c2f = True" to the train overrides).
set -euo pipefail

TFRECORD=${TFRECORD:?set TFRECORD=path/to/segment.tfrecord}
SCENE_DIR=${SCENE_DIR:?set SCENE_DIR=where/to/write/the/scene}
TRAIN_DIR=${TRAIN_DIR:-$SCENE_DIR/train}
EVAL_DIR=${EVAL_DIR:-$SCENE_DIR/eval}
FACTORS=${FACTORS:-4}
TIMESTEPS=${TIMESTEPS:-5}

if [ ! -f "$SCENE_DIR/poses_bounds.npy" ]; then
  # shellcheck disable=SC2086
  python -m durf_tpu.tools.waymo_convert \
    --tfrecord "$TFRECORD" --out_dir "$SCENE_DIR" \
    --timesteps "$TIMESTEPS" --factors $FACTORS \
    ${SKY_MASKS:+--sky_masks "$SKY_MASKS"}
fi

python -m durf_tpu.train \
  --data_dir="$SCENE_DIR" --train_dir="$TRAIN_DIR" \
  --gin_file=configs/waymo.gin "$@"

python -m durf_tpu.eval \
  --data_dir="$SCENE_DIR" --train_dir="$TRAIN_DIR" --out_dir="$EVAL_DIR" \
  --gin_file=configs/waymo.gin

python -m durf_tpu.pose_eval \
  --data_dir="$SCENE_DIR" --train_dir="$TRAIN_DIR" \
  --gin_file=configs/waymo.gin
