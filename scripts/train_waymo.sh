#!/bin/bash
# Train the dynamic scene-graph model on a converted Waymo scene.
set -euo pipefail

SCENE=${SCENE:-seg1_5_center}
EXPERIMENT=${EXPERIMENT:-waymo_durf_tpu}
TRAIN_DIR=${TRAIN_DIR:-$HOME/nerf_results/$EXPERIMENT/$SCENE}
DATA_DIR=${DATA_DIR:-$HOME/data/waymo/$SCENE}

python -m durf_tpu.train \
  --data_dir="$DATA_DIR" \
  --train_dir="$TRAIN_DIR" \
  --gin_file=configs/waymo.gin \
  --chunk=1024 "$@"
