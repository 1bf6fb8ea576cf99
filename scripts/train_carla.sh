#!/bin/bash
# Train the dynamic scene-graph model on a CARLA scene.
set -euo pipefail

SCENE=${SCENE:-town03_dyn}
EXPERIMENT=${EXPERIMENT:-carla_durf_tpu}
TRAIN_DIR=${TRAIN_DIR:-$HOME/nerf_results/$EXPERIMENT/$SCENE}
DATA_DIR=${DATA_DIR:-$HOME/data/carla/$SCENE}

python -m durf_tpu.train \
  --data_dir="$DATA_DIR" \
  --train_dir="$TRAIN_DIR" \
  --gin_file=configs/carla_dyn.gin \
  --chunk=1024 "$@"
