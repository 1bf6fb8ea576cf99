#!/bin/bash
# Test-split metrics (PSNR/SSIM/depth-MSE) from the latest checkpoint.
set -euo pipefail
: "${DATA_DIR:?set DATA_DIR}" "${TRAIN_DIR:?set TRAIN_DIR}" "${GIN_FILE:=configs/waymo.gin}"

python -m durf_tpu.eval \
  --data_dir="$DATA_DIR" \
  --train_dir="$TRAIN_DIR" \
  --gin_file="$GIN_FILE" \
  --out_dir="$TRAIN_DIR/eval" "$@"
