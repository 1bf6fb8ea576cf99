#!/bin/bash
# Box-surface-prior robustness grid (round-5 VERDICT item 3): the h4
# recovering recipe (docs/STATUS.md h-ledger) re-run under injected sensor /
# label imperfections, mapping the prior's operating envelope.
#
#   SCENE=/path/to/textured_1obj_scene h2h/robustness_grid.sh n2 n5 n20 ...
#
# Rows (h2h/perturb_scene.py builds the perturbed scene copies):
#   n2 / n5 / n20   LIDAR noise sigma 2 / 5 / 20 cm + 1% outlier returns
#   ext110 / ext90  box half-extents scaled +/-10% (label error), clean depth
#   m10 / m25 / m40 margin sweep on the sigma=5cm+outliers scene
#                   (default box_surface_margin is 0.2)
#   cam             camera-only (all depth dropped): the documented
#                   photometric-fallback regime — expected to DRIFT
#   occ             object LIDAR-occluded in timesteps 4-5 (returns on the
#                   object dropped; camera + background LIDAR untouched).
#                   Poses are per-timestep params: occluded frames have no
#                   anchor of their own (pose_eval's per_timestep_mse shows
#                   the split)
#   occtv           occ + Config.tv_loss_mult=1: temporal pose smoothness
#                   coupling occluded timesteps to anchored neighbors —
#                   measured NEGATIVE for moving objects (TV on absolute
#                   per-timestep poses fights true motion; 8x worse than
#                   init — docs/STATUS.md). Kept as the documented negative;
#                   occ itself needs no mitigation.
#
# Run ONE row at a time on the TPU (CLAUDE.md trap #6). Rows sharing the
# default margin share one XLA compile (scene data never bakes into HLO).
set -euo pipefail
cd "$(dirname "$0")/.."

SCENE=${SCENE:?set SCENE=path/to/textured_1obj_scene}
OUT=${OUT:-/tmp/robust_grid}
mkdir -p "$OUT"

# h4: plain pose LR, surface prior 10, alpha 6->10 over the first 80%.
H4='Config.max_steps=10000 Config.eps_max_steps=10000 Config.save_every=10000 Config.alpha_init=6. Config.alpha_final=10. Config.alpha_delay_steps=0 Config.alpha_max_steps=8000 MipNerfModel.no_yaw_opt=True Config.pose_lr_mult=1. Config.pose_lr_delay_steps=0 Config.pose_lr_ramp_steps=0 Config.pose_lr_decay_steps=0 Config.box_surface_loss_mult=10.'

declare -A PERTURB MARGIN
PERTURB[n2]='--noise_sigma 0.02 --outlier_frac 0.01'
PERTURB[n5]='--noise_sigma 0.05 --outlier_frac 0.01'
PERTURB[n20]='--noise_sigma 0.20 --outlier_frac 0.01'
PERTURB[ext110]='--ext_scale 1.1'
PERTURB[ext90]='--ext_scale 0.9'
PERTURB[m10]='--noise_sigma 0.05 --outlier_frac 0.01'
PERTURB[m25]='--noise_sigma 0.05 --outlier_frac 0.01'
PERTURB[m40]='--noise_sigma 0.05 --outlier_frac 0.01'
PERTURB[cam]='--drop_depth'
PERTURB[occ]='--occlude_ts 4,5'
PERTURB[occtv]='--occlude_ts 4,5'
MARGIN[m10]='Config.box_surface_margin=0.1'
MARGIN[m25]='Config.box_surface_margin=0.25'
MARGIN[m40]='Config.box_surface_margin=0.4'
MARGIN[occtv]='Config.tv_loss_mult=1.'

COMMON=(--gin_file configs/carla_dyn.gin
  --gin_param "Config.batch_size = 512"
  --gin_param "Config.factor = 4"
  --gin_param "Config.random_box = True"
  --gin_param "Config.box_noise = 0.5"
  --gin_param "Config.print_every = 2000"
  --gin_param "MipNerfModel.num_objects = 1"
  --gin_param "MipNerfModel.no_pose_opt = False"
  --gin_param 'MipNerfModel.compute_dtype = "bfloat16"'
  --gin_param "MipNerfModel.use_pallas_mlp = True"
  --gin_param "MipNerfModel.recurrent_encode = True")

for name in "$@"; do
  pscene="$OUT/scene_$name"
  python h2h/perturb_scene.py --src "$SCENE" --out "$pscene" ${PERTURB[$name]:?unknown row $name}
  params=($H4 ${MARGIN[$name]:-})
  args=()
  for kv in "${params[@]}"; do
    args+=(--gin_param "${kv/=/ = }")
  done
  echo "=== RUN $name"
  rm -rf "$OUT/$name"
  python -m durf_tpu.train --data_dir "$pscene" "${COMMON[@]}" \
    --train_dir "$OUT/$name" "${args[@]}"
  # pose_eval vs the UNPERTURBED GT boxes: ext errors change the prior's
  # input, not the ground truth the recovery is judged against. The recipe
  # args ride along so the same noised init is reconstructed.
  python -m durf_tpu.pose_eval --data_dir "$SCENE" --train_dir "$OUT/$name" \
    --gin_file configs/carla_dyn.gin --gin_param "Config.random_box = True" \
    --gin_param "MipNerfModel.num_objects = 1" "${args[@]}"
done
