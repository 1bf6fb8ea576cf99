#!/bin/bash
# Joint pose-recovery recipe ledger (docs/STATUS.md round-3 table).
#
#   SCENE=/path/to/textured_scene h2h/pose_recipes.sh j_a e1 f1 ...
#
# Every recipe is a FULL joint run (field + poses from scratch) on the
# textured 1-object synthetic scene with box_noise 0.5 m (init pose-MSE
# 0.2305 m^2); h2h/pose_probe.py is the frozen-field isolation probe that
# bounds where recovery is possible (alpha=6 window: 0.23 -> 0.036).
# Generate the scene with (box faces carry a checker texture by default):
#   python -m durf_tpu.data.synthetic --out $SCENE --timesteps 5 \
#     --width 320 --height 240 --focal 280 --num_objects 1
# Run ONE recipe at a time on the TPU (CLAUDE.md trap #6).
set -euo pipefail
cd "$(dirname "$0")/.."

SCENE=${SCENE:?set SCENE=path/to/textured_1obj_scene}
OUT=${OUT:-/tmp/pose_recipes}
mkdir -p "$OUT"

COMMON=(--data_dir "$SCENE" --gin_file configs/carla_dyn.gin
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

declare -A RECIPES
# Field-warmup-then-pose family (j_*): all DRIFT (~2x init) — the object MLP
# entrenches the wrong pose during the warmup.
RECIPES[j_a]='Config.max_steps=10000 Config.eps_max_steps=10000 Config.save_every=10000 Config.alpha_init=6. Config.alpha_final=10. Config.alpha_delay_steps=6000 Config.alpha_max_steps=10000 MipNerfModel.no_yaw_opt=False Config.pose_lr_mult=4. Config.pose_lr_delay_steps=1500 Config.pose_lr_ramp_steps=1000 Config.pose_lr_decay_steps=4000'
RECIPES[j_b]='Config.max_steps=10000 Config.eps_max_steps=10000 Config.save_every=10000 Config.alpha_init=6. Config.alpha_final=10. Config.alpha_delay_steps=6000 Config.alpha_max_steps=10000 MipNerfModel.no_yaw_opt=False Config.pose_lr_mult=8. Config.pose_lr_delay_steps=1500 Config.pose_lr_ramp_steps=1000 Config.pose_lr_decay_steps=4000'
RECIPES[j_c]='Config.max_steps=10000 Config.eps_max_steps=10000 Config.save_every=10000 Config.alpha_init=6. Config.alpha_final=10. Config.alpha_delay_steps=8000 Config.alpha_max_steps=10000 MipNerfModel.no_yaw_opt=False Config.pose_lr_mult=6. Config.pose_lr_delay_steps=2500 Config.pose_lr_ramp_steps=1000 Config.pose_lr_decay_steps=4000'
RECIPES[j_d]='Config.max_steps=10000 Config.eps_max_steps=10000 Config.save_every=10000 Config.alpha_init=6. Config.alpha_final=10. Config.alpha_delay_steps=6000 Config.alpha_max_steps=10000 MipNerfModel.no_yaw_opt=False Config.pose_lr_mult=2. Config.pose_lr_delay_steps=1000 Config.pose_lr_ramp_steps=500 Config.pose_lr_decay_steps=6000'
# BARF-style family (e_*): pose LR on from step 0 inside a very coarse
# window, anneal + decay — also DRIFT on this scene.
RECIPES[e1]='Config.max_steps=10000 Config.eps_max_steps=10000 Config.save_every=10000 Config.alpha_init=1. Config.alpha_final=10. Config.alpha_delay_steps=2500 Config.alpha_max_steps=8000 MipNerfModel.no_yaw_opt=False Config.pose_lr_mult=2. Config.pose_lr_delay_steps=0 Config.pose_lr_ramp_steps=3000 Config.pose_lr_decay_steps=5000'
RECIPES[e2]='Config.max_steps=10000 Config.eps_max_steps=10000 Config.save_every=10000 Config.alpha_init=1. Config.alpha_final=10. Config.alpha_delay_steps=2500 Config.alpha_max_steps=8000 MipNerfModel.no_yaw_opt=True Config.pose_lr_mult=2. Config.pose_lr_delay_steps=0 Config.pose_lr_ramp_steps=3000 Config.pose_lr_decay_steps=5000'
RECIPES[e3]='Config.max_steps=10000 Config.eps_max_steps=10000 Config.save_every=10000 Config.alpha_init=1. Config.alpha_final=10. Config.alpha_delay_steps=4000 Config.alpha_max_steps=9000 MipNerfModel.no_yaw_opt=True Config.pose_lr_mult=4. Config.pose_lr_delay_steps=0 Config.pose_lr_ramp_steps=4000 Config.pose_lr_decay_steps=4000'
# NOTE: the round-3 e1/e2/e3 ledger rows ran BEFORE the pose-LR ramp fix
# (train.py make_optimizer): with delay=0 the ramp was silently skipped, so
# those recorded drifts used FULL pose LR from step 1. Re-runs under the
# fixed gate genuinely ramp (see tests/test_train.py ramp test).
# Probe-in-one-run family (f_*): pose frozen 8.5k steps, then the pose LR
# ramps to ~1e-3 (mult 100 x the late, tiny field LR) against the
# quasi-static field inside a pinned alpha window, cosine-frozen — the
# isolation probe's working regime expressed as one continuous schedule.
RECIPES[f1]='Config.max_steps=11000 Config.eps_max_steps=11000 Config.save_every=11000 Config.alpha_init=6. Config.alpha_final=6. Config.alpha_max_steps=1 MipNerfModel.no_yaw_opt=True Config.pose_lr_mult=100. Config.pose_lr_delay_steps=8500 Config.pose_lr_ramp_steps=500 Config.pose_lr_decay_steps=1500'
RECIPES[f2]='Config.max_steps=11000 Config.eps_max_steps=11000 Config.save_every=11000 Config.alpha_init=6. Config.alpha_final=6. Config.alpha_max_steps=1 MipNerfModel.no_yaw_opt=False Config.pose_lr_mult=100. Config.pose_lr_delay_steps=8500 Config.pose_lr_ramp_steps=500 Config.pose_lr_decay_steps=1500'
RECIPES[f3]='Config.max_steps=11000 Config.eps_max_steps=11000 Config.save_every=11000 Config.alpha_init=10. Config.alpha_final=10. Config.alpha_max_steps=1 MipNerfModel.no_yaw_opt=True Config.pose_lr_mult=100. Config.pose_lr_delay_steps=8500 Config.pose_lr_ramp_steps=500 Config.pose_lr_decay_steps=1500'
# f4: f1 + object-region gradient boost (box_loss_mult up-weights rgb+depth
# inside the projected box on dynamic rays — VERDICT item-2's untried lever).
RECIPES[f4]='Config.max_steps=11000 Config.eps_max_steps=11000 Config.save_every=11000 Config.alpha_init=6. Config.alpha_final=6. Config.alpha_max_steps=1 MipNerfModel.no_yaw_opt=True Config.pose_lr_mult=100. Config.pose_lr_delay_steps=8500 Config.pose_lr_ramp_steps=500 Config.pose_lr_decay_steps=1500 Config.box_loss_mult=5.'
# f5: f1 + post-recovery sharpen — hold alpha 6 through the pose window,
# then anneal to 10 with the pose already cosine-frozen, so the field
# re-fits fine detail at the corrected pose.
RECIPES[f5]='Config.max_steps=13000 Config.eps_max_steps=13000 Config.save_every=13000 Config.alpha_init=6. Config.alpha_final=10. Config.alpha_delay_steps=11000 Config.alpha_max_steps=13000 MipNerfModel.no_yaw_opt=True Config.pose_lr_mult=100. Config.pose_lr_delay_steps=8500 Config.pose_lr_ramp_steps=500 Config.pose_lr_decay_steps=1500'
# f6: f1 + pose_freeze_field — the isolation probe's EXACT regime (pose vs a
# hard-frozen field, not merely a tiny late field LR) as one continuous run.
# The probe recovered 0.23 -> 0.036 under this; the mult-only recipes leave
# the object MLP free to re-absorb the pose error.
RECIPES[f6]='Config.max_steps=11000 Config.eps_max_steps=11000 Config.save_every=11000 Config.alpha_init=6. Config.alpha_final=6. Config.alpha_max_steps=1 MipNerfModel.no_yaw_opt=True Config.pose_lr_mult=100. Config.pose_lr_delay_steps=8500 Config.pose_lr_ramp_steps=500 Config.pose_lr_decay_steps=1500 Config.pose_freeze_field=True'
# f7: f6 + post-window sharpen — field resumes after the pose freeze (2k
# extra steps, alpha annealed 6->10) to re-fit detail at the corrected pose.
RECIPES[f7]='Config.max_steps=13000 Config.eps_max_steps=13000 Config.save_every=13000 Config.alpha_init=6. Config.alpha_final=10. Config.alpha_delay_steps=11000 Config.alpha_max_steps=13000 MipNerfModel.no_yaw_opt=True Config.pose_lr_mult=100. Config.pose_lr_delay_steps=8500 Config.pose_lr_ramp_steps=500 Config.pose_lr_decay_steps=1500 Config.pose_freeze_field=True'
# Centering-prior family (g_*): Config.centering_loss_mult penalizes the
# density-weighted canonical-frame centroid of each object — the direct
# pose-error readout the photometric loss lacks (round-4 finding: f6's hard
# field freeze STILL drifts, because after warmup the field is consistent
# with the wrong pose and the photometric landscape is flat along the ray).
# g1: plain joint run + centering, yaw frozen.
RECIPES[g1]='MipNerfModel.centering_mode="mean" Config.max_steps=10000 Config.eps_max_steps=10000 Config.save_every=10000 Config.alpha_init=6. Config.alpha_final=10. Config.alpha_delay_steps=0 Config.alpha_max_steps=8000 MipNerfModel.no_yaw_opt=True Config.pose_lr_mult=1. Config.pose_lr_delay_steps=0 Config.pose_lr_ramp_steps=0 Config.pose_lr_decay_steps=0 Config.centering_loss_mult=1.'
# g2: g1 with yaw free.
RECIPES[g2]='MipNerfModel.centering_mode="mean" Config.max_steps=10000 Config.eps_max_steps=10000 Config.save_every=10000 Config.alpha_init=6. Config.alpha_final=10. Config.alpha_delay_steps=0 Config.alpha_max_steps=8000 MipNerfModel.no_yaw_opt=False Config.pose_lr_mult=1. Config.pose_lr_delay_steps=0 Config.pose_lr_ramp_steps=0 Config.pose_lr_decay_steps=0 Config.centering_loss_mult=1.'
# g3: g1 at centering 0.1 (sensitivity: does a weak prior still recover?).
RECIPES[g3]='MipNerfModel.centering_mode="mean" Config.max_steps=10000 Config.eps_max_steps=10000 Config.save_every=10000 Config.alpha_init=6. Config.alpha_final=10. Config.alpha_delay_steps=0 Config.alpha_max_steps=8000 MipNerfModel.no_yaw_opt=True Config.pose_lr_mult=1. Config.pose_lr_delay_steps=0 Config.pose_lr_ramp_steps=0 Config.pose_lr_decay_steps=0 Config.centering_loss_mult=0.1'
# g4: entrenchment rescue — f1's late-window schedule + centering (the
# centroid reads the pose error out of the already-fitted field, so the
# prior should recover even after the warmup entrenches the wrong pose).
RECIPES[g4]='MipNerfModel.centering_mode="mean" Config.max_steps=11000 Config.eps_max_steps=11000 Config.save_every=11000 Config.alpha_init=6. Config.alpha_final=6. Config.alpha_max_steps=1 MipNerfModel.no_yaw_opt=True Config.pose_lr_mult=100. Config.pose_lr_delay_steps=8500 Config.pose_lr_ramp_steps=500 Config.pose_lr_decay_steps=1500 Config.centering_loss_mult=1.'
# Midrange family (g5-g8): the mean-mode rows converge to the VISIBLE-SHELL
# mass centroid — for an opaque object that is ~0.6*ext off the true center
# along the viewing axis (g1 measured exactly that). centering_mode=midrange
# reads the (softmax_hi+softmin_lo)/2 of the occupied canonical extent
# instead: a tight-bounding-box fit that hits the true center whenever the
# visible faces span the slab, shell or not.
# g5: plain joint + midrange centering, yaw frozen.
RECIPES[g5]='Config.max_steps=10000 Config.eps_max_steps=10000 Config.save_every=10000 Config.alpha_init=6. Config.alpha_final=10. Config.alpha_delay_steps=0 Config.alpha_max_steps=8000 MipNerfModel.no_yaw_opt=True Config.pose_lr_mult=1. Config.pose_lr_delay_steps=0 Config.pose_lr_ramp_steps=0 Config.pose_lr_decay_steps=0 Config.centering_loss_mult=1.'
# g6: entrenchment rescue (f1 late-window schedule) + midrange centering.
RECIPES[g6]='Config.max_steps=11000 Config.eps_max_steps=11000 Config.save_every=11000 Config.alpha_init=6. Config.alpha_final=6. Config.alpha_max_steps=1 MipNerfModel.no_yaw_opt=True Config.pose_lr_mult=100. Config.pose_lr_delay_steps=8500 Config.pose_lr_ramp_steps=500 Config.pose_lr_decay_steps=1500 Config.centering_loss_mult=1.'
# g7: g5 with yaw free.
RECIPES[g7]='Config.max_steps=10000 Config.eps_max_steps=10000 Config.save_every=10000 Config.alpha_init=6. Config.alpha_final=10. Config.alpha_delay_steps=0 Config.alpha_max_steps=8000 MipNerfModel.no_yaw_opt=False Config.pose_lr_mult=1. Config.pose_lr_delay_steps=0 Config.pose_lr_ramp_steps=0 Config.pose_lr_decay_steps=0 Config.centering_loss_mult=1.'
# g8: g5 at centering 0.1 (weak-prior sensitivity).
RECIPES[g8]='Config.max_steps=10000 Config.eps_max_steps=10000 Config.save_every=10000 Config.alpha_init=6. Config.alpha_final=10. Config.alpha_delay_steps=0 Config.alpha_max_steps=8000 MipNerfModel.no_yaw_opt=True Config.pose_lr_mult=1. Config.pose_lr_delay_steps=0 Config.pose_lr_ramp_steps=0 Config.pose_lr_decay_steps=0 Config.centering_loss_mult=0.1'
# Box-surface family (h1-h4): the field-INDEPENDENT restoring force. Every
# field-readout prior (g-family: mean AND midrange centering) drifted,
# because the field co-adapts to whatever pose the readout prefers. The
# box-surface prior (Config.box_surface_loss_mult) regresses instance-masked
# LIDAR points onto the box surface — a pure function of the pose, anchored
# at the true box fit; tests/test_box_surface.py shows Adam on it ALONE
# recovers 0.5 m noise to < 3 cm.
# h1: plain joint + surface prior 1.0, yaw frozen.
RECIPES[h1]='Config.max_steps=10000 Config.eps_max_steps=10000 Config.save_every=10000 Config.alpha_init=6. Config.alpha_final=10. Config.alpha_delay_steps=0 Config.alpha_max_steps=8000 MipNerfModel.no_yaw_opt=True Config.pose_lr_mult=1. Config.pose_lr_delay_steps=0 Config.pose_lr_ramp_steps=0 Config.pose_lr_decay_steps=0 Config.box_surface_loss_mult=1.'
# h2: h1 with yaw free.
RECIPES[h2]='Config.max_steps=10000 Config.eps_max_steps=10000 Config.save_every=10000 Config.alpha_init=6. Config.alpha_final=10. Config.alpha_delay_steps=0 Config.alpha_max_steps=8000 MipNerfModel.no_yaw_opt=False Config.pose_lr_mult=1. Config.pose_lr_delay_steps=0 Config.pose_lr_ramp_steps=0 Config.pose_lr_decay_steps=0 Config.box_surface_loss_mult=1.'
# h3: entrenchment rescue — f1's late-window schedule + surface prior (does
# the anchored basin recover a pose the warmup already entrenched?).
RECIPES[h3]='Config.max_steps=11000 Config.eps_max_steps=11000 Config.save_every=11000 Config.alpha_init=6. Config.alpha_final=6. Config.alpha_max_steps=1 MipNerfModel.no_yaw_opt=True Config.pose_lr_mult=100. Config.pose_lr_delay_steps=8500 Config.pose_lr_ramp_steps=500 Config.pose_lr_decay_steps=1500 Config.box_surface_loss_mult=1.'
# h4: h1 at mult 10 (does a stronger anchor overpower photometric drift?).
RECIPES[h4]='Config.max_steps=10000 Config.eps_max_steps=10000 Config.save_every=10000 Config.alpha_init=6. Config.alpha_final=10. Config.alpha_delay_steps=0 Config.alpha_max_steps=8000 MipNerfModel.no_yaw_opt=True Config.pose_lr_mult=1. Config.pose_lr_delay_steps=0 Config.pose_lr_ramp_steps=0 Config.pose_lr_decay_steps=0 Config.box_surface_loss_mult=10.'
# h6: DOUBLE the reference's claimed max error — 1.0 m box noise (README.md
# :43-46 claims "up to 0.5 m"), yaw free, margin widened to 0.4 (the trim
# radius must cover the worst-case init SDF, ~noise*sqrt(3)/WORLD_SCALE).
RECIPES[h6]='Config.box_noise=1.0 Config.box_surface_margin=0.4 Config.max_steps=10000 Config.eps_max_steps=10000 Config.save_every=10000 Config.alpha_init=6. Config.alpha_final=10. Config.alpha_delay_steps=0 Config.alpha_max_steps=8000 MipNerfModel.no_yaw_opt=False Config.pose_lr_mult=1. Config.pose_lr_delay_steps=0 Config.pose_lr_ramp_steps=0 Config.pose_lr_decay_steps=0 Config.box_surface_loss_mult=10.'
# h5: full 4-DoF noise — centers 0.5 m AND yaw 5 deg (random_yaw), both
# optimized, surface prior 10 (the waymo_poseopt.gin protocol end-to-end).
RECIPES[h5]='Config.random_yaw=True Config.yaw_noise=5. Config.max_steps=10000 Config.eps_max_steps=10000 Config.save_every=10000 Config.alpha_init=6. Config.alpha_final=10. Config.alpha_delay_steps=0 Config.alpha_max_steps=8000 MipNerfModel.no_yaw_opt=False Config.pose_lr_mult=1. Config.pose_lr_delay_steps=0 Config.pose_lr_ramp_steps=0 Config.pose_lr_decay_steps=0 Config.box_surface_loss_mult=10.'

for name in "$@"; do
  params=(${RECIPES[$name]:?unknown recipe $name})
  args=()
  for kv in "${params[@]}"; do
    args+=(--gin_param "${kv/=/ = }")
  done
  echo "=== RUN $name"
  rm -rf "$OUT/$name"
  python -m durf_tpu.train "${COMMON[@]}" --train_dir "$OUT/$name" "${args[@]}"
  # The recipe args ride along so pose_eval reconstructs the SAME noised
  # init (random_yaw/yaw_noise for the 4-DoF recipes; the schedule params
  # are inert config fields there).
  python -m durf_tpu.pose_eval --data_dir "$SCENE" --train_dir "$OUT/$name" \
    --gin_file configs/carla_dyn.gin --gin_param "Config.random_box = True" \
    --gin_param "MipNerfModel.num_objects = 1" "${args[@]}"
done
