"""App-level tests: eval CLI, trajectory renderer, pose evaluation."""

import json
import os

import numpy as np
import pytest

from durf_tpu.data.synthetic import generate_scene
from durf_tpu.eval import evaluate
from durf_tpu.pose_eval import evaluate_poses
from durf_tpu.render import render_trajectory
from durf_tpu.train import run_training
from tests.test_train import tiny_train_config


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    scene = str(tmp_path_factory.mktemp("apps_scene"))
    train_dir = str(tmp_path_factory.mktemp("apps_train"))
    generate_scene(scene, timesteps=3, width=80, height=64, focal=70.0, factors=(4,))
    cfg = tiny_train_config(max_steps=16, save_every=16, render_every=0)
    run_training(cfg, scene, train_dir)
    return cfg, scene, train_dir


def test_evaluate_writes_metrics_and_images(trained, tmp_path):
    cfg, scene, train_dir = trained
    out_dir = str(tmp_path / "eval_out")
    summary = evaluate(cfg, scene, train_dir, out_dir=out_dir, log_fn=lambda *_: None)
    assert summary["num_views"] == 2
    assert np.isfinite(summary["psnr"]) and summary["psnr"] > 5
    assert 0 <= summary["ssim"] <= 1
    assert np.isfinite(summary["depth_mse"])
    assert os.path.exists(os.path.join(out_dir, "metrics.json"))
    assert os.path.exists(os.path.join(out_dir, "pred_000.png"))
    assert os.path.exists(os.path.join(out_dir, "depth_001.png"))
    with open(os.path.join(out_dir, "metrics.json")) as f:
        assert json.load(f)["num_views"] == 2


def test_render_trajectory_produces_frames(trained, tmp_path):
    cfg, scene, train_dir = trained
    out_dir = str(tmp_path / "traj")
    frames = render_trajectory(
        cfg, scene, train_dir, out_dir, path="interp", n_views=2, log_fn=lambda *_: None
    )
    assert len(frames) == 2
    assert frames[0].shape == (16, 20, 3)
    assert os.path.exists(os.path.join(out_dir, "frame_0001.png"))
    assert os.path.exists(os.path.join(out_dir, "trajectory.gif"))
    assert np.all(np.isfinite(frames[0]))


def test_render_npz_trajectory_with_moving_boxes(trained, tmp_path):
    # The durf_render_traj workflow: explicit camera poses + per-frame box
    # poses moving independently of the camera.
    cfg, scene, train_dir = trained
    from durf_tpu.data import load_scene

    sc = load_scene(scene, cfg, "render")
    poses = sc.camtoworlds[:2]
    box_poses = np.stack([sc.boxes_for("center", 1), sc.boxes_for("center", 2)])
    traj = str(tmp_path / "traj.npz")
    np.savez(traj, poses=poses, box_poses=box_poses)
    out_dir = str(tmp_path / "npztraj")
    frames = render_trajectory(
        cfg, scene, train_dir, out_dir, trajectory=traj, timestep=0, log_fn=lambda *_: None
    )
    assert len(frames) == 2
    assert os.path.exists(os.path.join(out_dir, "frame_0001.png"))
    assert np.all(np.isfinite(frames[1]))


def test_pose_eval_reports_errors(trained):
    cfg, scene, train_dir = trained
    out = evaluate_poses(cfg, scene, train_dir, log_fn=lambda *_: None)
    assert out["step"] == 16
    for key in ("mse_x", "mse_y", "mse_z", "angle_deg_mean"):
        assert np.isfinite(out["optimized_vs_gt"][key])
    # no_pose_opt=True in the tiny config: optimized == init == gt (no noise).
    assert out["optimized_vs_gt"]["mse_total"] < 1e-8
    # Per-timestep breakdown (occlusion-row readout): one entry per timestep,
    # whose mean is exactly the aggregate.
    per_ts = out["optimized_vs_gt"]["per_timestep_mse"]
    assert len(per_ts) == cfg.timesteps
    assert abs(np.mean(per_ts) - out["optimized_vs_gt"]["mse_total"]) < 1e-12
