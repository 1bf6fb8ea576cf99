"""End-to-end training tests on the 8-device virtual CPU mesh."""

import os

import jax
import numpy as np
import pytest

from durf_tpu.configs import Config, MLPConfig, ModelConfig
from durf_tpu.data.synthetic import generate_scene
from durf_tpu.train import run_training


def tiny_train_config(**kw) -> Config:
    cfg = Config(
        dataset_loader="carla_dyn",
        batching="timestep",
        batch_size=32,
        factor=4,
        spherify=True,
        centering=True,
        near=0.0,
        far=30.0,
        timesteps=3,
        max_steps=24,
        print_every=8,
        save_every=16,
        render_every=0,
        chunk=64,
        lr_init=5e-3,
        lr_final=5e-4,
        lr_delay_steps=0,
        grad_max_norm=1.0,
        grad_max_val=0.1,
        rand_bkgd=False,
        randomized=True,
        model=ModelConfig(
            num_samples=8,
            num_levels=2,
            max_deg_point=4,
            deg_view=2,
            num_objects=2,
            timesteps=3,
            density_noise=0.0,
            no_pose_opt=True,
            no_yaw_opt=True,
            mlp=MLPConfig(net_depth=2, net_width=16, net_width_condition=8),
            box_mlp=MLPConfig(net_depth=2, net_width=8, net_width_condition=8),
        ),
    )
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("train_scene")
    generate_scene(str(d), timesteps=3, width=80, height=64, focal=70.0, factors=(4,))
    return str(d)


def test_training_runs_and_loss_decreases(scene_dir, tmp_path):
    assert len(jax.devices()) == 8  # conftest's virtual mesh
    cfg = tiny_train_config()
    logs = []
    state = run_training(cfg, scene_dir, str(tmp_path / "run"), log_fn=logs.append)
    assert int(state.step) == cfg.max_steps
    losses = [float(l.split("loss=")[1].split(" ")[0]) for l in logs if "loss=" in l]
    assert len(losses) == 3
    assert losses[-1] < losses[0]
    assert np.isfinite(losses[-1])


def test_checkpoint_resume(scene_dir, tmp_path):
    cfg = tiny_train_config(max_steps=16, save_every=16)
    train_dir = str(tmp_path / "resume")
    run_training(cfg, scene_dir, train_dir)
    assert os.path.isdir(os.path.join(train_dir, "16"))
    # Resuming with a higher max_steps continues from step 16.
    cfg2 = tiny_train_config(max_steps=20, save_every=16)
    state = run_training(cfg2, scene_dir, train_dir)
    assert int(state.step) == 20


def test_eval_render_during_training(scene_dir, tmp_path):
    cfg = tiny_train_config(max_steps=8, render_every=8, save_every=100, chunk=64)
    logs = []
    run_training(cfg, scene_dir, str(tmp_path / "ev"), log_fn=logs.append)
    eval_lines = [l for l in logs if l.startswith("eval")]
    assert len(eval_lines) == 1
    psnr = float(eval_lines[0].split("psnr=")[1].split(" ")[0])
    assert np.isfinite(psnr) and psnr > 5.0


def test_host_streaming_path(scene_dir, tmp_path):
    # device_resident_data=False exercises the reference-style host pipeline.
    cfg = tiny_train_config(max_steps=8, print_every=4, save_every=100)
    cfg.device_resident_data = False
    logs = []
    state = run_training(cfg, scene_dir, str(tmp_path / "host_run"), log_fn=logs.append)
    assert int(state.step) == 8
    assert not any("device-resident" in l for l in logs)


def test_static_scene_training(tmp_path):
    # BASELINE configs[0]: static Mip-NeRF (no boxes, no pose table) on a
    # static scene — the dynamics=False end-to-end path.
    scene = str(tmp_path / "static_scene")
    generate_scene(scene, timesteps=3, width=80, height=64, focal=70.0, factors=(4,), num_objects=0)
    cfg = tiny_train_config(max_steps=12, print_every=4, save_every=100)
    cfg.model.dynamics = False
    logs = []
    state = run_training(cfg, scene, str(tmp_path / "static_run"), log_fn=logs.append)
    assert int(state.step) == 12
    assert "box_centers" not in state.params
    losses = [float(l.split("loss=")[1].split(" ")[0]) for l in logs if "loss=" in l]
    assert np.isfinite(losses[-1]) and losses[-1] < losses[0]


def test_custom_test_indices(tmp_path):
    from durf_tpu.data import load_scene

    scene = str(tmp_path / "ti_scene")
    generate_scene(scene, timesteps=3, width=80, height=64, focal=70.0, factors=(4,))
    cfg = tiny_train_config()
    cfg.test_indices = (0, 5, 7)
    test = load_scene(scene, cfg, "test")
    assert test.n_examples == 3
    train = load_scene(scene, cfg, "train")
    assert train.n_examples == 12


def test_metrics_jsonl_written(scene_dir, tmp_path):
    import json

    cfg = tiny_train_config(max_steps=8, print_every=8, save_every=100)
    d = str(tmp_path / "mj")
    run_training(cfg, scene_dir, d)
    lines = [json.loads(l) for l in open(os.path.join(d, "metrics.jsonl"))]
    assert any("train/loss" in l for l in lines)
    row = next(l for l in lines if "train/loss" in l)
    for key in ("train/psnr", "schedule/lr", "loss/depth_1", "perf/rays_per_sec"):
        assert key in row
