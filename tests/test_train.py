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


def test_box_surface_prior_restores_through_real_pipeline(scene_dir):
    """Round-4 pose-recovery mechanism through the REAL data pipeline:
    over pooled training batches (with their 'inst' ids), the box-surface
    loss is (a) ~zero at the GT pose — the synthetic LIDAR points lie on
    the box surface — and (b) positive at the noised init with a gradient
    whose descent direction reduces the pose error in aggregate. The full
    recovery runs are the h-family ledger (docs/STATUS.md); this pins the
    wiring and the sign deterministically."""
    import jax.numpy as jnp

    from durf_tpu import losses
    from durf_tpu.data import RayDataset

    cfg = tiny_train_config(
        batch_size=128, random_box=True, box_noise=0.3
    )
    ds = RayDataset("train", scene_dir, cfg)
    dot_sum = noised_sum = gt_sum = 0.0
    for _ in range(8):
        b = next(ds)
        ts = int(b["ts"])
        pose = jnp.asarray(b["init"][ts][:, :3])
        rot = jnp.asarray(b["init"][ts][:, 3:])
        target = jnp.asarray(b["target"][:, :3])
        gt_rot = jnp.asarray(b["target"][:, 3:])

        def f(p, r):
            return losses.box_surface_loss(
                b["rays"],
                jnp.asarray(b["depth"][:, 0]),
                p,
                r,
                jnp.asarray(b["ext"]),
                cfg.box_surface_margin,
                inst=jnp.asarray(b["inst"]),
                obj_ids=jnp.asarray(b["obj_ids"]),
            )

        val, g = jax.value_and_grad(f)(pose, rot)
        noised_sum += float(val)
        gt_sum += float(f(target, gt_rot))
        dot_sum += float((g * (pose - target)).sum())
    assert gt_sum < 1e-6, gt_sum  # GT pose: points on the surface
    assert noised_sum > 1e-3, noised_sum
    assert dot_sum > 0.0, dot_sum  # descent moves the pose toward GT


def test_box_surface_prior_e2e_smoke(scene_dir, tmp_path):
    """The prior runs through the jitted train step (device pools carrying
    'inst'/'obj_ids', sharded batches) and its scalar is logged finite."""
    import json

    cfg = tiny_train_config(
        max_steps=16,
        print_every=8,
        save_every=100,
        random_box=True,
        box_noise=0.3,
        box_surface_loss_mult=10.0,
    )
    cfg.model.no_pose_opt = False
    d = str(tmp_path / "surf")
    run_training(cfg, scene_dir, d)
    rows = [json.loads(l) for l in open(os.path.join(d, "metrics.jsonl"))]
    surf = [r["loss/box_surface"] for r in rows if "loss/box_surface" in r]
    assert len(surf) >= 2 and all(np.isfinite(surf))


@pytest.fixture(scope="module")
def c2f_train_scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("c2f_train_scene")
    generate_scene(
        str(d), timesteps=3, width=160, height=128, focal=140.0, factors=(16, 12, 8, 4)
    )
    return str(d)


def test_c2f_training_crosses_boundaries_device_resident(c2f_train_scene, tmp_path):
    # End-to-end c2f (VERDICT round-1 item 5): train through TWO factor
    # boundaries on the pyramid fixture with the device-resident fast path —
    # the per-factor pools + lax.switch must keep training (and improving)
    # across resolution changes without falling back to host streaming.
    cfg = tiny_train_config(
        max_steps=36,
        print_every=6,
        save_every=100,
        use_c2f=True,
        c2f_steps=(6, 12, 10_000),
    )
    logs = []
    state = run_training(cfg, c2f_train_scene, str(tmp_path / "c2f"), log_fn=logs.append)
    assert int(state.step) == 36
    assert any("device-resident" in l for l in logs)  # fast path retained
    losses = [float(l.split("loss=")[1].split(" ")[0]) for l in logs if "loss=" in l]
    assert len(losses) == 6
    assert all(np.isfinite(l) for l in losses)
    # Losses are NOT comparable across factors (coarser images are easier),
    # so assert improvement WITHIN the final factor-8 segment: prints at
    # steps 18/24 vs 30/36, all after the last boundary at step 12.
    assert np.mean(losses[-2:]) < np.mean(losses[2:4])


def test_c2f_training_host_streaming_matches_schedule(c2f_train_scene, tmp_path):
    # The host pipeline's stale-batch discard + factor schedule also train
    # through a boundary (the reference's only c2f path).
    cfg = tiny_train_config(
        max_steps=16,
        print_every=8,
        save_every=100,
        use_c2f=True,
        c2f_steps=(8, 12, 10_000),
    )
    cfg.device_resident_data = False
    logs = []
    state = run_training(cfg, c2f_train_scene, str(tmp_path / "c2fh"), log_fn=logs.append)
    assert int(state.step) == 16
    losses = [float(l.split("loss=")[1].split(" ")[0]) for l in logs if "loss=" in l]
    assert len(losses) == 2 and all(np.isfinite(l) for l in losses)


def test_c2f_factor_index_matches_host_schedule():
    from durf_tpu.data import device_data
    from durf_tpu.data.pipeline import RayDataset

    c2f_steps = (5, 10, 20)
    factors = [16, 12, 8, 4]
    host = RayDataset.__new__(RayDataset)  # schedule logic only
    host.factors = factors
    host.c2f_steps = c2f_steps
    for step_1idx in [1, 4, 5, 6, 10, 11, 20, 21, 500]:
        host._step = step_1idx
        expect = factors.index(host._current_factor())
        got = int(device_data.c2f_factor_index(step_1idx, c2f_steps, len(factors)))
        assert got == expect, (step_1idx, got, expect)


def test_pose_lr_delay_gates_pose_updates():
    """pose_lr_delay_steps: box_centers updates are 0 before the delay, ramp
    to pose_lr_mult after; other params update from step one."""
    import jax.numpy as jnp
    import optax

    from durf_tpu.train import make_optimizer

    cfg = tiny_train_config()
    cfg.pose_lr_mult = 0.5
    cfg.pose_lr_delay_steps = 3
    cfg.pose_lr_ramp_steps = 2
    tx = make_optimizer(cfg)

    params = {"box_centers": jnp.ones((2, 1, 6)), "mlp": {"w": jnp.ones((4, 4))}}
    grads = jax.tree.map(jnp.ones_like, params)
    state = tx.init(params)

    pose_mags, mlp_mags = [], []
    for _ in range(6):
        updates, state = tx.update(grads, state, params)
        pose_mags.append(float(jnp.abs(updates["box_centers"]).max()))
        mlp_mags.append(float(jnp.abs(updates["mlp"]["w"]).max()))

    # 1-indexed steps 1..6 with delay 3, ramp 2: gates 0, 0, 0, 1/2, 1, 1.
    assert pose_mags[0] == 0.0 and pose_mags[1] == 0.0 and pose_mags[2] == 0.0
    assert pose_mags[3] > 0.0 and pose_mags[4] > pose_mags[3] * 1.5
    assert abs(pose_mags[5] / mlp_mags[5] - cfg.pose_lr_mult) < 0.05 * cfg.pose_lr_mult
    assert all(m > 0 for m in mlp_mags)


def test_pose_lr_ramp_applies_without_delay():
    """BARF-style recipe: delay=0 with ramp>1 must actually ramp from step 1
    (round-3 advisor medium: the old gate hard-set 1.0 whenever delay == 0,
    so `delay=0, ramp=3000` silently ran at full pose LR)."""
    import jax.numpy as jnp

    from durf_tpu.train import make_optimizer

    cfg = tiny_train_config()
    cfg.pose_lr_mult = 1.0
    cfg.pose_lr_delay_steps = 0
    cfg.pose_lr_ramp_steps = 4
    tx = make_optimizer(cfg)

    params = {"box_centers": jnp.ones((2, 1, 6)), "mlp": {"w": jnp.ones((4, 4))}}
    grads = jax.tree.map(jnp.ones_like, params)
    state = tx.init(params)

    ratios = []
    for _ in range(5):
        updates, state = tx.update(grads, state, params)
        ratios.append(
            float(jnp.abs(updates["box_centers"]).max())
            / float(jnp.abs(updates["mlp"]["w"]).max())
        )
    # 1-indexed steps 1..5, ramp 4: gates 1/4, 2/4, 3/4, 1, 1.
    np.testing.assert_allclose(ratios, [0.25, 0.5, 0.75, 1.0, 1.0], rtol=1e-5)


def test_pose_freeze_field_zeroes_non_pose_updates_in_window():
    """pose_freeze_field: NON-pose params stop updating exactly while the
    pose window is active — the isolation probe's static-field regime as one
    continuous run (probe recovered 0.23 -> 0.036 pose-MSE; the mult-only
    recipes leave a tiny field LR and drift — round-3 STATUS ledger)."""
    import jax.numpy as jnp

    from durf_tpu.train import make_optimizer

    cfg = tiny_train_config()
    cfg.pose_lr_mult = 2.0
    cfg.pose_lr_delay_steps = 2
    cfg.pose_lr_ramp_steps = 1
    cfg.pose_lr_decay_steps = 2
    cfg.pose_freeze_field = True
    tx = make_optimizer(cfg)

    params = {"box_centers": jnp.ones((2, 1, 6)), "mlp": {"w": jnp.ones((4, 4))}}
    grads = jax.tree.map(jnp.ones_like, params)
    state = tx.init(params)

    pose_mags, mlp_mags = [], []
    for _ in range(7):
        updates, state = tx.update(grads, state, params)
        pose_mags.append(float(jnp.abs(updates["box_centers"]).max()))
        mlp_mags.append(float(jnp.abs(updates["mlp"]["w"]).max()))

    # 1-indexed steps 1..7, delay 2 / ramp 1 / decay 2: the pose window is
    # active on steps 3..5; the field must train on 1-2, freeze on 3-5, and
    # resume on 6-7.
    assert mlp_mags[0] > 0 and mlp_mags[1] > 0
    assert mlp_mags[2] == 0.0 and mlp_mags[3] == 0.0 and mlp_mags[4] == 0.0
    assert mlp_mags[5] > 0 and mlp_mags[6] > 0
    # The pose moves only inside its window (and the decay tail ends at 0).
    assert pose_mags[0] == 0.0 and pose_mags[1] == 0.0
    assert pose_mags[2] > 0.0 and pose_mags[3] > 0.0
    assert pose_mags[5] == 0.0 and pose_mags[6] == 0.0


def test_pose_freeze_field_without_decay_freezes_to_end():
    import jax.numpy as jnp

    from durf_tpu.train import make_optimizer

    cfg = tiny_train_config()
    cfg.pose_lr_mult = 1.0
    cfg.pose_lr_delay_steps = 3
    cfg.pose_lr_ramp_steps = 1
    cfg.pose_lr_decay_steps = 0
    cfg.pose_freeze_field = True
    tx = make_optimizer(cfg)

    params = {"box_centers": jnp.ones((2, 1, 6)), "mlp": {"w": jnp.ones((4, 4))}}
    grads = jax.tree.map(jnp.ones_like, params)
    state = tx.init(params)

    mlp_mags = []
    for _ in range(6):
        updates, state = tx.update(grads, state, params)
        mlp_mags.append(float(jnp.abs(updates["mlp"]["w"]).max()))
    # delay 3, decay 0: field trains steps 1-3, frozen from step 4 onward.
    assert all(m > 0 for m in mlp_mags[:3]) and all(m == 0.0 for m in mlp_mags[3:])
