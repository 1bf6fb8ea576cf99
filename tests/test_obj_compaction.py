"""Object-ray compaction (ModelConfig.obj_ray_capacity): exactness.

Objects cover a small fraction of rays while the object encode + MLPs run on
every ray with hit-masked outputs; compaction gathers the top-k rays (hit
rays first), runs the object pipeline on the compacted set, and scatters the
outputs back. This must be bit-for-bit a permutation: identical model
outputs AND gradients whenever the batch's hit count <= capacity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from durf_tpu.configs import MLPConfig, ModelConfig
from durf_tpu.models import construct_model
from durf_tpu.rays import Rays


def small_config(**kw) -> ModelConfig:
    base = dict(
        num_samples=8,
        num_levels=2,
        max_deg_point=3,
        deg_view=2,
        num_objects=2,
        timesteps=3,
        density_noise=0.0,
        contraction=False,
        mlp=MLPConfig(net_depth=2, net_width=16, net_width_condition=8),
        box_mlp=MLPConfig(net_depth=2, net_width=8, net_width_condition=8),
    )
    base.update(kw)
    return ModelConfig(**base)


def mixed_batch(n_rays=160, n_hit=8):
    """Rays where only the first `n_hit` point at the boxes (z = -5)."""
    rng = np.random.default_rng(11)
    dirs = rng.normal(size=(n_rays, 3)).astype(np.float32) * 0.05
    dirs[:, 2] = 1.0  # miss: away from the boxes
    dirs[:n_hit, 2] = -1.0  # hit rays
    ones = np.ones((n_rays, 1), np.float32)
    rays = Rays(
        origins=jnp.zeros((n_rays, 3), jnp.float32),
        directions=jnp.asarray(dirs),
        viewdirs=jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)),
        radii=jnp.asarray(ones * 0.01),
        lossmult=jnp.asarray(ones),
        near=ones * 0.1,
        far=ones * 10.0,
    )
    init = np.zeros((3, 2, 6), np.float32)
    init[:, 0, :3] = [0.3, -0.2, -5.0]
    init[:, 1, :3] = [-0.4, 0.1, -5.5]
    return {
        "rays": rays,
        "init": jnp.asarray(init),
        "ext": jnp.full((2, 3), 1.5),
        "ts": jnp.asarray(1),
    }


def apply_model(model, variables, batch):
    return model.apply(
        variables,
        rng=None,
        rays=batch["rays"],
        init_boxes=batch["init"],
        ext=batch["ext"],
        ts=batch["ts"],
        randomized=False,
        background="gray",
        alpha=3.0,
    )


@pytest.mark.parametrize("cm", [False, True])
def test_compaction_matches_uncompacted_outputs(cm):
    batch = mixed_batch()
    outs = {}
    for cap in (0.0, 0.8):  # k = max(128, ...) = 128 < 160 rays
        cfg = small_config(coord_major=cm, obj_ray_capacity=cap)
        model, variables = construct_model(jax.random.key(0), batch, cfg)
        outs[cap] = apply_model(model, variables, batch)
    for lv0, lv1 in zip(outs[0.0], outs[0.8]):
        for key in ("rgb", "depth", "acc", "weights", "obj_centroid"):
            np.testing.assert_allclose(
                np.asarray(lv0[key]),
                np.asarray(lv1[key]),
                rtol=1e-5,
                atol=1e-6,
                err_msg=key,
            )


def test_compaction_matches_uncompacted_gradients():
    batch = mixed_batch()
    grads = {}
    for cap in (0.0, 0.8):
        cfg = small_config(obj_ray_capacity=cap)
        model, variables = construct_model(jax.random.key(0), batch, cfg)

        def loss(params):
            out = apply_model(model, {"params": params}, batch)
            return sum((lv["rgb"] ** 2).sum() for lv in out)

        grads[cap] = jax.grad(loss)(variables["params"])
    flat0 = jax.tree_util.tree_leaves_with_path(grads[0.0])
    flat1 = dict(jax.tree_util.tree_leaves_with_path(grads[0.8]))
    # tree_leaves_with_path returns (path, leaf) tuples; compare by path.
    flat1 = {jax.tree_util.keystr(p): g for p, g in jax.tree_util.tree_leaves_with_path(grads[0.8])}
    for p, g0 in flat0:
        key = jax.tree_util.keystr(p)
        np.testing.assert_allclose(
            np.asarray(g0), np.asarray(flat1[key]), rtol=1e-4, atol=1e-6,
            err_msg=key,
        )


def test_overflow_drops_excess_hit_rays_gracefully():
    """More hit rays than capacity: outputs stay finite and the kept rays
    still carry object contributions (the documented approximation)."""
    batch = mixed_batch(n_rays=160, n_hit=150)  # capacity k = 128 < 150 hits
    cfg = small_config(obj_ray_capacity=0.8)
    model, variables = construct_model(jax.random.key(0), batch, cfg)
    out = apply_model(model, variables, batch)
    for lv in out:
        assert np.all(np.isfinite(np.asarray(lv["rgb"])))
        assert np.all(np.isfinite(np.asarray(lv["weights"])))


def test_compaction_matches_on_fused_kernel_path():
    """The objects-in-grid Pallas path (interpret mode on CPU) under
    compaction: the kernel pads its ray axis, so a compacted k simply
    yields fewer tiles — outputs must match the uncompacted kernel."""
    batch = mixed_batch()
    outs = {}
    for cap in (0.0, 0.8):
        cfg = small_config(
            coord_major=True,
            use_pallas_mlp=True,
            fused_objects=True,
            obj_ray_capacity=cap,
        )
        model, variables = construct_model(jax.random.key(0), batch, cfg)
        outs[cap] = apply_model(model, variables, batch)
    for lv0, lv1 in zip(outs[0.0], outs[0.8]):
        for key in ("rgb", "depth", "weights"):
            np.testing.assert_allclose(
                np.asarray(lv0[key]),
                np.asarray(lv1[key]),
                rtol=1e-5,
                atol=1e-6,
                err_msg=key,
            )


def test_capacity_one_disables_compaction_path():
    """cap high enough that k == batch: must take the uncompacted branch
    (python-level) and equal cap=0 exactly."""
    batch = mixed_batch(n_rays=128)
    outs = []
    for cap in (0.0, 1.0):
        cfg = small_config(obj_ray_capacity=cap)
        model, variables = construct_model(jax.random.key(0), batch, cfg)
        outs.append(apply_model(model, variables, batch))
    for lv0, lv1 in zip(*outs):
        np.testing.assert_array_equal(np.asarray(lv0["rgb"]), np.asarray(lv1["rgb"]))


def test_warn_obj_overflow_console_mirror():
    """The trainer mirrors a positive obj/overflow_rays to the console
    (train.warn_obj_overflow) so a mis-sized capacity is loud, not just a
    TensorBoard scalar."""
    from durf_tpu.train import warn_obj_overflow

    lines = []
    # No overflow key at all (capacity off) and zero overflow: silent.
    assert not warn_obj_overflow({"train/loss": 1.0}, 100, lines.append)
    assert not warn_obj_overflow(
        {"obj/overflow_rays": 0.0, "obj/hit_frac": 0.01}, 100, lines.append
    )
    assert lines == []
    # Positive overflow: one warning naming the count and the knob.
    assert warn_obj_overflow(
        {"obj/overflow_rays": 7.0, "obj/hit_frac": 0.125}, 200, lines.append
    )
    assert len(lines) == 1
    assert "7 rays" in lines[0] and "obj_ray_capacity" in lines[0]
    assert "step 200" in lines[0]


# ---------------------------------------------------------------------------
# Auto-sizing (obj_ray_capacity == -1): scene-statistics estimator + resolver.


@pytest.fixture(scope="module")
def compaction_scene(tmp_path_factory):
    from durf_tpu.data.synthetic import generate_scene

    d = tmp_path_factory.mktemp("compaction_scene")
    generate_scene(str(d), timesteps=3, width=80, height=64, focal=70.0, factors=(4,))
    return str(d)


def _scene_config(**kw):
    from durf_tpu.configs import Config

    cfg = Config(
        dataset_loader="carla_dyn",
        batching="timestep",
        batch_size=256,
        factor=4,
        spherify=True,
        centering=True,
        near=0.0,
        far=30.0,
        timesteps=3,
        model=small_config(timesteps=3),
    )
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_max_hit_fraction_matches_model_hit_mask(compaction_scene):
    """The host-numpy estimator must reproduce the model's own hit math
    (models/mipnerf.py:129) exactly, per timestep."""
    from durf_tpu import ops
    from durf_tpu.data import get_dataset
    from durf_tpu.data.scene import max_hit_fraction

    ds = get_dataset("train", compaction_scene, _scene_config())
    scene = ds.scene
    est = max_hit_fraction(scene, use_off=False, inflate=0.0)

    init = jnp.asarray(scene.init_table(use_off=False))
    fracs = []
    for t in range(scene.total_timesteps):
        idx = np.nonzero(scene.timesteps == t + 1)[0]
        o = jnp.concatenate(
            [jnp.asarray(scene.rays[i].origins).reshape(-1, 3) for i in idx]
        )
        d = jnp.concatenate(
            [jnp.asarray(scene.rays[i].directions).reshape(-1, 3) for i in idx]
        )
        ext = jnp.asarray(scene.boxes_for("ext", t + 1))
        n_obj = init.shape[1]
        pose = jnp.broadcast_to(init[t, :, :3], (o.shape[0], n_obj, 3))
        rot = jnp.broadcast_to(
            ops.axis_angle_to_matrix(init[t, :, 3:]), (o.shape[0], n_obj, 3, 3)
        )
        oo, dd = ops.world_to_box_frames(o, d, pose, rot)
        dims = jnp.broadcast_to(ext, (o.shape[0], n_obj, 3))
        _, _, hit = ops.ray_box_intersection(oo, dd, -dims, dims)
        fracs.append(float((hit.sum(-1) > 0).mean()))
    assert est > 0.0
    np.testing.assert_allclose(est, max(fracs), atol=1e-7)


def test_resolve_obj_capacity_auto(compaction_scene):
    from durf_tpu.data import get_dataset
    from durf_tpu.data.scene import max_hit_fraction
    from durf_tpu.train import resolve_obj_capacity

    config = _scene_config()
    config.model.obj_ray_capacity = -1.0
    ds = get_dataset("train", compaction_scene, config)
    logs = []
    cap = resolve_obj_capacity(config, ds, logs.append)
    frac = max_hit_fraction(ds.scene, use_off=False, inflate=0.0)
    assert cap == pytest.approx(min(1.0, config.model.obj_capacity_margin * frac))
    assert 0.0 < cap <= 1.0
    assert logs and "obj_ray_capacity auto" in logs[0]

    # Pose noise inflates the extents: capacity must not shrink.
    noisy = _scene_config(random_box=True, box_noise=0.5)
    noisy.model.obj_ray_capacity = -1.0
    ds_n = get_dataset("train", compaction_scene, noisy)
    cap_n = resolve_obj_capacity(noisy, ds_n, lambda *_: None)
    assert cap_n >= cap


def test_resolve_obj_capacity_static_scene(tmp_path):
    from durf_tpu.data import get_dataset
    from durf_tpu.data.synthetic import generate_scene
    from durf_tpu.train import resolve_obj_capacity

    d = str(tmp_path / "static")
    generate_scene(d, timesteps=3, width=40, height=32, focal=35.0, factors=(4,), num_objects=0)
    config = _scene_config()
    config.model.dynamics = False
    config.model.num_objects = 0
    ds = get_dataset("train", d, config)
    assert resolve_obj_capacity(config, ds, lambda *_: None) == 0.0


def test_auto_capacity_trains_without_overflow(compaction_scene, tmp_path):
    """End-to-end: obj_ray_capacity = -1 resolves at startup and the short
    run raises no overflow warning (the auto margin holds)."""
    from durf_tpu.train import run_training

    config = _scene_config(
        batch_size=32,
        max_steps=8,
        print_every=4,
        save_every=8,
        render_every=0,
        chunk=64,
        lr_init=5e-3,
        lr_final=5e-4,
        lr_delay_steps=0,
        grad_max_norm=1.0,
    )
    config.model.obj_ray_capacity = -1.0
    logs = []
    state = run_training(config, compaction_scene, str(tmp_path / "run"), log_fn=logs.append)
    assert int(state.step) == 8
    assert config.model.obj_ray_capacity > 0.0  # resolved in place
    assert any("obj_ray_capacity auto" in l for l in logs)
    assert not any("overflow" in l for l in logs)
