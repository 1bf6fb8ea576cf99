"""Tests for the MipNerf scene-graph model (tiny shapes; CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from durf_tpu.configs import MLPConfig, ModelConfig
from durf_tpu.models import MipNerf, construct_model
from durf_tpu.rays import Rays


def tiny_model_config(**kw) -> ModelConfig:
    base = dict(
        num_samples=4,
        num_levels=2,
        max_deg_point=3,
        deg_view=2,
        num_objects=2,
        timesteps=3,
        density_noise=0.0,
        mlp=MLPConfig(net_depth=2, net_width=16, net_width_condition=8),
        box_mlp=MLPConfig(net_depth=2, net_width=8, net_width_condition=8),
    )
    base.update(kw)
    return ModelConfig(**base)


def make_rays(batch=4, seed=0) -> Rays:
    rng = np.random.default_rng(seed)
    dirs = rng.normal(size=(batch, 3)).astype(np.float32)
    dirs[:, 2] = -np.abs(dirs[:, 2]) - 0.5
    ones = np.ones((batch, 1), np.float32)
    return Rays(
        origins=jnp.asarray(rng.normal(size=(batch, 3)) * 0.1, jnp.float32),
        directions=jnp.asarray(dirs),
        viewdirs=jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)),
        radii=jnp.asarray(ones * 0.01),
        lossmult=jnp.asarray(ones),
        near=jnp.asarray(ones * 0.5),
        far=jnp.asarray(ones * 6.0),
    )


def make_batch(batch=4, n_obj=2, t=3):
    rng = np.random.default_rng(1)
    init = rng.normal(size=(t, n_obj, 6)).astype(np.float32)
    init[..., :3] *= 2.0
    return {
        "rays": make_rays(batch),
        "init": jnp.asarray(init),
        "ext": jnp.asarray(np.abs(rng.normal(size=(n_obj, 3))) + 0.5, jnp.float32),
        "ts": jnp.asarray(1),
    }


@pytest.fixture(scope="module")
def dyn_model():
    cfg = tiny_model_config()
    batch = make_batch()
    model, variables = construct_model(jax.random.key(0), batch, cfg)
    return cfg, batch, model, variables


def test_output_shapes_and_levels(dyn_model):
    cfg, batch, model, variables = dyn_model
    out = model.apply(
        variables,
        rng=jax.random.key(1),
        rays=batch["rays"],
        init_boxes=batch["init"],
        ext=batch["ext"],
        ts=batch["ts"],
        randomized=True,
        background="gray",
        alpha=4.0,
    )
    assert len(out) == cfg.num_levels
    B, S = 4, cfg.num_samples
    for level in out:
        assert level["rgb"].shape == (B, 3)
        assert level["depth"].shape == (B,)
        assert level["acc"].shape == (B,)
        assert level["weights"].shape == (B, S)
        assert level["t_vals"].shape == (B, S + 1)
        assert level["pose"].shape == (2, 3)
        assert level["rot"].shape == (2, 3)
        assert level["dyn_mask"].shape == (B, 1)
        assert level["z_out"].shape == (B,)
        assert np.all(np.isfinite(np.asarray(level["rgb"])))
        assert np.all(np.asarray(level["rgb"]) >= 0) and np.all(np.asarray(level["rgb"]) <= 1)


@pytest.mark.parametrize(
    "kw",
    [
        dict(lindisp=True),
        dict(ray_shape="cylinder"),
        dict(disable_integration=True),
        dict(contraction=False),
        dict(use_viewdirs=True, deg_view=1),
    ],
)
def test_model_config_variants(dyn_model, kw):
    # Every reference model knob produces finite renders.
    _, batch, _, _ = dyn_model
    cfg = tiny_model_config(**kw)
    model, variables = construct_model(jax.random.key(0), batch, cfg)
    out = model.apply(
        variables,
        rng=jax.random.key(1),
        rays=batch["rays"],
        init_boxes=batch["init"],
        ext=batch["ext"],
        ts=batch["ts"],
        randomized=True,
        background="random",
        alpha=4.0,
    )
    rgb = np.asarray(out[-1]["rgb"])
    assert np.all(np.isfinite(rgb)) and rgb.shape == (4, 3)


def test_pose_table_param_and_object_mlp_stacking(dyn_model):
    cfg, batch, model, variables = dyn_model
    params = variables["params"]
    assert params["box_centers"].shape == (3, 2, 6)
    np.testing.assert_allclose(np.asarray(params["box_centers"]), np.asarray(batch["init"]))
    # Object MLP params are stacked along a leading object axis (vmapped).
    kernel = params["object_mlps"]["trunk_0"]["kernel"]
    assert kernel.shape[0] == 2


def test_deterministic_eval(dyn_model):
    cfg, batch, model, variables = dyn_model
    kwargs = dict(
        rays=batch["rays"],
        init_boxes=batch["init"],
        ext=batch["ext"],
        ts=batch["ts"],
        randomized=False,
        background="gray",
        alpha=4.0,
    )
    a = model.apply(variables, rng=jax.random.key(1), **kwargs)
    b = model.apply(variables, rng=jax.random.key(2), **kwargs)
    np.testing.assert_allclose(np.asarray(a[-1]["rgb"]), np.asarray(b[-1]["rgb"]), atol=1e-6)


def test_static_model_no_pose_param():
    cfg = tiny_model_config(dynamics=False)
    batch = make_batch()
    batch = {"rays": batch["rays"], "init": None, "ext": None, "ts": None}
    model, variables = construct_model(jax.random.key(0), batch, cfg)
    assert "box_centers" not in variables["params"]
    assert "object_mlps" not in variables["params"]
    out = model.apply(
        variables,
        rng=jax.random.key(1),
        rays=make_rays(),
        init_boxes=None,
        ext=None,
        ts=None,
        randomized=False,
        background="white",
        alpha=0.0,
    )
    assert out[-1]["rgb"].shape == (4, 3)


@pytest.mark.parametrize("no_pose_opt,expect_pose_grad", [(False, True), (True, False)])
def test_pose_gradient_gating(no_pose_opt, expect_pose_grad):
    cfg = tiny_model_config(no_pose_opt=no_pose_opt, no_yaw_opt=no_pose_opt)
    batch = make_batch()
    # Put a box right on the ray paths so hits (and pose gradients) exist.
    init = np.asarray(batch["init"]).copy()
    init[:, :, :3] = 0.0
    init[:, :, 3:] = 0.01
    batch["init"] = jnp.asarray(init)
    batch["ext"] = jnp.full((2, 3), 3.0)
    model, variables = construct_model(jax.random.key(0), batch, cfg)

    def loss_fn(params):
        out = model.apply(
            {"params": params},
            rng=jax.random.key(1),
            rays=batch["rays"],
            init_boxes=batch["init"],
            ext=batch["ext"],
            ts=batch["ts"],
            randomized=False,
            background="gray",
            alpha=4.0,
        )
        return sum(jnp.mean(level["rgb"] ** 2) for level in out)

    grads = jax.grad(loss_fn)(variables["params"])
    pose_grad = np.abs(np.asarray(grads["box_centers"])).max()
    if expect_pose_grad:
        assert pose_grad > 0.0
    else:
        assert pose_grad == 0.0
    # MLP grads must always flow.
    assert np.abs(np.asarray(grads["background_mlp"]["trunk_0"]["kernel"])).max() > 0


def test_rays_hitting_box_get_object_contribution():
    cfg = tiny_model_config(contraction=False)
    # Ray 0 goes through the box; ray 1 points away.
    origins = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 50.0, 0.0]])
    dirs = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])
    ones = jnp.ones((2, 1))
    rays = Rays(
        origins=origins,
        directions=dirs,
        viewdirs=dirs,
        radii=ones * 0.01,
        lossmult=ones,
        near=ones * 0.1,
        far=ones * 10.0,
    )
    init = np.zeros((3, 2, 6), np.float32)
    init[:, 0, :3] = [0.0, 0.0, -5.0]  # box 0 on ray 0's path
    init[:, 1, :3] = [100.0, 100.0, 100.0]  # box 1 far away
    batch = {
        "rays": rays,
        "init": jnp.asarray(init),
        "ext": jnp.ones((2, 3)),
        "ts": jnp.asarray(0),
    }
    model, variables = construct_model(jax.random.key(0), batch, cfg)
    out = model.apply(
        variables,
        rng=jax.random.key(1),
        rays=rays,
        init_boxes=batch["init"],
        ext=batch["ext"],
        ts=batch["ts"],
        randomized=False,
        background="gray",
        alpha=4.0,
    )
    dyn_mask = np.asarray(out[-1]["dyn_mask"])
    np.testing.assert_allclose(dyn_mask[:, 0], [1.0, 0.0])
    z_out = np.asarray(out[-1]["z_out"])
    assert z_out[0] > 0 and z_out[1] == 0.0


def test_pallas_mlp_path_matches_xla(dyn_model):
    # The fused-kernel background MLP (interpret mode on CPU) must agree with
    # the XLA path on the same params, and stay differentiable end to end.
    _, batch, _, _ = dyn_model
    kwargs = dict(
        rays=batch["rays"],
        init_boxes=batch["init"],
        ext=batch["ext"],
        ts=batch["ts"],
        randomized=False,
        background="gray",
        alpha=4.0,
    )
    cfg_xla = tiny_model_config(compute_dtype="bfloat16")
    cfg_pal = tiny_model_config(compute_dtype="bfloat16", use_pallas_mlp=True)
    model_x, variables = construct_model(jax.random.key(0), batch, cfg_xla)
    model_p = MipNerf(cfg_pal)
    out_x = model_x.apply(variables, rng=jax.random.key(1), **kwargs)
    out_p = model_p.apply(variables, rng=jax.random.key(1), **kwargs)
    np.testing.assert_allclose(
        np.asarray(out_x[-1]["rgb"]), np.asarray(out_p[-1]["rgb"]), atol=1e-2
    )

    def loss(params):
        out = model_p.apply({"params": params}, rng=jax.random.key(1), **kwargs)
        return jnp.mean(out[-1]["rgb"] ** 2)

    g = jax.grad(loss)(variables["params"])
    gmax = np.abs(np.asarray(g["background_mlp"]["trunk_0"]["kernel"])).max()
    assert np.isfinite(gmax) and gmax > 0


def test_diag_covariance_exactly_matches_full(dyn_model):
    # The diagonal pipeline is exact for the power-of-two axis-aligned IPE
    # basis: full-cov and diag models must produce the same radiance.
    _, batch, _, _ = dyn_model
    kwargs = dict(
        rays=batch["rays"],
        init_boxes=batch["init"],
        ext=batch["ext"],
        ts=batch["ts"],
        randomized=False,
        background="gray",
        alpha=4.0,
    )
    cfg_full = tiny_model_config(diag_covariance=False)
    cfg_diag = tiny_model_config(diag_covariance=True)
    model_f, variables = construct_model(jax.random.key(0), batch, cfg_full)
    model_d = MipNerf(cfg_diag)
    out_f = model_f.apply(variables, rng=jax.random.key(1), **kwargs)
    out_d = model_d.apply(variables, rng=jax.random.key(1), **kwargs)
    for lf, ld in zip(out_f, out_d):
        np.testing.assert_allclose(np.asarray(lf["rgb"]), np.asarray(ld["rgb"]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(lf["depth"]), np.asarray(ld["depth"]), atol=2e-5)


def test_fast_trig_matches_safe_trig(dyn_model):
    # Post-contraction encode inputs are bounded, so the unguarded trig path
    # must agree exactly with the safe one.
    _, batch, _, _ = dyn_model
    kwargs = dict(
        rays=batch["rays"], init_boxes=batch["init"], ext=batch["ext"], ts=batch["ts"],
        randomized=False, background="gray", alpha=4.0,
    )
    model_s, variables = construct_model(jax.random.key(0), batch, tiny_model_config())
    model_f = MipNerf(tiny_model_config(fast_trig=True))
    a = model_s.apply(variables, rng=jax.random.key(1), **kwargs)
    b = model_f.apply(variables, rng=jax.random.key(1), **kwargs)
    np.testing.assert_allclose(np.asarray(a[-1]["rgb"]), np.asarray(b[-1]["rgb"]), atol=1e-6)


def test_use_box_nearfar_concentrates_samples():
    # With use_box_nearfar, a box-hitting ray's samples stay inside
    # [z_in - margin, z_out + margin] clamped to the ray's near/far.
    cfg = tiny_model_config(contraction=False, use_box_nearfar=True, box_nearfar_margin=0.5)
    origins = jnp.asarray([[0.0, 0.0, 0.0]])
    dirs = jnp.asarray([[0.0, 0.0, -1.0]])
    ones = jnp.ones((1, 1))
    rays = Rays(
        origins=origins, directions=dirs, viewdirs=dirs, radii=ones * 0.01,
        lossmult=ones, near=ones * 0.1, far=ones * 20.0,
    )
    init = np.zeros((3, 2, 6), np.float32)
    init[:, 0, :3] = [0.0, 0.0, -5.0]
    init[:, 1, :3] = [100.0, 100.0, 100.0]
    batch = {"rays": rays, "init": jnp.asarray(init), "ext": jnp.ones((2, 3)), "ts": jnp.asarray(0)}
    model, variables = construct_model(jax.random.key(0), batch, cfg)
    out = model.apply(
        variables, rng=jax.random.key(1), rays=rays, init_boxes=batch["init"],
        ext=batch["ext"], ts=batch["ts"], randomized=False, background="gray", alpha=4.0,
    )
    t = np.asarray(out[0]["t_vals"][0])
    # box spans z in [-6, -4] -> ray hits at t in [4, 6]; margin 0.5.
    assert t.min() >= 4.0 - 0.5 - 1e-4
    assert t.max() <= 6.0 + 0.5 + 1e-4


def test_grid_sampling_dynamic_scene_uses_world_frame():
    # Regression for the grid/frame bug (round-1 VERDICT weak #4): the
    # occupancy grid lives in contracted WORLD space, so (a) probes must use
    # world rays, (b) box-hitting rays — whose t parameterization is
    # object-frame — must fall back to a uniform PDF, and (c) only
    # box-missing rays may contribute evidence to the grid update.
    from durf_tpu.ops import grid as gridops
    from durf_tpu import ops

    cfg = tiny_model_config(
        grid_sampling=True, grid_probes=64, grid_floor=1e-3, num_samples=32
    )
    # Ray 0 hits a box at z=-5; ray 1 misses every box (goes along +y).
    origins = jnp.zeros((2, 3))
    dirs = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])
    ones = jnp.ones((2, 1))
    rays = Rays(
        origins=origins, directions=dirs, viewdirs=dirs, radii=ones * 0.01,
        lossmult=ones, near=ones * 0.1, far=ones * 10.0,
    )
    init = np.zeros((3, 2, 6), np.float32)
    init[:, 0, :3] = [0.0, 0.0, -5.0]
    init[:, 1, :3] = [100.0, 100.0, 100.0]
    batch = {"rays": rays, "init": jnp.asarray(init), "ext": jnp.ones((2, 3)), "ts": jnp.asarray(0)}

    # World-frame grid occupied only around y in [4.5, 5.5] (ray 1's path).
    g = gridops.make_grid(64) * 0.0
    ys = np.linspace(4.5, 5.5, 64, dtype=np.float32)
    occ_pos = jnp.asarray(np.stack([np.zeros_like(ys), ys, np.zeros_like(ys)], -1))
    g = gridops.update(g, ops.contract(occ_pos), jnp.ones(len(ys)), decay=1.0)

    model, variables = construct_model(jax.random.key(0), batch, cfg)
    out = model.apply(
        variables, rng=jax.random.key(1), rays=rays, init_boxes=batch["init"],
        ext=batch["ext"], ts=batch["ts"], randomized=True, background="gray",
        alpha=4.0, grid=g,
    )
    t0 = np.asarray(out[0]["t_vals"][0])  # hit ray: uniform fallback
    t1 = np.asarray(out[0]["t_vals"][1])  # miss ray: grid-informed
    # Miss ray concentrates where the world grid is occupied (contraction
    # widens the band toward far; empty near space is culled).
    assert np.mean(t1 > 3.5) > 0.85
    # Hit ray spreads over the whole [near, far] range (uniform PDF).
    assert t0.min() < 1.5 and t0.max() > 8.0
    # Only the miss ray feeds the grid update.
    gw = np.asarray(out[-1]["grid_weights"])
    assert np.all(gw[0] == 0.0)
    assert gw[1].max() >= 0.0 and np.all(np.isfinite(gw[1]))


def test_bfloat16_compute_path(dyn_model):
    cfg0, batch, _, _ = dyn_model
    cfg = tiny_model_config(compute_dtype="bfloat16")
    model, variables = construct_model(jax.random.key(0), batch, cfg)
    out = model.apply(
        variables,
        rng=jax.random.key(1),
        rays=batch["rays"],
        init_boxes=batch["init"],
        ext=batch["ext"],
        ts=batch["ts"],
        randomized=False,
        background="gray",
        alpha=4.0,
    )
    rgb = out[-1]["rgb"]
    assert rgb.dtype == jnp.float32  # outputs come back fp32
    assert np.all(np.isfinite(np.asarray(rgb)))
    # Params stay fp32.
    k = variables["params"]["background_mlp"]["trunk_0"]["kernel"]
    assert k.dtype == jnp.float32


def test_recurrent_encode_matches_direct(dyn_model):
    # Model-level: recurrent_encode must reproduce the exact-IPE radiance to
    # bf16-level tolerance on the dynamic scene-graph path.
    _, batch, _, _ = dyn_model
    kwargs = dict(
        rays=batch["rays"], init_boxes=batch["init"], ext=batch["ext"], ts=batch["ts"],
        randomized=False, background="gray", alpha=2.5,
    )
    model_d, variables = construct_model(jax.random.key(0), batch, tiny_model_config())
    model_r = MipNerf(tiny_model_config(recurrent_encode=True))
    a = model_d.apply(variables, rng=jax.random.key(1), **kwargs)
    b = model_r.apply(variables, rng=jax.random.key(1), **kwargs)
    np.testing.assert_allclose(np.asarray(a[-1]["rgb"]), np.asarray(b[-1]["rgb"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a[-1]["depth"]), np.asarray(b[-1]["depth"]), atol=1e-3)


def test_remat_mlp_matches_plain(dyn_model):
    # remat_mlp recomputes the XLA-path trunk in the backward; values and
    # gradients must be identical to the stored-activation path.
    _, batch, _, _ = dyn_model
    kwargs = dict(
        rays=batch["rays"], init_boxes=batch["init"], ext=batch["ext"], ts=batch["ts"],
        randomized=False, background="gray", alpha=4.0,
    )
    model_p, variables = construct_model(jax.random.key(0), batch, tiny_model_config())
    model_r = MipNerf(tiny_model_config(remat_mlp=True))

    def loss(m):
        def f(v):
            out = m.apply(v, rng=jax.random.key(1), **kwargs)
            return jnp.mean(out[-1]["rgb"] ** 2)

        return f(variables), jax.grad(f)(variables)

    la, ga = loss(model_p)
    lb, gb = loss(model_r)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_masked_encode_constant_trick_bit_exact():
    """The model's per-object encode shortcut: windowed_ipe(hit*m, hit*cov)
    == hit*windowed_ipe(m, cov) + (1-hit)*windowed_ipe(0, 0) bit-for-bit for
    a 0/1 hit mask (models/mipnerf.py object branch)."""
    import jax.numpy as jnp
    import numpy as np

    from durf_tpu import ops

    rng = np.random.default_rng(3)
    b, s, n_obj = 6, 5, 2
    mean = jnp.asarray(rng.normal(size=(b, s, 3)), jnp.float32)
    cov = jnp.asarray(rng.uniform(0.0, 0.3, size=(b, s, 3)), jnp.float32)
    hit = jnp.asarray(rng.integers(0, 2, size=(b, n_obj)), jnp.float32)
    hit_s = hit.T[..., None, None]

    for recurrent in (False, True):
        kw = dict(min_deg=0, max_deg=6, alpha=4.5, diag=True, recurrent=recurrent)
        old = ops.windowed_ipe((hit_s * mean[None], hit_s * cov[None]), **kw)
        enc = ops.windowed_ipe((mean, cov), **kw)
        c0 = ops.windowed_ipe(
            (jnp.zeros((1, 1, 3)), jnp.zeros((1, 1, 3))), **kw
        )
        new = hit_s * enc[None] + (1.0 - hit_s) * c0[None]
        np.testing.assert_array_equal(np.asarray(old), np.asarray(new))


def test_coord_major_model_matches_row_major():
    """Full model forward: coord_major=True must match False to float tolerance."""
    import dataclasses

    from durf_tpu.models import construct_model
    from durf_tpu.data.synthetic import example_ray_batch
    from durf_tpu.configs import MLPConfig, ModelConfig

    batch = example_ray_batch(batch_size=16, n_obj=2, timesteps=3, seed=3)
    base = ModelConfig(
        num_samples=6,
        num_levels=2,
        max_deg_point=6,
        deg_view=2,
        num_objects=2,
        timesteps=3,
        density_noise=0.0,
        mlp=MLPConfig(net_depth=2, net_width=16, net_width_condition=8),
        box_mlp=MLPConfig(net_depth=2, net_width=8, net_width_condition=8),
    )
    outs = []
    for cm in (False, True):
        cfg = dataclasses.replace(base, coord_major=cm)
        model, variables = construct_model(jax.random.key(0), batch, cfg)
        out = model.apply(
            {"params": variables["params"]},
            rng=None,
            rays=batch["rays"],
            init_boxes=batch["init"],
            ext=batch["ext"],
            ts=batch["ts"],
            randomized=False,
            background="gray",
            alpha=5.0,
        )
        outs.append(out)
    for a, b in zip(outs[0], outs[1]):
        for k in ("rgb", "depth", "acc", "weights"):
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), atol=2e-5, rtol=1e-5
            )
