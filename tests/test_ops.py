"""Golden and invariant tests for durf_tpu.ops (frustum, encoding, sampling,
rendering, contraction, boxes) — coverage the reference lacks (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from durf_tpu import ops


# ---------------------------------------------------------------- frustum ---


def test_conical_frustum_stable_matches_exact_in_f64():
    # The stable algebra must agree with the exact closed form when evaluated
    # in high precision (reference mip.py:99-130).
    with jax.enable_x64(True):
        d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float64)
        t0 = jnp.asarray([[2.0]], jnp.float64)
        t1 = jnp.asarray([[3.0]], jnp.float64)
        r = jnp.asarray([[0.01]], jnp.float64)
        m_s, c_s = ops.conical_frustum_to_gaussian(d, t0, t1, r, diag=False, stable=True)
        m_e, c_e = ops.conical_frustum_to_gaussian(d, t0, t1, r, diag=False, stable=False)
        np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_e), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(c_s), np.asarray(c_e), rtol=1e-7, atol=1e-12)


def test_cast_rays_shapes_and_mean_position():
    B, S = 4, 8
    origins = jnp.ones((B, 3))
    directions = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (B, 1))
    radii = jnp.full((B, 1), 0.01)
    t_vals = jnp.broadcast_to(jnp.linspace(1.0, 5.0, S + 1), (B, S + 1))
    means, covs = ops.cast_rays(t_vals, origins, directions, radii, "cone")
    assert means.shape == (B, S, 3)
    assert covs.shape == (B, S, 3, 3)
    # Mean z position sits inside each frustum interval.
    z = np.asarray(means[..., 2])
    t0, t1 = np.asarray(t_vals[:, :-1]), np.asarray(t_vals[:, 1:])
    assert np.all(z > 1.0 + t0) and np.all(z < 1.0 + t1)


def test_lift_gaussian_diag_equals_full_diagonal():
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    t_mean = jnp.asarray(rng.uniform(1, 5, size=(5, 7)), jnp.float32)
    t_var = jnp.asarray(rng.uniform(0.01, 0.1, size=(5, 7)), jnp.float32)
    r_var = jnp.asarray(rng.uniform(0.001, 0.01, size=(5, 7)), jnp.float32)
    m_d, c_d = ops.lift_gaussian(d, t_mean, t_var, r_var, diag=True)
    m_f, c_f = ops.lift_gaussian(d, t_mean, t_var, r_var, diag=False)
    np.testing.assert_allclose(np.asarray(m_d), np.asarray(m_f), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(c_d), np.asarray(jnp.diagonal(c_f, axis1=-2, axis2=-1)), rtol=1e-5
    )


# --------------------------------------------------------------- encoding ---


def test_pos_enc_golden():
    x = jnp.asarray([[0.5, -0.25, 1.0]])
    enc = ops.pos_enc(x, 0, 2, append_identity=False)
    expected = np.concatenate(
        [
            np.sin([0.5, -0.25, 1.0, 1.0, -0.5, 2.0]),
            np.cos([0.5, -0.25, 1.0, 1.0, -0.5, 2.0]),
        ]
    )
    np.testing.assert_allclose(np.asarray(enc[0]), expected, atol=1e-6)


def test_ipe_zero_variance_equals_pos_enc():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 6, 3)), jnp.float32)
    zero_cov = jnp.zeros((4, 6, 3, 3), jnp.float32)
    ipe = ops.integrated_pos_enc((x, zero_cov), 0, 4)
    pe = ops.pos_enc(x, 0, 4, append_identity=False)
    np.testing.assert_allclose(np.asarray(ipe), np.asarray(pe), atol=1e-5)


def test_ipe_diag_matches_full():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 5, 3)), jnp.float32)
    var = jnp.asarray(rng.uniform(0.01, 0.2, size=(2, 5, 3)), jnp.float32)
    cov = jax.vmap(jax.vmap(jnp.diag))(var)
    full = ops.integrated_pos_enc((x, cov), 0, 3, diag=False)
    diag = ops.integrated_pos_enc((x, var), 0, 3, diag=True)
    np.testing.assert_allclose(np.asarray(full), np.asarray(diag), atol=1e-5)


def test_ipe_large_variance_shrinks_to_zero():
    x = jnp.ones((1, 1, 3))
    cov = 1e6 * jnp.broadcast_to(jnp.eye(3), (1, 1, 3, 3))
    ipe = ops.integrated_pos_enc((x, cov), 0, 4)
    np.testing.assert_allclose(np.asarray(ipe), 0.0, atol=1e-6)


def test_windowed_ipe_alpha_full_equals_plain_ipe_with_identity():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 4, 3)), jnp.float32)
    cov = jnp.broadcast_to(0.01 * jnp.eye(3), (2, 4, 3, 3))
    w = ops.windowed_ipe((x, cov), 0, 5, alpha=5.0)
    plain = ops.integrated_pos_enc((x, cov), 0, 5)
    np.testing.assert_allclose(np.asarray(w), np.asarray(jnp.concatenate([x, plain], -1)), atol=1e-6)


def test_windowed_ipe_alpha_zero_kills_all_frequencies():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 4, 3)), jnp.float32)
    cov = jnp.broadcast_to(0.01 * jnp.eye(3), (2, 4, 3, 3))
    w = ops.windowed_ipe((x, cov), 0, 5, alpha=0.0)
    np.testing.assert_allclose(np.asarray(w[..., 3:]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(w[..., :3]), np.asarray(x))


def test_windowed_pe_partial_alpha_window_alignment():
    # alpha = 1.5 -> deg 0 fully on, deg 1 at (1-cos(0.5*pi))/2 = 0.5, rest 0.
    x = jnp.asarray([[0.3, 0.7, -0.2]])
    w = ops.windowed_pos_enc(x, 0, 3, alpha=1.5, append_identity=False)
    full = ops.pos_enc(x, 0, 3, append_identity=False)
    expect_w = np.concatenate([np.repeat([1.0, 0.5, 0.0], 3)] * 2)
    np.testing.assert_allclose(np.asarray(w[0]), expect_w * np.asarray(full[0]), atol=1e-6)


def test_expected_sin_moments():
    # Monte-Carlo check of E[sin z], z ~ N(mu, var).
    rng = np.random.default_rng(5)
    mu, var = 0.7, 0.3
    z = rng.normal(mu, np.sqrt(var), size=2_000_000)
    y, y_var = ops.expected_sin(jnp.asarray(mu), jnp.asarray(var))
    np.testing.assert_allclose(float(y), np.sin(z).mean(), atol=2e-3)
    np.testing.assert_allclose(float(y_var), np.sin(z).var(), atol=2e-3)


def test_gaussian_fourier_enc_shapes_and_range():
    from durf_tpu.ops.encoding import gaussian_fourier_enc

    x = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)), jnp.float32)
    f = gaussian_fourier_enc(x, scale=4.0, key=jax.random.key(0), num_features=8)
    assert f.shape == (5, 16)
    assert np.all(np.abs(np.asarray(f)) <= 1.0)


def test_rotate_yaw_and_box_to_world_roundtrip():
    from durf_tpu.ops.boxes import box_to_world_frames, rotate_yaw

    p = jnp.asarray([[1.0, 2.0, 0.0]])
    # yaw by 90°: x -> -z component mapping per the NSG convention
    r = np.asarray(rotate_yaw(p, jnp.asarray([np.pi / 2])))
    np.testing.assert_allclose(r[0], [0.0, 2.0, -1.0], atol=1e-6)

    rotvec = jnp.asarray([[0.3, -0.2, 0.5]])
    rot = ops.axis_angle_to_matrix(rotvec)
    pos = jnp.asarray([[1.0, -2.0, 3.0]])
    pts = jnp.asarray([[0.5, 0.25, -0.75]])
    obj = ops.rotate_vec(rot, pts - pos)
    back = box_to_world_frames(obj, pos, rot)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


# --------------------------------------------------------------- sampling ---


def test_sample_along_rays_bounds_and_shapes():
    B, S = 6, 16
    key = jax.random.key(0)
    origins = jnp.zeros((B, 3))
    directions = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (B, 1))
    radii = jnp.full((B, 1), 0.01)
    near = jnp.full((B, 1), 1.0)
    far = jnp.full((B, 1), 8.0)
    t_vals, (means, covs) = ops.sample_along_rays(
        key, origins, directions, radii, S, near, far, True, False, "cone"
    )
    assert t_vals.shape == (B, S + 1)
    assert means.shape == (B, S, 3)
    t = np.asarray(t_vals)
    assert np.all(t >= 1.0 - 1e-5) and np.all(t <= 8.0 + 1e-5)
    assert np.all(np.diff(t, axis=-1) > 0)


def test_sample_along_rays_deterministic():
    B, S = 2, 4
    args = (
        jnp.zeros((B, 3)),
        jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (B, 1)),
        jnp.full((B, 1), 0.01),
        S,
        jnp.full((B, 1), 2.0),
        jnp.full((B, 1), 6.0),
    )
    t_vals, _ = ops.sample_along_rays(jax.random.key(0), *args, False, False, "cone")
    np.testing.assert_allclose(np.asarray(t_vals[0]), np.linspace(2.0, 6.0, S + 1), atol=1e-6)


def test_resample_concentrates_where_weights_are():
    B, S = 1, 32
    key = jax.random.key(1)
    origins = jnp.zeros((B, 3))
    directions = jnp.asarray([[0.0, 0.0, 1.0]])
    radii = jnp.full((B, 1), 0.01)
    t_vals = jnp.broadcast_to(jnp.linspace(0.0, 1.0, S + 1), (B, S + 1))
    weights = jnp.zeros((B, S)).at[:, 16].set(1.0)
    new_t, _ = ops.resample_along_rays(
        key, origins, directions, radii, t_vals, weights, True, "cone", True, 0.0
    )
    frac_inside = np.mean((np.asarray(new_t[0]) > 14 / 32) & (np.asarray(new_t[0]) < 19 / 32))
    assert frac_inside > 0.8  # blurpool spreads slightly beyond the spike


# ---------------------------------------------------------------- render ----


def _ray_setup(B=4, S=8):
    t_vals = jnp.broadcast_to(jnp.linspace(1.0, 2.0, S + 1), (B, S + 1))
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (B, 1))
    return t_vals, dirs


def test_volumetric_rendering_opaque_slab():
    B, S = 4, 8
    t_vals, dirs = _ray_setup(B, S)
    rgb = jnp.broadcast_to(jnp.asarray([1.0, 0.5, 0.25]), (B, S, 3))
    density = jnp.full((B, S, 1), 1e4)
    comp, depth, acc, weights, *_ = ops.volumetric_rendering(rgb, density, t_vals, dirs, "black")
    np.testing.assert_allclose(np.asarray(acc), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(comp), np.asarray(rgb[:, 0]), atol=1e-4)
    # Everything terminates in the first interval.
    np.testing.assert_allclose(np.asarray(depth), float(t_vals[0, :2].mean()), atol=1e-3)


def test_volumetric_rendering_empty_space_backgrounds():
    B, S = 2, 8
    t_vals, dirs = _ray_setup(B, S)
    rgb = jnp.zeros((B, S, 3))
    density = jnp.zeros((B, S, 1))
    for background, expected in [("white", 1.0), ("gray", 0.5), ("black", 0.0)]:
        comp, _, acc, *_ = ops.volumetric_rendering(rgb, density, t_vals, dirs, background)
        np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(comp), expected, atol=1e-6)
    comp, *_ = ops.volumetric_rendering(rgb, density, t_vals, dirs, "random", key=jax.random.key(0))
    c = np.asarray(comp)
    assert np.all(c >= 0) and np.all(c <= 1)
    # all rays share the one random background color
    np.testing.assert_allclose(c[0], c[1])


def test_weights_sum_to_one_minus_transmittance():
    rng = np.random.default_rng(7)
    B, S = 3, 16
    t_vals, dirs = _ray_setup(B, S)
    density = jnp.asarray(rng.uniform(0, 3, size=(B, S, 1)), jnp.float32)
    rgb = jnp.zeros((B, S, 3))
    _, _, acc, weights, *_ = ops.volumetric_rendering(rgb, density, t_vals, dirs, "black")
    dd = np.asarray(density[..., 0]) * np.asarray(t_vals[:, 1:] - t_vals[:, :-1])
    expected_acc = 1 - np.exp(-dd.sum(-1))
    np.testing.assert_allclose(np.asarray(acc), expected_acc, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(weights.sum(-1)), expected_acc, rtol=1e-4)


def test_volumetric_density_matches_rendering_weights():
    rng = np.random.default_rng(8)
    B, S = 3, 8
    t_vals, dirs = _ray_setup(B, S)
    density = jnp.asarray(rng.uniform(0, 2, size=(B, S, 1)), jnp.float32)
    rgb = jnp.zeros((B, S, 3))
    _, depth_r, _, weights_r, *_ = ops.volumetric_rendering(rgb, density, t_vals, dirs, "black")
    weights_d, depth_d, _, t_mids, _ = ops.volumetric_density(density, t_vals, dirs)
    np.testing.assert_allclose(np.asarray(weights_d), np.asarray(weights_r), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(depth_d), np.asarray(depth_r), rtol=1e-6)
    assert t_mids.shape == (B, S + 1)


# ------------------------------------------------------------ contraction ---


def test_contract_identity_inside_threshold():
    x = jnp.asarray([[0.05, 0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(ops.contract(x)), np.asarray(x), atol=1e-7)


def test_contract_norm_bounded_by_two():
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(1000, 3)) * 100, jnp.float32)
    n = np.linalg.norm(np.asarray(ops.contract(x)), axis=-1)
    assert np.all(n < 2.0)
    # direction preserved
    big = jnp.asarray([[100.0, 0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(ops.contract(big)), [[2.0 - 0.01, 0.0, 0.0]], atol=1e-4)


def test_contract_gaussian_matches_reference_formula():
    # Cross-check the jvp-based D Σ Dᵀ against an explicit jacfwd row-sum diag.
    rng = np.random.default_rng(10)
    mean = jnp.asarray(rng.normal(size=(2, 4, 3)) * 3, jnp.float32)
    cov = jnp.broadcast_to(0.01 * jnp.eye(3), (2, 4, 3, 3))
    mc, cc = ops.contract_gaussian(mean, cov)
    np.testing.assert_allclose(np.asarray(mc), np.asarray(ops.contract(mean)), atol=1e-6)

    J = jax.jacfwd(lambda m: ops.contract(m))(mean[0, 0])  # [3, 3]
    d = np.asarray(J).sum(axis=-1)  # J @ ones
    expected = d[:, None] * np.asarray(cov[0, 0]) * d[None, :]
    np.testing.assert_allclose(np.asarray(cc[0, 0]), expected, rtol=1e-4, atol=1e-8)


# ------------------------------------------------------------------ boxes ---


def test_axis_angle_roundtrip_with_scipy():
    from scipy.spatial.transform import Rotation as R

    rng = np.random.default_rng(11)
    rotvec = rng.normal(size=(10, 3)).astype(np.float32)
    ours = np.asarray(ops.axis_angle_to_matrix(jnp.asarray(rotvec)))
    theirs = R.from_rotvec(rotvec).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_axis_angle_zero_is_identity():
    m = np.asarray(ops.axis_angle_to_matrix(jnp.zeros((1, 3))))
    np.testing.assert_allclose(m[0], np.eye(3), atol=1e-5)


def test_ray_box_intersection_hit_and_miss():
    # Ray along +z from origin; box centered at (0, 0, 5) with extent 1.
    ray_o = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 10.0, 0.0]])
    ray_d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    aabb_min = jnp.asarray([[-1.0, -1.0, 4.0]] * 2)
    aabb_max = jnp.asarray([[1.0, 1.0, 6.0]] * 2)
    z_in, z_out, hit = ops.ray_box_intersection(ray_o, ray_d, aabb_min, aabb_max)
    np.testing.assert_allclose(np.asarray(hit), [1.0, 0.0])
    np.testing.assert_allclose(float(z_in[0]), 4.0, atol=1e-5)
    np.testing.assert_allclose(float(z_out[0]), 6.0, atol=1e-5)


def test_ray_box_intersection_behind_origin_is_miss():
    ray_o = jnp.asarray([[0.0, 0.0, 10.0]])
    ray_d = jnp.asarray([[0.0, 0.0, 1.0]])
    aabb_min = jnp.asarray([[-1.0, -1.0, 4.0]])
    aabb_max = jnp.asarray([[1.0, 1.0, 6.0]])
    _, _, hit = ops.ray_box_intersection(ray_o, ray_d, aabb_min, aabb_max)
    np.testing.assert_allclose(np.asarray(hit), [0.0])


def test_ray_box_intersection_axis_parallel_miss_is_finite():
    # Regression: dy == 0 makes the y-slab times ±inf; a miss must return
    # finite zeros, not inf * 0 = NaN (latent in reference box_helpers.py:101).
    ray_o = jnp.asarray([[0.0, 2.0, 0.0]])
    ray_d = jnp.asarray([[0.0, 0.0, 1.0]])
    z_in, z_out, hit = ops.ray_box_intersection(
        ray_o, ray_d, jnp.asarray([[-1.0, -1.0, 4.0]]), jnp.asarray([[1.0, 1.0, 6.0]])
    )
    np.testing.assert_allclose(np.asarray(hit), [0.0])
    assert np.all(np.isfinite(np.asarray(z_in))) and np.all(np.isfinite(np.asarray(z_out)))
    np.testing.assert_allclose(np.asarray(z_out), [0.0])


def test_ray_box_intersection_origin_inside_box():
    ray_o = jnp.asarray([[0.0, 0.0, 5.0]])
    ray_d = jnp.asarray([[0.0, 0.0, 1.0]])
    aabb_min = jnp.asarray([[-1.0, -1.0, 4.0]])
    aabb_max = jnp.asarray([[1.0, 1.0, 6.0]])
    z_in, z_out, hit = ops.ray_box_intersection(ray_o, ray_d, aabb_min, aabb_max)
    np.testing.assert_allclose(np.asarray(hit), [1.0])
    np.testing.assert_allclose(float(z_out[0]), 1.0, atol=1e-5)


def test_world_to_box_frames_translation_and_rotation():
    # Box at (2, 0, 0) rotated 90° about +y (world->object).
    rotvec = jnp.asarray([[[0.0, np.pi / 2, 0.0]]])
    rot = ops.axis_angle_to_matrix(rotvec)  # [1, 1, 3, 3]
    origins = jnp.asarray([[3.0, 0.0, 0.0]])
    dirs = jnp.asarray([[0.0, 0.0, 2.0]])  # non-unit on purpose
    box_pos = jnp.asarray([[[2.0, 0.0, 0.0]]])
    o_o, d_o = ops.world_to_box_frames(origins, dirs, box_pos, rot)
    # World offset (1,0,0) rotated by Ry(90°): x->-z.
    np.testing.assert_allclose(np.asarray(o_o[0, 0]), [0.0, 0.0, -1.0], atol=1e-5)
    # Direction is unit-normalized: z->x under Ry(90°).
    np.testing.assert_allclose(np.asarray(d_o[0, 0]), [1.0, 0.0, 0.0], atol=1e-5)


def test_recurrent_ipe_matches_direct():
    # The double-angle/repeated-squaring IPE must equal the direct form up to
    # fp32 recurrence rounding (~2^k ulps at degree k) over the contracted
    # domain (|x| <= 2) and realistic variances.
    from durf_tpu.ops import encoding

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-2, 2, size=(128, 3)), jnp.float32)
    v = jnp.asarray(rng.uniform(0, 0.5, size=(128, 3)) ** 2, jnp.float32)
    for min_deg, max_deg in [(0, 10), (0, 4), (2, 8)]:
        direct = encoding.integrated_pos_enc((x, v), min_deg, max_deg, diag=True, safe=False)
        rec = encoding.integrated_pos_enc(
            (x, v), min_deg, max_deg, diag=True, recurrent=True
        )
        assert rec.shape == direct.shape
        np.testing.assert_allclose(np.asarray(rec), np.asarray(direct), atol=3e-4)

    # windowed variant, mid-anneal alpha (non-trivial window).
    wd = encoding.windowed_ipe((x, v), 0, 10, 5.5, diag=True, safe=False)
    wr = encoding.windowed_ipe((x, v), 0, 10, 5.5, diag=True, recurrent=True)
    np.testing.assert_allclose(np.asarray(wr), np.asarray(wd), atol=3e-4)

    # Gradients flow and agree (the recurrence has a very different autodiff
    # graph — this is the property the training path depends on).
    f_direct = lambda a, b: jnp.sum(
        encoding.integrated_pos_enc((a, b), 0, 10, diag=True, safe=False) ** 2
    )
    f_rec = lambda a, b: jnp.sum(
        encoding.integrated_pos_enc((a, b), 0, 10, diag=True, recurrent=True) ** 2
    )
    gx_d, gv_d = jax.grad(f_direct, argnums=(0, 1))(x, v)
    gx_r, gv_r = jax.grad(f_rec, argnums=(0, 1))(x, v)
    np.testing.assert_allclose(np.asarray(gx_r), np.asarray(gx_d), rtol=1e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(gv_r), np.asarray(gv_d), rtol=1e-3, atol=2e-2)


class TestCoordinateMajor:
    """The [3, B, S] coordinate-major pipeline must match row-major exactly."""

    def _rays(self, b=7, s=9, seed=11):
        rng = np.random.default_rng(seed)
        t_vals = np.sort(rng.uniform(0.5, 20.0, size=(b, s + 1)), axis=-1).astype(np.float32)
        origins = rng.normal(size=(b, 3)).astype(np.float32)
        dirs = rng.normal(size=(b, 3)).astype(np.float32)
        radii = rng.uniform(0.001, 0.05, size=(b, 1)).astype(np.float32)
        return t_vals, origins, dirs, radii

    def test_cast_rays_cm_matches_row_major(self):
        t_vals, origins, dirs, radii = self._rays()
        for shape in ("cone", "cylinder"):
            m, c = ops.cast_rays(t_vals, origins, dirs, radii, shape, diag=True)
            mt, ct = ops.cast_rays_cm(t_vals, origins, dirs, radii, shape)
            np.testing.assert_array_equal(np.moveaxis(np.asarray(mt), 0, -1), np.asarray(m))
            np.testing.assert_array_equal(np.moveaxis(np.asarray(ct), 0, -1), np.asarray(c))

    def test_contract_gaussian_diag_axis0(self):
        rng = np.random.default_rng(5)
        mean = rng.normal(scale=3.0, size=(6, 4, 3)).astype(np.float32)
        var = rng.uniform(0, 0.5, size=(6, 4, 3)).astype(np.float32)
        m, v = ops.contract_gaussian_diag(jnp.asarray(mean), jnp.asarray(var))
        mt, vt = ops.contract_gaussian_diag(
            jnp.moveaxis(jnp.asarray(mean), -1, 0), jnp.moveaxis(jnp.asarray(var), -1, 0), axis=0
        )
        np.testing.assert_array_equal(np.moveaxis(np.asarray(mt), 0, -1), np.asarray(m))
        np.testing.assert_array_equal(np.moveaxis(np.asarray(vt), 0, -1), np.asarray(v))

    def test_ipe_cm_matches_row_major(self):
        rng = np.random.default_rng(7)
        mean = rng.normal(size=(5, 6, 3)).astype(np.float32)
        var = rng.uniform(0, 0.4, size=(5, 6, 3)).astype(np.float32)
        mt = jnp.moveaxis(jnp.asarray(mean), -1, 0)
        vt = jnp.moveaxis(jnp.asarray(var), -1, 0)
        for recurrent in (False, True):
            row = ops.integrated_pos_enc(
                (jnp.asarray(mean), jnp.asarray(var)), 0, 6, diag=True, recurrent=recurrent
            )
            colm = ops.integrated_pos_enc_cm(mt, vt, 0, 6, recurrent=recurrent)
            np.testing.assert_allclose(
                np.moveaxis(np.asarray(colm), 0, -1), np.asarray(row), atol=1e-6
            )

    def test_windowed_ipe_cm_matches_row_major(self):
        rng = np.random.default_rng(9)
        mean = rng.normal(size=(4, 5, 3)).astype(np.float32)
        var = rng.uniform(0, 0.4, size=(4, 5, 3)).astype(np.float32)
        mt = jnp.moveaxis(jnp.asarray(mean), -1, 0)
        vt = jnp.moveaxis(jnp.asarray(var), -1, 0)
        for alpha in (2.5, 10.0):
            for recurrent in (False, True):
                row = ops.windowed_ipe(
                    (jnp.asarray(mean), jnp.asarray(var)), 0, 6, alpha, diag=True,
                    recurrent=recurrent,
                )
                colm = ops.windowed_ipe_cm(mt, vt, 0, 6, alpha, recurrent=recurrent)
                np.testing.assert_allclose(
                    np.moveaxis(np.asarray(colm), 0, -1), np.asarray(row), atol=1e-6
                )
