"""Numerical parity against the reference implementation itself.

These tests import the reference's own jax code (mounted read-only at
/root/reference) and compare it with durf_tpu on identical random inputs —
the strongest possible behavior check, run only where the reference exists.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "internal")),
    reason="reference implementation not mounted",
)

if os.path.isdir(os.path.join(REFERENCE, "internal")):
    sys.path.insert(0, REFERENCE)
    from internal import box_helpers as ref_box
    from internal import math as ref_math
    from internal import mip as ref_mip
    from internal import mip360 as ref_mip360

from durf_tpu import mathx, ops


def test_sorted_piecewise_constant_pdf_parity():
    rng = np.random.default_rng(0)
    bins = jnp.asarray(np.sort(rng.uniform(0, 10, size=(8, 17)), axis=-1), jnp.float32)
    weights = jnp.asarray(rng.uniform(0, 1, size=(8, 16)), jnp.float32)
    for randomized in (False, True):
        key = jax.random.PRNGKey(3)
        ours = mathx.sorted_piecewise_constant_pdf(key, bins, weights, 32, randomized)
        theirs = ref_math.sorted_piecewise_constant_pdf(key, bins, weights, 32, randomized)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs), atol=1e-6)


def test_schedules_parity():
    for step in (0, 100, 5000, 200_000):
        np.testing.assert_allclose(
            float(mathx.log_lerp_decay(step, 5e-4, 5e-6, 200_000, 2500, 0.01)),
            float(ref_math.learning_rate_decay(step, 5e-4, 5e-6, 200_000, 2500, 0.01)),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            float(mathx.freq_alpha_schedule(step, 2.0, 10.0, 100, 50_000)),
            float(ref_math.freq_alpha_rate(step, 2.0, 10.0, 100, 50_000)),
            rtol=1e-6,
        )


def test_ssim_parity():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(size=(32, 32, 3)), jnp.float32)
    b = jnp.asarray(np.clip(np.asarray(a) + rng.normal(scale=0.05, size=(32, 32, 3)), 0, 1), jnp.float32)
    np.testing.assert_allclose(
        float(mathx.compute_ssim(a, b, max_val=1.0)),
        float(ref_math.compute_ssim(a, b, max_val=1.0)),
        atol=1e-5,
    )


def _rays(n=16, seed=2):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.3
    o = (rng.normal(size=(n, 3)) * 0.2).astype(np.float32)
    r = np.full((n, 1), 0.01, np.float32)
    return jnp.asarray(o), jnp.asarray(d), jnp.asarray(r)


def test_sampling_and_cast_parity():
    o, d, r = _rays()
    near = jnp.full((16, 1), 0.3)
    far = jnp.full((16, 1), 8.0)
    key = jax.random.PRNGKey(0)
    t_ours, (m_ours, c_ours) = ops.sample_along_rays(
        key, o, d, r, 24, near, far, True, False, "cone"
    )
    t_ref, (m_ref, c_ref) = ref_mip.sample_along_rays(
        key, o, d, r, 24, near, far, True, False, "cone"
    )
    np.testing.assert_allclose(np.asarray(t_ours), np.asarray(t_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m_ours), np.asarray(m_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_ours), np.asarray(c_ref), atol=1e-6)


def test_resample_parity():
    o, d, r = _rays()
    t_vals = jnp.broadcast_to(jnp.linspace(0.3, 8.0, 25), (16, 25))
    rng = np.random.default_rng(3)
    weights = jnp.asarray(rng.uniform(0, 1, size=(16, 24)), jnp.float32)
    key = jax.random.PRNGKey(1)
    t_ours, (m_ours, _) = ops.resample_along_rays(
        key, o, d, r, t_vals, weights, True, "cone", True, 0.01
    )
    t_ref, (m_ref, _) = ref_mip.resample_along_rays(
        key, o, d, r, t_vals, weights, True, "cone", True, 0.01
    )
    np.testing.assert_allclose(np.asarray(t_ours), np.asarray(t_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m_ours), np.asarray(m_ref), atol=1e-5)


def test_ipe_parity():
    rng = np.random.default_rng(4)
    mean = jnp.asarray(rng.normal(size=(4, 8, 3)), jnp.float32)
    # Well-conditioned PSD covariance: A Aᵀ + eps I. (With an indefinite or
    # borderline cov the reference explodes to inf — exp(+|y_var|) — where we
    # clamp; see docs/DEFECTS.md #10.)
    a = rng.normal(size=(4, 8, 3, 3)) * 0.1
    cov = jnp.asarray(a @ a.transpose(0, 1, 3, 2) + 1e-4 * np.eye(3), jnp.float32)
    ours = ops.integrated_pos_enc((mean, cov), 0, 10)
    theirs = ref_mip.integrated_pos_enc((mean, cov), 0, 10)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs), atol=1e-5)


def test_pos_enc_parity():
    rng = np.random.default_rng(5)
    v = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(ops.pos_enc(v, 0, 4, True)),
        np.asarray(ref_mip.pos_enc(v, 0, 4, True)),
        atol=1e-6,
    )


def test_expected_sin_parity():
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(6, 8)) * 5, jnp.float32)
    var = jnp.asarray(rng.uniform(0, 2, size=(6, 8)), jnp.float32)
    y_o, v_o = ops.expected_sin(x, var)
    y_r, v_r = ref_mip.expected_sin(x, var)
    np.testing.assert_allclose(np.asarray(y_o), np.asarray(y_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_o), np.asarray(v_r), atol=1e-6)


def test_windowed_ipe_parity_at_full_alpha():
    # At alpha == max_deg the BARF window is all-ones, where our layout fix
    # (DEFECTS.md #11) is inert — the outputs must match the reference.
    rng = np.random.default_rng(10)
    mean = jnp.asarray(rng.normal(size=(4, 8, 3)), jnp.float32)
    a = rng.normal(size=(4, 8, 3, 3)) * 0.1
    cov = jnp.asarray(a @ a.transpose(0, 1, 3, 2) + 1e-4 * np.eye(3), jnp.float32)
    ours = ops.windowed_ipe((mean, cov), 0, 10, alpha=10.0)
    theirs = ref_mip.weighted_ipe((mean, cov), 0, 10, alpha=10.0)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs), atol=1e-5)


def test_volumetric_rendering_parity():
    rng = np.random.default_rng(6)
    B, S = 8, 16
    rgb = jnp.asarray(rng.uniform(size=(B, S, 3)), jnp.float32)
    density = jnp.asarray(rng.uniform(0, 3, size=(B, S, 1)), jnp.float32)
    t_vals = jnp.broadcast_to(jnp.linspace(0.5, 6.0, S + 1), (B, S + 1))
    _, d, _ = _rays(B)
    comp, depth, acc, weights, *_ = ops.volumetric_rendering(
        rgb, density, t_vals, d, background="gray"
    )
    comp_r, depth_r, acc_r, weights_r, *_ = ref_mip.volumetric_rendering(
        rgb, density, t_vals, d, white_bkgd=False, rand_bkgd=False, key=None
    )
    np.testing.assert_allclose(np.asarray(comp), np.asarray(comp_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(depth_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(weights), np.asarray(weights_r), atol=1e-6)


def test_contraction_parity():
    rng = np.random.default_rng(7)
    mean = jnp.asarray(rng.normal(size=(4, 8, 3)) * 3, jnp.float32)
    cov = jnp.broadcast_to(0.01 * jnp.eye(3), (4, 8, 3, 3)).astype(jnp.float32)
    m_ours = ops.contract(mean)
    m_ref = ref_mip360.contract(mean)
    np.testing.assert_allclose(np.asarray(m_ours), np.asarray(m_ref), atol=1e-5)
    mc_ours, cc_ours = ops.contract_gaussian(mean, cov)
    mc_ref, cc_ref = ref_mip360.new_space((mean, cov))
    np.testing.assert_allclose(np.asarray(mc_ours), np.asarray(mc_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cc_ours), np.asarray(cc_ref), atol=1e-5)


def test_box_transform_and_intersection_parity():
    rng = np.random.default_rng(8)
    B, O = 12, 2
    o = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)
    pose = jnp.asarray(rng.normal(size=(B, O, 3)), jnp.float32)
    rotvec = jnp.asarray(rng.normal(size=(O, 3)) * 0.5, jnp.float32)
    mat_ref = ref_box.aa2matrix(rotvec)
    mat_ours = ops.axis_angle_to_matrix(rotvec)
    np.testing.assert_allclose(np.asarray(mat_ours), np.asarray(mat_ref), atol=1e-5)

    mat_b = jnp.broadcast_to(mat_ours, (B, O, 3, 3))
    oo_ref, do_ref = ref_box.world2object_rpy(o, d, pose, mat_b)
    oo_ours, do_ours = ops.world_to_box_frames(o, d, pose, mat_b)
    np.testing.assert_allclose(np.asarray(oo_ours), np.asarray(oo_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(do_ours), np.asarray(do_ref), atol=1e-5)

    ext = jnp.asarray(np.abs(rng.normal(size=(B, O, 3))) + 0.3, jnp.float32)
    zi_r, zo_r, hit_r = ref_box.ray_box_intersection(oo_ref, do_ref, -ext, ext)
    zi_o, zo_o, hit_o = ops.ray_box_intersection(oo_ours, do_ours, -ext, ext)
    np.testing.assert_allclose(np.asarray(hit_o), np.asarray(hit_r).astype(np.float32))
    # z values agree on hits (the reference produces NaN/inf on some misses).
    hit = np.asarray(hit_o) > 0
    np.testing.assert_allclose(np.asarray(zi_o)[hit], np.asarray(zi_r)[hit], atol=1e-4)
    np.testing.assert_allclose(np.asarray(zo_o)[hit], np.asarray(zo_r)[hit], atol=1e-4)
