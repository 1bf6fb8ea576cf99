"""Fused Pallas MLP kernel vs the flax NerfMLP (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from durf_tpu.configs import MLPConfig
from durf_tpu.models.mlp import NerfMLP
from durf_tpu.ops.pallas.fused_mlp import (
    _forward_tile,
    _forward_tile_ref_semantics,
    fused_nerf_mlp,
    mlp_params_from_flax,
)


@pytest.fixture(scope="module")
def setup():
    cfg = MLPConfig(net_depth=8, net_width=64, net_width_condition=32)
    rng = np.random.default_rng(0)
    n, f_in, f_c = 96, 63, 27
    x = jnp.asarray(rng.normal(size=(n, f_in)), jnp.float32)
    cond = jnp.asarray(rng.normal(size=(n, f_c)), jnp.float32)
    # flax module with the same config; bf16 compute to match the kernel.
    mlp = NerfMLP(cfg, compute_dtype=jnp.bfloat16)
    variables = mlp.init(jax.random.key(0), x[:, None, :], cond)
    weights = mlp_params_from_flax(variables["params"], cfg)
    return cfg, x, cond, mlp, variables, weights


def test_split_matmul_matches_real_concat(setup):
    cfg, x, cond, mlp, variables, weights = setup
    a = _forward_tile(cfg, x.shape[-1], x, cond, weights)
    b = _forward_tile_ref_semantics(cfg, x.shape[-1], x, cond, weights)
    # Split (x@W1 + c@W2) vs concat ([x,c]@W) differ in bf16 summation order;
    # through 8 relu layers a near-zero pre-activation can flip, so a few
    # elements drift by O(1e-3) — that IS bf16-equal for this depth.
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), atol=5e-3)


def test_kernel_matches_flax_mlp(setup):
    cfg, x, cond, mlp, variables, weights = setup
    rgb_k, den_k = fused_nerf_mlp(x, cond, weights, cfg, 32, True)
    # flax path works on [B, S, F]: use one "ray" with N samples.
    rgb_f, den_f = mlp.apply(variables, x[None], cond[:1])
    # cond differs per sample in the kernel; rebuild flax comparison with the
    # sample axis as the batch axis and S=1 so each sample gets its own cond.
    rgb_f, den_f = mlp.apply(variables, x[:, None, :], cond)
    np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_f[:, 0]), atol=2e-2)
    np.testing.assert_allclose(np.asarray(den_k), np.asarray(den_f[:, 0]), atol=2e-2)


def test_kernel_handles_padding(setup):
    cfg, x, cond, mlp, variables, weights = setup
    # 96 samples with tile 64 -> padded to 128; outputs must be exact length.
    rgb, den = fused_nerf_mlp(x, cond, weights, cfg, 64, True)
    assert rgb.shape == (96, 3) and den.shape == (96, 1)
    rgb32, _ = fused_nerf_mlp(x, cond, weights, cfg, 32, True)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb32), atol=1e-5)


def test_kernel_gradients_match_flax(setup):
    cfg, x, cond, mlp, variables, weights = setup

    def loss_kernel(w, x_, c_):
        rgb, den = fused_nerf_mlp(x_, c_, w, cfg, 32, True)
        return jnp.sum(rgb**2) + jnp.sum(den**2)

    def loss_flax(params, x_, c_):
        rgb, den = mlp.apply({"params": params}, x_[:, None, :], c_)
        return jnp.sum(rgb**2) + jnp.sum(den**2)

    gw, gx, gc = jax.grad(loss_kernel, argnums=(0, 1, 2))(weights, x, cond)
    gp, gx_f, gc_f = jax.grad(loss_flax, argnums=(0, 1, 2))(variables["params"], x, cond)
    gw_f = mlp_params_from_flax(gp, cfg)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_f), atol=5e-2, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gc_f), atol=5e-2, rtol=1e-2)
    for a, b in zip(gw, gw_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=8e-2, rtol=2e-2)


def test_gated_kernel_matches_explicit_blend(setup):
    """fused_nerf_mlp_gated == blend-then-fused_nerf_mlp, values and grads."""
    from durf_tpu.ops.pallas.fused_mlp import fused_nerf_mlp_gated

    cfg, x, cond, mlp, variables, weights = setup
    rng = np.random.default_rng(5)
    gate = jnp.asarray(rng.integers(0, 2, size=(x.shape[0], 1)), jnp.float32)
    fill = jnp.asarray(rng.normal(size=(1, x.shape[1])), jnp.float32)

    def loss_gated(w, x_, g_, f_):
        rgb, den = fused_nerf_mlp_gated(x_, g_, f_, cond, w, cfg, 32, True)
        return jnp.sum(rgb**2) + jnp.sum(den**2)

    def loss_blend(w, x_, g_, f_):
        xe = g_ * x_ + (1.0 - g_) * f_
        rgb, den = fused_nerf_mlp(xe, cond, w, cfg, 32, True)
        return jnp.sum(rgb**2) + jnp.sum(den**2)

    va = loss_gated(weights, x, gate, fill)
    vb = loss_blend(weights, x, gate, fill)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-4)

    ga = jax.grad(loss_gated, argnums=(0, 1, 2, 3))(weights, x, gate, fill)
    gb = jax.grad(loss_blend, argnums=(0, 1, 2, 3))(weights, x, gate, fill)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2, rtol=2e-2)
