"""Unit tests for the loss stack."""

import jax
import jax.numpy as jnp
import numpy as np

from durf_tpu import losses


def test_distortion_fast_equals_exact():
    rng = np.random.default_rng(0)
    B, S = 16, 32
    t_mids = np.sort(rng.uniform(0, 10, size=(B, S)), axis=-1)
    weights = rng.uniform(0, 1, size=(B, S)).astype(np.float32)
    t_dists = rng.uniform(0.01, 0.5, size=(B, S)).astype(np.float32)
    fast = losses.distortion_loss(
        jnp.asarray(weights), jnp.asarray(t_mids, jnp.float32), jnp.asarray(t_dists)
    )
    exact = losses.distortion_loss(
        jnp.asarray(weights), jnp.asarray(t_mids, jnp.float32), jnp.asarray(t_dists), exact=True
    )
    np.testing.assert_allclose(float(fast), float(exact), rtol=1e-5)


def test_distortion_zero_for_delta_weights():
    # All weight on one sample and zero interval width -> zero distortion.
    B, S = 2, 8
    t_mids = jnp.broadcast_to(jnp.linspace(0, 1, S), (B, S))
    weights = jnp.zeros((B, S)).at[:, 3].set(1.0)
    t_dists = jnp.zeros((B, S))
    assert float(losses.distortion_loss(weights, t_mids, t_dists)) < 1e-6


def test_distortion_prefers_concentrated_weights():
    B, S = 1, 16
    t_mids = jnp.broadcast_to(jnp.linspace(0, 1, S), (B, S))
    t_dists = jnp.full((B, S), 1.0 / S)
    spread = jnp.full((B, S), 1.0 / S)
    conc = jnp.zeros((B, S)).at[:, 7].set(0.5).at[:, 8].set(0.5)
    assert float(losses.distortion_loss(conc, t_mids, t_dists)) < float(
        losses.distortion_loss(spread, t_mids, t_dists)
    )


def test_urf_losses_reward_correct_depth():
    # Weights concentrated at the GT depth -> low near loss; weight beyond
    # depth+eps -> positive empty loss.
    B, S = 1, 64
    t0 = jnp.broadcast_to(jnp.linspace(0.0, 10.0, S), (B, S))
    gt_depth = jnp.asarray([5.0])
    mask = jnp.asarray([1.0])
    eps = 1.0
    sigma = (eps / 3.0) ** 2

    # The loss's own target: peak-normalized Gaussian inside the window.
    win = ((t0 > gt_depth - eps) & (t0 < gt_depth + eps)).astype(jnp.float32)
    dist = win * (t0 - gt_depth)
    target = jnp.exp(-(dist**2) / (2 * sigma**2)) / jnp.exp(jnp.zeros(())) * win
    good = target / jnp.maximum(target.sum(), 1e-6) * win.sum() / S  # roughly shaped
    d_good, near_good, empty_good = losses.urf_depth_losses(
        target, t0, (target * (t0 + 0.078125)).sum(-1), gt_depth, mask, eps
    )

    bad = jnp.zeros((B, S)).at[:, -4].set(1.0)  # all weight far beyond depth
    d_bad, near_bad, empty_bad = losses.urf_depth_losses(
        bad, t0, jnp.asarray([t0[0, -4]]), gt_depth, mask, eps
    )
    assert float(near_good) < float(near_bad)
    assert float(empty_good) < 1e-6 or float(empty_good) < float(empty_bad)
    assert float(d_good) < float(d_bad)


def test_urf_losses_zero_without_depth_returns():
    B, S = 2, 16
    t0 = jnp.broadcast_to(jnp.linspace(0.0, 10.0, S), (B, S))
    weights = jnp.full((B, S), 1.0 / S)
    zero_mask = jnp.zeros((B,))
    d, near, empty = losses.urf_depth_losses(
        weights, t0, jnp.full((B,), 3.0), jnp.zeros((B,)), zero_mask, 1.0
    )
    assert float(d) == 0.0 and float(near) == 0.0 and float(empty) == 0.0


def test_sky_loss_pushes_depth_far():
    sky_mask = jnp.asarray([1.0, 0.0])
    gt_sky = jnp.asarray([0.975, 0.0])
    near_depth = jnp.asarray([2.0, 5.0])
    far_depth = jnp.asarray([40.0, 5.0])  # 1 - 1/40 = 0.975: on target
    assert float(losses.sky_loss(far_depth, sky_mask, gt_sky)) < float(
        losses.sky_loss(near_depth, sky_mask, gt_sky)
    )
    np.testing.assert_allclose(float(losses.sky_loss(far_depth, sky_mask, gt_sky)), 0, atol=1e-8)


def test_weight_l2_is_mean_square():
    params = {"a": jnp.full((2, 2), 2.0), "b": jnp.zeros((4,))}
    np.testing.assert_allclose(float(losses.weight_l2(params)), 16.0 / 8.0)
