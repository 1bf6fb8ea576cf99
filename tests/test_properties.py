"""Property-based tests (hypothesis) for the geometric/sampling invariants."""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from durf_tpu import mathx, ops

_settings = settings(max_examples=25, deadline=None)


@st.composite
def _histogram(draw):
    n = draw(st.integers(4, 24))
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    bins = np.sort(rng.uniform(-5, 15, size=n + 1)).astype(np.float32)
    bins += np.arange(n + 1, dtype=np.float32) * 1e-3  # strictly increasing
    weights = rng.uniform(0, draw(st.floats(0.0, 3.0)), size=n).astype(np.float32)
    return bins, weights


@_settings
@given(_histogram(), st.integers(0, 1000), st.booleans())
def test_pdf_samples_sorted_and_in_range(hist, seed, randomized):
    bins, weights = hist
    s = np.asarray(
        mathx.sorted_piecewise_constant_pdf(
            jax.random.key(seed), jnp.asarray(bins[None]), jnp.asarray(weights[None]), 16, randomized
        )
    )[0]
    assert np.all(np.diff(s) >= -1e-6)
    assert s.min() >= bins[0] - 1e-5 and s.max() <= bins[-1] + 1e-5
    assert np.all(np.isfinite(s))


@_settings
@given(st.integers(0, 2**31))
def test_box_hit_midpoint_is_inside(seed):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.normal(size=(32, 3)) * 3, jnp.float32)
    d = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    ext = jnp.asarray(np.abs(rng.normal(size=(32, 3))) + 0.2, jnp.float32)
    z_in, z_out, hit = ops.ray_box_intersection(o, d, -ext, ext)
    mid = np.asarray(o + 0.5 * (z_in + z_out)[..., None] * d)
    inside = np.all(np.abs(mid) <= np.asarray(ext) * (1 + 1e-3) + 1e-4, axis=-1)
    h = np.asarray(hit) > 0
    assert np.all(inside[h])
    # And z_out > z_in, z_out > 0 for all hits.
    assert np.all(np.asarray(z_out)[h] > np.asarray(z_in)[h])
    assert np.all(np.asarray(z_out)[h] > 0)


@_settings
@given(st.integers(0, 2**31), st.floats(0.5, 2.0))
def test_contract_is_radial_and_bounded(seed, threshold):
    # Clean invariants hold for threshold >= 0.5, where the radial factor
    # (2 - 1/||x||) is non-negative over the contracted region. Below 0.5 the
    # reference-parity behavior reflects near-origin points (docs/DEFECTS.md
    # #14) — pinned separately by test_contract_reference_band_reflects.
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(64, 3)) * rng.uniform(0.01, 50), jnp.float32)
    c = np.asarray(ops.contract(x, threshold=threshold))
    assert np.all(np.linalg.norm(c, axis=-1) <= max(2.0, threshold) + 1e-5)
    # Direction preserved: c is a non-negative multiple of x.
    xs = np.asarray(x)
    cross = np.linalg.norm(np.cross(xs, c), axis=-1)
    assert np.all(cross <= 1e-3 * np.linalg.norm(xs, axis=-1) * np.maximum(np.linalg.norm(c, axis=-1), 1e-6) + 1e-5)
    assert np.all(np.einsum("ij,ij->i", xs, c) >= -1e-6)


def test_contract_reference_band_reflects():
    # Reference-parity regression for docs/DEFECTS.md #14: at the reference's
    # threshold of 0.1 (mip360.py:47-60), points with 0.1 < ||x|| < 0.5 map to
    # a NEGATIVE multiple of x — (2 - 1/||x||) < 0 — i.e. the contraction
    # reflects them through the origin, with image norm up to 1/0.1 - 2 = 8.
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(32, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    norms = rng.uniform(0.11, 0.49, size=(32, 1))
    x = jnp.asarray(dirs * norms, jnp.float32)
    c = np.asarray(ops.contract(x, threshold=0.1))
    # Anti-parallel to x, with the exact reference radial factor.
    np.testing.assert_allclose(c, (2.0 - 1.0 / norms) * dirs, rtol=1e-4, atol=1e-5)
    assert np.all(np.einsum("ij,ij->i", np.asarray(x), c) < 0)
    # At the paper's threshold (the fix), the same points are untouched.
    np.testing.assert_allclose(np.asarray(ops.contract(x, threshold=1.0)), np.asarray(x), atol=1e-7)


@_settings
@given(st.integers(0, 2**31))
def test_rotation_matrices_orthonormal(seed):
    rng = np.random.default_rng(seed)
    rotvec = jnp.asarray(rng.normal(size=(16, 3)) * 3, jnp.float32)
    m = np.asarray(ops.axis_angle_to_matrix(rotvec))
    eye = np.broadcast_to(np.eye(3), m.shape)
    np.testing.assert_allclose(m @ m.transpose(0, 2, 1), eye, atol=1e-4)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-4)


@_settings
@given(st.integers(0, 2**31))
def test_compositing_weights_partition(seed):
    rng = np.random.default_rng(seed)
    B, S = 8, 12
    density = jnp.asarray(rng.uniform(0, 5, size=(B, S, 1)), jnp.float32)
    t_vals = jnp.asarray(np.sort(rng.uniform(0.1, 10, size=(B, S + 1)), -1), jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)
    rgb = jnp.asarray(rng.uniform(size=(B, S, 3)), jnp.float32)
    comp, depth, acc, weights, *_ = ops.volumetric_rendering(rgb, density, t_vals, dirs, "white")
    w = np.asarray(weights)
    assert np.all(w >= 0) and np.all(w.sum(-1) <= 1 + 1e-5)
    # White background: composited color stays in [0, 1].
    c = np.asarray(comp)
    assert np.all(c >= -1e-5) and np.all(c <= 1 + 1e-5)
