"""Density-grid acceleration ops tests."""

import jax
import jax.numpy as jnp
import numpy as np

from durf_tpu import mathx, ops
from durf_tpu.ops import grid as gridops


def test_update_and_query_roundtrip():
    g = gridops.make_grid(16) * 0.0
    pos = jnp.asarray([[0.0, 0.0, 0.0], [1.9, 0.0, 0.0]])
    w = jnp.asarray([0.7, 0.3])
    g2 = gridops.update(g, pos, w, decay=1.0)
    np.testing.assert_allclose(float(gridops.query(g2, pos[:1])[0]), 0.7)
    np.testing.assert_allclose(float(gridops.query(g2, pos[1:])[0]), 0.3)
    # Far-away empty voxel stays 0.
    assert float(gridops.query(g2, jnp.asarray([[-1.9, -1.9, -1.9]]))[0]) == 0.0


def test_update_decay_and_max_semantics():
    g = gridops.make_grid(8) * 0.0
    pos = jnp.zeros((1, 3))
    g = gridops.update(g, pos, jnp.asarray([1.0]), decay=0.5)
    g = gridops.update(g, pos, jnp.asarray([0.1]), decay=0.5)
    # After decay 0.5 the old 1.0 becomes 0.5 > new 0.1 -> keeps 0.5.
    np.testing.assert_allclose(float(gridops.query(g, pos)[0]), 0.5)


def test_query_clips_out_of_range():
    g = gridops.make_grid(8)
    v = gridops.query(g, jnp.asarray([[100.0, -100.0, 0.0]]))
    assert np.isfinite(float(v[0]))


def test_ray_pdf_concentrates_on_occupied_region():
    # Occupied box around z = -5 on the ray's path; everything else empty.
    g = gridops.make_grid(64) * 0.0
    zs = np.linspace(-5.5, -4.5, 64, dtype=np.float32)
    occ_pos = jnp.asarray(np.stack([np.zeros_like(zs), np.zeros_like(zs), zs], -1))
    # Grid lives in CONTRACTED coordinates (like the model's update path).
    g = gridops.update(g, ops.contract(occ_pos), jnp.ones(len(zs)), decay=1.0)

    origins = jnp.zeros((2, 3))
    dirs = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])  # 2nd misses
    near = jnp.full((2, 1), 0.1)
    far = jnp.full((2, 1), 10.0)
    bins, w = gridops.ray_pdf(g, origins, dirs, near, far, 64, ops.contract, floor=1e-3)
    assert bins.shape == (2, 65) and w.shape == (2, 64)
    # Draw samples from the pdf: ray 0's should cluster near t=5.
    t = mathx.sorted_piecewise_constant_pdf(jax.random.key(0), bins, w, 64, True)
    t0 = np.asarray(t[0])
    # The contraction compresses distant space, so the occupied voxels span a
    # wider t band than the raw geometry — but empty near/far space is culled.
    assert np.mean((t0 > 3.9) & (t0 < 8.2)) > 0.9
    assert np.mean(t0 < 3.0) < 0.05
    # Ray 1 sees only the floor -> roughly uniform.
    t1 = np.asarray(t[1])
    assert t1.std() > 2.0
