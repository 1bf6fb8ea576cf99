"""Camera-path generation tests."""

import numpy as np

from durf_tpu.data.paths import interpolate_poses, spherical_path, spiral_path, view_matrix


def _poses(n=8, radius=4.0):
    out = []
    for th in np.linspace(0, np.pi / 2, n):
        pos = np.array([radius * np.cos(th), 1.5, radius * np.sin(th)], np.float32)
        out.append(view_matrix(pos / np.linalg.norm(pos), np.array([0, 1, 0.0]), pos))
    return np.stack(out)


def _assert_valid_rotations(poses):
    r = poses[:, :3, :3]
    eye = np.eye(3)
    for m in r:
        np.testing.assert_allclose(m @ m.T, eye, atol=1e-4)


def test_spiral_path_shape_and_rotations():
    poses = _poses()
    bounds = np.asarray([[1.0, 50.0]] * len(poses))
    path = spiral_path(poses, bounds, n_views=24)
    assert path.shape == (24, 3, 4)
    _assert_valid_rotations(path)
    assert np.all(np.isfinite(path))


def test_spherical_path_orbits_at_camera_radius():
    poses = _poses()
    path = spherical_path(poses, n_views=16)
    assert path.shape == (16, 3, 4)
    _assert_valid_rotations(path)
    rad = np.sqrt(np.mean(np.sum(poses[:, :3, 3] ** 2, -1)))
    np.testing.assert_allclose(np.linalg.norm(path[:, :3, 3], axis=-1), rad, rtol=1e-4)


def test_interpolate_passes_through_keyframes():
    poses = _poses(4)
    path = interpolate_poses(poses, n_views=7)  # odd count hits keyframes
    assert path.shape == (7, 3, 4)
    np.testing.assert_allclose(path[0], poses[0], atol=1e-5)
    np.testing.assert_allclose(path[-1], poses[-1], atol=1e-5)
    _assert_valid_rotations(path)
