"""Box-surface depth prior: pose loss anchored on LIDAR, not on the field.

Config.box_surface_loss_mult (durf_tpu extension, no reference analogue):
depth points inside/near an object's box are regressed onto the box surface
via the squared box-SDF in the object's canonical frame. Unlike the
photometric and centering losses, the field cannot co-adapt to absorb this
one — its basin is anchored at the true box fit, which is the restoring
force the round-3/4 pose-recipe ledgers show the photometric loss lacks
(every schedule-only recipe drifts along the flat ray direction; reference
README.md:43-46 claims the capability, its own trainer drifts 0.429).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from durf_tpu import losses, ops
from durf_tpu.configs import Config
from durf_tpu.rays import Rays


def make_rays(points: np.ndarray, t: float = 2.0) -> tuple[Rays, jnp.ndarray]:
    """Rays from the origin whose depth-t points are exactly `points`."""
    n = points.shape[0]
    dirs = points / t
    ones = np.ones((n, 1), np.float32)
    rays = Rays(
        origins=jnp.zeros((n, 3), jnp.float32),
        directions=jnp.asarray(dirs, jnp.float32),
        viewdirs=jnp.asarray(
            dirs / np.linalg.norm(dirs, axis=-1, keepdims=True), jnp.float32
        ),
        radii=jnp.asarray(ones * 0.01),
        lossmult=jnp.asarray(ones),
        near=ones * 0.1,
        far=ones * 10.0,
    )
    return rays, jnp.full((n,), t, jnp.float32)


def surface_points(
    center: np.ndarray, rotvec: np.ndarray, ext: np.ndarray, n_per_face: int = 8
) -> np.ndarray:
    """World points exactly on the box surface (3 visible faces)."""
    rng = np.random.default_rng(7)
    pts = []
    for axis in range(3):
        uv = rng.uniform(-1, 1, size=(n_per_face, 3)).astype(np.float32) * ext
        uv[:, axis] = -ext[axis]  # the camera-facing face
        pts.append(uv)
    x = np.concatenate(pts)  # canonical
    rmat = np.asarray(ops.axis_angle_to_matrix(rotvec[None]))[0]  # world->obj
    return x @ rmat + center  # p = R^T x + c


CENTER = np.array([0.5, -0.3, -6.0], np.float32)
ROTVEC = np.array([0.0, 0.4, 0.0], np.float32)
EXT = np.array([[1.0, 0.8, 2.0]], np.float32)


def loss_at(pose_np, rot_np, points, margin=1.0, inst=None, obj_ids=None):
    rays, depth = make_rays(points)
    return losses.box_surface_loss(
        rays,
        depth,
        jnp.asarray(pose_np).reshape(1, 3),
        jnp.asarray(rot_np).reshape(1, 3),
        jnp.asarray(EXT),
        margin,
        inst=None if inst is None else jnp.asarray(inst),
        obj_ids=None if obj_ids is None else jnp.asarray(obj_ids),
    )


def test_zero_on_surface_at_gt_pose():
    pts = surface_points(CENTER, ROTVEC, EXT[0])
    assert float(loss_at(CENTER, ROTVEC, pts)) < 1e-10


def test_positive_and_restoring_under_offset():
    pts = surface_points(CENTER, ROTVEC, EXT[0])
    offset = np.array([0.3, -0.2, 0.4], np.float32)
    val = float(loss_at(CENTER + offset, ROTVEC, pts))
    assert val > 1e-3
    # Gradient descent direction reduces the pose error.
    g = jax.grad(lambda c: loss_at(c, jnp.asarray(ROTVEC), pts))(
        jnp.asarray(CENTER + offset)
    )
    g = np.asarray(g).reshape(3)
    # Moving against the gradient must move the center TOWARD the truth.
    assert np.dot(g, offset) > 0.0


def test_margin_trims_background_outliers():
    pts = surface_points(CENTER, ROTVEC, EXT[0])
    base = float(loss_at(CENTER, ROTVEC, pts))
    far_wall = np.tile(CENTER + np.array([0.0, 0.0, -30.0], np.float32), (5, 1))
    both = np.concatenate([pts, far_wall])
    assert float(loss_at(CENTER, ROTVEC, both)) == pytest.approx(base, abs=1e-9)


def test_instance_gating_rejects_near_ground_points():
    """A ground point beside the footprint passes the margin trim but not
    the instance mask."""
    pts = surface_points(CENTER, ROTVEC, EXT[0])
    ground = (CENTER + np.array([EXT[0, 0] + 0.3, -EXT[0, 1], 0.0], np.float32))[
        None
    ]
    both = np.concatenate([pts, ground])
    polluted = float(loss_at(CENTER, ROTVEC, both))
    assert polluted > 1e-6  # the margin alone admits the ground point
    inst = np.concatenate(
        [np.ones((len(pts), 1), np.int32), np.zeros((1, 1), np.int32)]
    )
    gated = float(
        loss_at(CENTER, ROTVEC, both, inst=inst, obj_ids=np.array([1], np.int32))
    )
    assert gated == pytest.approx(0.0, abs=1e-10)


def test_zero_depth_rays_never_count():
    pts = surface_points(CENTER, ROTVEC, EXT[0])
    rays, depth = make_rays(pts)
    depth = depth.at[0].set(0.0)  # LIDAR no-return: its p collapses to o
    val = losses.box_surface_loss(
        rays,
        depth,
        jnp.asarray(CENTER).reshape(1, 3),
        jnp.asarray(ROTVEC).reshape(1, 3),
        jnp.asarray(EXT),
        margin=100.0,  # huge margin: only the depth>0 gate can reject it
    )
    assert float(val) < 1e-10


def test_pose_recovery_by_descent_alone():
    """The headline property: Adam on this loss ALONE recovers a 0.5 m pose
    error to centimeters — the restoring force photometric loss lacks."""
    pts = surface_points(CENTER, ROTVEC, EXT[0], n_per_face=16)
    noised = CENTER + np.array([0.5, -0.5, 0.5], np.float32)

    opt = optax.adam(3e-2)
    params = jnp.asarray(noised)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        val, g = jax.value_and_grad(
            lambda c: loss_at(c, jnp.asarray(ROTVEC), pts)
        )(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, val

    for _ in range(400):
        params, opt_state, val = step(params, opt_state)
    err = np.abs(np.asarray(params) - CENTER)
    assert np.all(err < 0.03), (err, float(val))


def test_compute_losses_wiring_and_parity_when_off():
    pts = surface_points(CENTER, ROTVEC, EXT[0])
    rays, depth = make_rays(pts)
    n = pts.shape[0]
    ns = 4
    level = {
        "rgb": jnp.zeros((n, 3)),
        "depth": jnp.ones((n,)),
        "acc": jnp.ones((n,)),
        "weights": jnp.full((n, ns), 0.25),
        "t_vals": jnp.broadcast_to(jnp.linspace(0.1, 10.0, ns + 1), (n, ns + 1)),
        "t_mids": jnp.broadcast_to(jnp.linspace(0.2, 9.0, ns), (n, ns)),
        "t_dists": jnp.full((n, ns), 0.1),
        "pose": jnp.asarray(CENTER + 0.3).reshape(1, 3),
        "rot": jnp.asarray(ROTVEC).reshape(1, 3),
        "dyn_mask": jnp.ones((n, 1)),
        "z_out": jnp.full((n,), 8.0),
    }
    batch = {
        "rays": rays,
        "pixels": jnp.zeros((n, 3)),
        "depth": depth[:, None],
        "sky": jnp.zeros((n, 1)),
        "target": jnp.zeros((1, 6)),
        "ext": jnp.asarray(EXT),
    }
    prev = jnp.zeros((1, 6))
    off = Config(box_surface_loss_mult=0.0)
    on = dataclasses.replace(off, box_surface_loss_mult=5.0)
    total_off, aux_off = losses.compute_losses(off, [level], batch, prev, eps=1.0)
    total_on, aux_on = losses.compute_losses(on, [level], batch, prev, eps=1.0)
    assert float(aux_off["box_surface"]) == 0.0
    assert float(aux_on["box_surface"]) > 0.0
    np.testing.assert_allclose(
        float(total_on - total_off),
        5.0 * float(aux_on["box_surface"]),
        rtol=1e-6,
    )
    # Static batch (no ext): gated off even with the mult on.
    static_batch = {k: v for k, v in batch.items() if k != "ext"}
    total_s, aux_s = losses.compute_losses(on, [level], static_batch, prev, eps=1.0)
    assert float(aux_s["box_surface"]) == 0.0
    np.testing.assert_allclose(float(total_s), float(total_off), rtol=1e-6)
