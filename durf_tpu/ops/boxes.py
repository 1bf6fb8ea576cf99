"""Scene-graph box ops: SE(3) object frames and ray/OBB intersection.

Vectorized over a leading object axis (the reference python-unrolls its object
loop; here everything is [B, N_obj, ...] so the object dimension batches onto
the VPU/MXU). Behavioral parity with reference internal/box_helpers.py:
slab-method intersection (59-106), Rodrigues axis-angle (148-167), and the
world->object transform used by the model (world2object_rpy, 286-341, which is
called without box-dim scaling — obbpose_model.py:110).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from durf_tpu import mathx


def axis_angle_to_matrix(rotvec: jax.Array) -> jax.Array:
    """Rodrigues formula: axis-angle rotation vectors -> rotation matrices.

    Args:
      rotvec: [..., 3] rotation vectors (angle = norm, axis = direction).

    Returns:
      [..., 3, 3] rotation matrices. Reference box_helpers.py:148-167 (batched
      over one leading axis; this version is fully shape-polymorphic).
    """
    x, y, z = rotvec[..., 0], rotvec[..., 1], rotvec[..., 2]
    zero = jnp.zeros_like(x)
    skew = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    angle = mathx.safe_norm(rotvec)[..., None] + 1e-12  # [..., 1, 1]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rotvec.dtype), skew.shape)
    skew_sq = mathx.matmul_hp(skew, skew)
    return eye + (jnp.sin(angle) / angle) * skew + ((1 - jnp.cos(angle)) / angle**2) * skew_sq


def rotate_yaw(p: jax.Array, yaw: jax.Array) -> jax.Array:
    """Rotate [..., 3] points by yaw about the +y (down-pointing) axis —
    the NSG yaw-only object-frame convention (reference box_helpers.py:
    109-128); the full-SE(3) path below supersedes it for the model."""
    c = jnp.cos(yaw)[..., None]
    s = jnp.sin(yaw)[..., None]
    px = c[..., 0] * p[..., 0] + s[..., 0] * p[..., 2]
    pz = -s[..., 0] * p[..., 0] + c[..., 0] * p[..., 2]
    return jnp.stack([px, p[..., 1], pz], axis=-1)


def box_to_world_frames(points: jax.Array, box_pos: jax.Array, box_rot: jax.Array) -> jax.Array:
    """Inverse of world_to_box_frames for points: x_w = R^T x_obj + p
    (box_rot is world->object)."""
    return jnp.einsum(
        "...ji,...j->...i", box_rot, points, precision=jax.lax.Precision.HIGHEST
    ) + box_pos


def rotate_vec(rot: jax.Array, v: jax.Array) -> jax.Array:
    """Apply [..., 3, 3] rotation matrices to [..., 3] vectors.

    Written as explicit multiply-adds: exact fp32 on the VPU. (An einsum at
    HIGHEST precision lowers to multi-pass MXU emulation for these tiny
    contractions — measurable on the per-ray geometry path.)
    """
    return jnp.stack(
        [
            rot[..., i, 0] * v[..., 0] + rot[..., i, 1] * v[..., 1] + rot[..., i, 2] * v[..., 2]
            for i in range(3)
        ],
        axis=-1,
    )


def world_to_box_frames(
    origins: jax.Array,
    dirs: jax.Array,
    box_pos: jax.Array,
    box_rot: jax.Array,
):
    """Transform world-frame rays into each object's box frame.

    The object frame is defined by x_obj = R @ (x_world - p): `box_rot` maps
    world to object axes (the reference stores world->object rotations — its
    dataset takes the inverse of the box rotation, obbpose_dataset.py:456).

    Args:
      origins: [B, 3] world ray origins.
      dirs: [B, 3] world ray directions (need not be unit).
      box_pos: [B, N_obj, 3] box centers in world frame.
      box_rot: [B, N_obj, 3, 3] world->object rotation matrices.

    Returns:
      (origins_o [B, N_obj, 3], dirs_o [B, N_obj, 3] with unit norm) —
      matching reference world2object_rpy without `dim` scaling
      (box_helpers.py:286-341; direction normalization at 340).
    """
    o = rotate_vec(box_rot, (origins[:, None, :] - box_pos))
    d = rotate_vec(box_rot, jnp.broadcast_to(dirs[:, None, :], box_pos.shape))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def ray_box_intersection(
    ray_o: jax.Array,
    ray_d: jax.Array,
    aabb_min: jax.Array,
    aabb_max: jax.Array,
):
    """Slab-method ray/AABB intersection, batched over arbitrary leading dims.

    Args:
      ray_o / ray_d: [..., 3] origins / unit directions in the box frame.
      aabb_min / aabb_max: [..., 3] box corners (typically ∓extent).

    Returns:
      (z_in [...], z_out [...], hit [...]) — entry/exit distances (zeroed for
      misses) and a float32 {0,1} hit mask. A hit requires z_out > z_in AND
      z_out > 0 (box not fully behind the origin). Reference
      box_helpers.py:59-106.
    """
    inv_d = jnp.reciprocal(ray_d)
    t_lo = (aabb_min - ray_o) * inv_d
    t_hi = (aabb_max - ray_o) * inv_d
    t0 = jnp.minimum(t_lo, t_hi)
    t1 = jnp.maximum(t_lo, t_hi)
    t_near = jnp.max(t0, axis=-1)
    t_far = jnp.min(t1, axis=-1)

    hit = jnp.logical_and(t_far > t_near, t_far > 0).astype(ray_o.dtype)
    # Select, don't multiply: axis-parallel miss rays make t_near/t_far ±inf
    # and inf * 0 would leak NaNs (the reference has this latent NaN,
    # box_helpers.py:101-102 — see docs/DEFECTS.md).
    zero = jnp.zeros_like(t_near)
    z_in = jnp.where(hit > 0, t_near, zero)
    z_out = jnp.where(hit > 0, t_far, zero)
    return z_in, z_out, hit


def scale_to_unit_box(p: jax.Array, extent: jax.Array, inverse: bool = False) -> jax.Array:
    """Scale box-frame points so the box spans [-1, 1]^3 (or back).

    Args:
      p: [..., 3] points; extent: [..., 3] full box dimensions.

    Reference box_helpers.py:184-205 (scale factor 1/(dim + 1e-9)).
    """
    scale = 1.0 / (extent + 1e-9)
    return p / scale if inverse else p * scale
