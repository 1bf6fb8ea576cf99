"""Conical-frustum / cylinder Gaussian approximations and ray casting.

Behavioral parity with reference internal/mip.py:76-179 (also duplicated at
internal/mip360.py:205-308). The "stable" frustum moments algebra is
mandatory: the naive closed form catastrophically cancels in fp32
(reference mip.py:111-112 docstring).

Provenance: the stable conical-frustum moment formulas (the
t_mean/t_var/r_var algebra in conical_frustum_to_gaussian) follow
reference mip.py:76-139,
itself UNMODIFIED Google mip-NeRF (github.com/google/mipnerf, Apache-2.0,
internal/mip.py) — published closed-form math (mip-NeRF paper eq. 7) with
one canonical expression. The coordinate-major variants and
diagonal-covariance fast path are this repo's.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lift_gaussian(d: jax.Array, t_mean: jax.Array, t_var: jax.Array, r_var: jax.Array, diag: bool):
    """Lift a 1-D Gaussian along ray direction `d` into 3-D (mean, cov).

    Args:
      d: [..., 3] ray directions (not necessarily unit norm).
      t_mean / t_var: [..., S] along-ray mean / variance.
      r_var: [..., S] perpendicular variance.
      diag: return a [..., S, 3] diagonal cov instead of [..., S, 3, 3].

    Reference mip.py:76-96.
    """
    mean = d[..., None, :] * t_mean[..., None]
    d_mag_sq = jnp.maximum(1e-10, jnp.sum(d**2, axis=-1, keepdims=True))

    if diag:
        d_outer_diag = d**2
        null_outer_diag = 1 - d_outer_diag / d_mag_sq
        t_cov_diag = t_var[..., None] * d_outer_diag[..., None, :]
        xy_cov_diag = r_var[..., None] * null_outer_diag[..., None, :]
        return mean, t_cov_diag + xy_cov_diag

    d_outer = d[..., :, None] * d[..., None, :]
    eye = jnp.eye(d.shape[-1], dtype=d.dtype)
    null_outer = eye - d[..., :, None] * (d / d_mag_sq)[..., None, :]
    t_cov = t_var[..., None, None] * d_outer[..., None, :, :]
    xy_cov = r_var[..., None, None] * null_outer[..., None, :, :]
    return mean, t_cov + xy_cov


def conical_frustum_to_gaussian(
    d: jax.Array, t0: jax.Array, t1: jax.Array, base_radius: jax.Array, diag: bool, stable: bool = True
):
    """Gaussian moments of a conical frustum along `d` between t0 and t1.

    base_radius is the cone radius at distance 1. Reference mip.py:99-130.
    """
    if stable:
        mu = (t0 + t1) / 2
        hw = (t1 - t0) / 2
        denom = 3 * mu**2 + hw**2
        t_mean = mu + (2 * mu * hw**2) / denom
        t_var = (hw**2) / 3 - (4 / 15) * ((hw**4 * (12 * mu**2 - hw**2)) / denom**2)
        r_var = base_radius**2 * ((mu**2) / 4 + (5 / 12) * hw**2 - (4 / 15) * (hw**4) / denom)
    else:
        # Exact closed form; kept for reference tests only — cancels in fp32.
        t_mean = (3 * (t1**4 - t0**4)) / (4 * (t1**3 - t0**3))
        r_var = base_radius**2 * (3 / 20 * (t1**5 - t0**5) / (t1**3 - t0**3))
        t_mosq = 3 / 5 * (t1**5 - t0**5) / (t1**3 - t0**3)
        t_var = t_mosq - t_mean**2
    return lift_gaussian(d, t_mean, t_var, r_var, diag)


def cylinder_to_gaussian(d: jax.Array, t0: jax.Array, t1: jax.Array, radius: jax.Array, diag: bool):
    """Gaussian moments of a cylinder along `d` (reference mip.py:133-152)."""
    t_mean = (t0 + t1) / 2
    r_var = radius**2 / 4
    t_var = (t1 - t0) ** 2 / 12
    return lift_gaussian(d, t_mean, t_var, r_var, diag)


def lift_gaussian_cm(d: jax.Array, t_mean: jax.Array, t_var: jax.Array, r_var: jax.Array):
    """Coordinate-major diagonal lift: ([3, B, S] mean, [3, B, S] cov diag).

    Same per-element arithmetic as lift_gaussian(diag=True) — the values are
    bit-identical — but the coordinate axis leads instead of trailing. Why:
    XLA lays [N, 3] arrays out as (8, 128) tiles with 3 of 128 lanes used, so
    every elementwise op on row-major coordinates moves ~42x the logical
    bytes through HBM (profiled at ~17 ms of an 87 ms flagship train step —
    docs/DESIGN.md round-2 profile). With [3, B, S] the minor dim is the
    sample axis and tiles are dense.
    """
    d_mag_sq = jnp.maximum(1e-10, jnp.sum(d**2, axis=-1))  # [B]
    means, covs = [], []
    for k in range(d.shape[-1]):
        dk = d[..., k][..., None]  # [B, 1]
        d_outer_diag = dk**2
        null_outer_diag = 1 - d_outer_diag / d_mag_sq[..., None]
        means.append(dk * t_mean)
        covs.append(t_var * d_outer_diag + r_var * null_outer_diag)
    return jnp.stack(means), jnp.stack(covs)


def cast_rays_cm(
    t_vals: jax.Array,
    origins: jax.Array,
    directions: jax.Array,
    radii: jax.Array,
    ray_shape: str = "cone",
):
    """Coordinate-major cast_rays (diagonal covariance only): the per-interval
    Gaussians come back as ([3, B, S], [3, B, S]) and the [B, S, 3] row-major
    arrays are never materialized (see lift_gaussian_cm)."""
    t0 = t_vals[..., :-1]
    t1 = t_vals[..., 1:]
    if ray_shape == "cone":
        mu = (t0 + t1) / 2
        hw = (t1 - t0) / 2
        denom = 3 * mu**2 + hw**2
        t_mean = mu + (2 * mu * hw**2) / denom
        t_var = (hw**2) / 3 - (4 / 15) * ((hw**4 * (12 * mu**2 - hw**2)) / denom**2)
        r_var = radii**2 * ((mu**2) / 4 + (5 / 12) * hw**2 - (4 / 15) * (hw**4) / denom)
    elif ray_shape == "cylinder":
        t_mean = (t0 + t1) / 2
        r_var = radii**2 / 4
        t_var = (t1 - t0) ** 2 / 12
    else:
        raise ValueError(f"unknown ray_shape {ray_shape!r}")
    means, covs = lift_gaussian_cm(directions, t_mean, t_var, r_var)
    return means + origins.T[..., None], covs


def cast_rays(
    t_vals: jax.Array,
    origins: jax.Array,
    directions: jax.Array,
    radii: jax.Array,
    ray_shape: str = "cone",
    diag: bool = False,
):
    """Slice rays at fenceposts t_vals into per-interval Gaussians.

    Args:
      t_vals: [..., S+1] fencepost distances.
      origins / directions: [..., 3].
      radii: [..., 1] base radii.
      ray_shape: 'cone' or 'cylinder'.
      diag: diagonal covariance output.

    Returns:
      (means [..., S, 3], covs [..., S, 3, 3] or [..., S, 3]).

    Reference mip.py:155-179.
    """
    t0 = t_vals[..., :-1]
    t1 = t_vals[..., 1:]
    if ray_shape == "cone":
        gaussian_fn = conical_frustum_to_gaussian
    elif ray_shape == "cylinder":
        gaussian_fn = cylinder_to_gaussian
    else:
        raise ValueError(f"unknown ray_shape {ray_shape!r}")
    means, covs = gaussian_fn(directions, t0, t1, radii, diag)
    return means + origins[..., None, :], covs
