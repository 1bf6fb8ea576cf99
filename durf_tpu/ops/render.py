"""Alpha compositing (volumetric rendering) along rays.

Behavioral parity with reference internal/mip.py:285-327 and
internal/mip360.py:126-157, with one fix: the 'random' background actually
composites a random color — the reference's random.randint(..., 0.0, 1.0)
always yields black (mip.py:324; see docs/DEFECTS.md).

Provenance: the alpha-compositing weight recurrence (compute_weights)
follows reference mip.py:285-307, itself vendored from Google's Apache-2.0
mip-NeRF (github.com/google/mipnerf, internal/mip.py
`volumetric_rendering`) — the exp/cumsum transmittance form is the standard
NeRF estimator with one canonical expression. The cm (coordinate-major)
variant and the URF depth contract notes are this repo's.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_weights(density: jax.Array, t_vals: jax.Array, dirs: jax.Array):
    """Per-sample compositing weights w_i = alpha_i * T_i.

    Args:
      density: [B, S, 1] non-negative densities.
      t_vals: [B, S+1] fenceposts.
      dirs: [B, 3] (non-unit) ray directions; interval lengths are scaled by
        ||dirs|| to get metric deltas.

    Returns:
      weights [B, S], t_mids [B, S], t_dists [B, S].
    """
    eps = 1e-8
    t_mids = 0.5 * (t_vals[..., :-1] + t_vals[..., 1:])
    t_dists = t_vals[..., 1:] - t_vals[..., :-1]
    delta = t_dists * jnp.linalg.norm(dirs[..., None, :], axis=-1)
    density_delta = density[..., 0] * delta
    alpha = 1 - jnp.exp(-density_delta)
    trans = jnp.exp(
        -jnp.concatenate(
            [jnp.zeros_like(density_delta[..., :1]), jnp.cumsum(density_delta[..., :-1], axis=-1)],
            axis=-1,
        )
    )
    weights = jnp.nan_to_num(alpha * trans, nan=eps)
    return weights, t_mids, t_dists


def volumetric_rendering(
    rgb: jax.Array,
    density: jax.Array,
    t_vals: jax.Array,
    dirs: jax.Array,
    background: str = "gray",
    key: jax.Array | None = None,
):
    """Composite per-sample rgb/density into per-ray color, depth and opacity.

    Args:
      rgb: [B, S, 3]; density: [B, S, 1]; t_vals: [B, S+1]; dirs: [B, 3].
      background: 'white' | 'gray' | 'black' | 'random' color composited
        behind the accumulated radiance (reference mip.py:321-326).
      key: PRNG key, required for background='random'.

    Returns:
      (comp_rgb [B,3], depth [B], acc [B], weights [B,S], t_vals, t_mids,
       t_dists) — depth is the unclipped expected termination distance
      Σ w·t_mid (what the URF losses consume, reference mip.py:317).
    """
    weights, t_mids, t_dists = compute_weights(density, t_vals, dirs)

    comp_rgb = (weights[..., None] * rgb).sum(axis=-2)
    acc = weights.sum(axis=-1)
    depth = (weights * t_mids).sum(axis=-1)

    residual = 1.0 - acc[..., None]
    if background == "white":
        comp_rgb = comp_rgb + residual
    elif background == "random":
        if key is None:
            raise ValueError("background='random' needs a PRNG key")
        bg = jax.random.uniform(key, (1, 3), dtype=comp_rgb.dtype)
        comp_rgb = comp_rgb + bg * residual
    elif background == "gray":
        comp_rgb = comp_rgb + 0.5 * residual
    elif background != "black":
        raise ValueError(f"unknown background {background!r}")
    return comp_rgb, depth, acc, weights, t_vals, t_mids, t_dists


def volumetric_density(density: jax.Array, t_vals: jax.Array, dirs: jax.Array):
    """Weights/depth only (no color), for density-supervision paths.

    Returns (weights [B,S], depth [B], t_vals [B,S+1], t_mids [B,S+1] — padded
    with the last fencepost — t_dists [B,S]). Reference mip360.py:126-157.
    """
    weights, t_mids, t_dists = compute_weights(density, t_vals, dirs)
    depth = (weights * t_mids).sum(axis=-1)
    t_mids = jnp.concatenate([t_mids, t_vals[:, -1:]], axis=-1)
    return weights, depth, t_vals, t_mids, t_dists


def distance_from_depth(depth: jax.Array, acc: jax.Array, t_vals: jax.Array) -> jax.Array:
    """Acc-normalized expected distance, clipped to the sampled range.

    Reference mip.py:318-320 (used for visualization, not for losses).
    """
    distance = depth / acc
    return jnp.clip(jnp.nan_to_num(distance, nan=jnp.inf), t_vals[:, 0], t_vals[:, -1])


def volumetric_rendering_cm(
    rgb_cm: jax.Array,
    density: jax.Array,
    t_vals: jax.Array,
    dirs: jax.Array,
    background: str = "gray",
    key: jax.Array | None = None,
):
    """Coordinate-major volumetric_rendering: rgb as [3, B, S] channel planes,
    density as a [B, S] plane (the feature-major MLP outputs). Same returns
    (and the same per-element arithmetic) as volumetric_rendering — only the
    rgb weighted sum and the density squeeze change layout, so every
    elementwise op runs on dense (8, 128) tiles (docs/DESIGN.md)."""
    weights, t_mids, t_dists = compute_weights(density[..., None], t_vals, dirs)

    comp_rgb = (weights[None] * rgb_cm).sum(axis=-1).T  # [B, 3]
    acc = weights.sum(axis=-1)
    depth = (weights * t_mids).sum(axis=-1)

    residual = 1.0 - acc[..., None]
    if background == "white":
        comp_rgb = comp_rgb + residual
    elif background == "random":
        if key is None:
            raise ValueError("background='random' needs a PRNG key")
        bg = jax.random.uniform(key, (1, 3), dtype=comp_rgb.dtype)
        comp_rgb = comp_rgb + bg * residual
    elif background == "gray":
        comp_rgb = comp_rgb + 0.5 * residual
    elif background != "black":
        raise ValueError(f"unknown background {background!r}")
    return comp_rgb, depth, acc, weights, t_vals, t_mids, t_dists
