"""Stratified and hierarchical (inverse-CDF) sampling along rays.

Behavioral parity with reference internal/mip.py:330-416.

Provenance: the stratified-jitter and blurpool (max-of-neighbors weight
padding) blocks follow reference mip.py:361-367 and 395-401, which are
themselves UNMODIFIED Google mip-NeRF (github.com/google/mipnerf,
Apache-2.0, internal/mip.py `sample_along_rays`/`resample_along_rays`);
the algorithm has essentially one natural ~8-line expression. This file
extends it with coordinate-major and diagonal-covariance variants; the
inverse-CDF draw itself is mathx.sorted_piecewise_constant_pdf's
independently derived matmul-bracket formulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from durf_tpu import mathx
from durf_tpu.ops.frustum import cast_rays, cast_rays_cm


def sample_along_rays(
    key: jax.Array,
    origins: jax.Array,
    directions: jax.Array,
    radii: jax.Array,
    num_samples: int,
    near: jax.Array,
    far: jax.Array,
    randomized: bool,
    lindisp: bool,
    ray_shape: str,
    diag: bool = False,
    cm: bool = False,
):
    """Stratified sampling of num_samples+1 fenceposts in [near, far].

    Returns (t_vals [B, S+1], (means [B, S, 3], covs)) — or coordinate-major
    ([3, B, S], [3, B, S]) samples with cm=True (diag only; see
    frustum.lift_gaussian_cm). Reference mip.py:330-370 (lindisp at 354-358).
    """
    batch_size = origins.shape[0]

    t_vals = jnp.linspace(0.0, 1.0, num_samples + 1)
    if lindisp:
        t_vals = 1.0 / (near * (1.0 - t_vals) + far * t_vals)
    else:
        t_vals = near * (1.0 - t_vals) + far * t_vals

    if randomized:
        mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
        upper = jnp.concatenate([mids, t_vals[..., -1:]], -1)
        lower = jnp.concatenate([t_vals[..., :1], mids], -1)
        t_rand = jax.random.uniform(key, [batch_size, num_samples + 1])
        t_vals = lower + (upper - lower) * t_rand
    else:
        t_vals = jnp.broadcast_to(t_vals, [batch_size, num_samples + 1])
    if cm:
        assert diag, "coordinate-major sampling is diagonal-covariance only"
        return t_vals, cast_rays_cm(t_vals, origins, directions, radii, ray_shape)
    means, covs = cast_rays(t_vals, origins, directions, radii, ray_shape, diag)
    return t_vals, (means, covs)


def resample_along_rays(
    key: jax.Array,
    origins: jax.Array,
    directions: jax.Array,
    radii: jax.Array,
    t_vals: jax.Array,
    weights: jax.Array,
    randomized: bool,
    ray_shape: str,
    stop_grad: bool,
    resample_padding: float,
    num_samples: int | None = None,
    diag: bool = False,
    cm: bool = False,
):
    """Hierarchical resampling: blurpool the weights, then inverse-CDF sample.

    Args:
      t_vals: [B, S+1] previous fenceposts (the CDF bins).
      weights: [B, S] rendering weights from the previous level.
      num_samples: fenceposts drawn = num_samples + 1; defaults to keeping the
        previous count (reference mip.py:406-411 draws t_vals.shape[-1]).

    Reference mip.py:373-416 (blurpool at 394-401, padding at 404).
    """
    # Max-blur ("blurpool") so sharp weight spikes bleed into neighbors.
    weights_pad = jnp.concatenate([weights[..., :1], weights, weights[..., -1:]], axis=-1)
    weights_max = jnp.maximum(weights_pad[..., :-1], weights_pad[..., 1:])
    weights_blur = 0.5 * (weights_max[..., :-1] + weights_max[..., 1:])
    weights = weights_blur + resample_padding

    n_out = t_vals.shape[-1] if num_samples is None else num_samples + 1
    new_t_vals = mathx.sorted_piecewise_constant_pdf(key, t_vals, weights, n_out, randomized)
    if stop_grad:
        new_t_vals = lax.stop_gradient(new_t_vals)
    if cm:
        assert diag, "coordinate-major sampling is diagonal-covariance only"
        return new_t_vals, cast_rays_cm(new_t_vals, origins, directions, radii, ray_shape)
    means, covs = cast_rays(new_t_vals, origins, directions, radii, ray_shape, diag)
    return new_t_vals, (means, covs)
