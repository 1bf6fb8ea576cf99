"""Mip-NeRF 360 scene contraction for unbounded scenes.

contract(x) = (2 - 1/||x||) * x/||x|| beyond a norm threshold; the Gaussian
covariance is propagated through the contraction with a diagonal-Jacobian
approximation. Behavioral parity with reference internal/mip360.py:47-79,
including the reference's threshold of 0.1 (the Mip-NeRF 360 paper uses 1.0 —
configurable here; see docs/DEFECTS.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from durf_tpu import mathx


def contract(x: jax.Array, threshold: float = 0.1, axis: int = -1) -> jax.Array:
    """Contract unbounded points into a ball of radius 2.

    Identity for ||x|| <= threshold, (2 - 1/||x||) * x/||x|| beyond it
    (reference mip360.py:47-60 uses threshold 0.1).

    NOTE (docs/DEFECTS.md #14): for any threshold < 1 the band
    threshold < ||x|| < 1 is pathological — the radial factor (2 - 1/||x||)
    is < 1 there and NEGATIVE below ||x|| = 0.5, so near-origin points are
    reflected through the origin (with norm up to 1/threshold - 2). This is
    inherited reference behavior (its 0.1 threshold shares it) and is kept
    for parity; the fix is the paper's threshold of 1.0
    (`ModelConfig.contract_threshold = 1.0`), for which the map is the
    identity inside the unit ball and a direction-preserving contraction
    into the radius-2 ball outside.
    """
    x_norm = mathx.safe_norm(x, axis=axis)
    inside = (x_norm <= threshold).astype(x.dtype)
    contracted = (2.0 - jnp.nan_to_num(1.0 / x_norm)) * jnp.nan_to_num(x / x_norm)
    return inside * x + (1.0 - inside) * contracted


def contract_gaussian(mean: jax.Array, cov: jax.Array, threshold: float = 0.1):
    """Push a Gaussian (mean, cov) through the contraction.

    The reference (mip360.py:63-79) approximates the Jacobian by the diagonal
    matrix D = diag(J @ 1) (the row sums of J, obtained via jax.linearize with
    an all-ones tangent) and maps cov -> D cov D^T. We compute the same thing
    with a single jvp and an elementwise outer scaling — algebraically
    identical, without materializing [.., 3, 3] matmuls:
        (D Σ D^T)_ij = d_i d_j Σ_ij.

    Args:
      mean: [..., 3]; cov: [..., 3, 3] full covariance.

    Returns:
      (contracted mean, contracted cov).
    """
    fn = lambda m: contract(m, threshold)
    mean_c, d = jax.jvp(fn, (mean,), (jnp.ones_like(mean),))
    cov_c = d[..., :, None] * cov * d[..., None, :]
    return mean_c, cov_c


def contract_gaussian_diag(mean: jax.Array, cov_diag: jax.Array, threshold: float = 0.1, axis: int = -1):
    """Diagonal-covariance variant: diag(D Σ Dᵀ) = d² ⊙ diag(Σ).

    Exactly the diagonal of contract_gaussian's output — and since the whole
    IPE pipeline only ever reads covariance diagonals under the axis-aligned
    power-of-two frequency basis, using it end-to-end is EXACT, not an
    approximation (see docs/DESIGN.md 'diagonal covariance').

    Args:
      mean: [..., 3]; cov_diag: [..., 3]. With axis=0 both may instead be
      coordinate-major [3, ...] (the TPU-friendly layout — see
      ops/frustum.py lift_gaussian_cm).
    """
    fn = lambda m: contract(m, threshold, axis=axis)
    mean_c, d = jax.jvp(fn, (mean,), (jnp.ones_like(mean),))
    return mean_c, d * d * cov_diag
