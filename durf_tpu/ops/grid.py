"""Occupancy/density grid over the contracted domain: learned empty-space
awareness for smarter level-0 sampling (a VaxNeRF/Instant-NGP-style
acceleration the reference does not have; see PAPERS.md).

The grid lives on [-2, 2]^3 (the contraction's codomain, so it covers the
unbounded scene), is updated from training batches by an EMA'd scatter-max of
rendering weights at sample positions, and is queried with nearest-voxel
lookups to build a per-ray sampling PDF — all device-resident and jit-pure
(the grid threads through TrainState).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

GRID_EXTENT = 2.0  # contracted space is a radius-2 ball


def make_grid(resolution: int = 96, dtype=jnp.float32) -> jax.Array:
    """A fresh all-ones grid (optimistic: everything occupied until seen)."""
    return jnp.ones((resolution, resolution, resolution), dtype)


def _voxel_indices(positions: jax.Array, resolution: int) -> jax.Array:
    """Contracted [-2, 2]^3 positions -> [..., 3] int voxel indices (clipped)."""
    u = (positions + GRID_EXTENT) / (2 * GRID_EXTENT)  # [0, 1]
    idx = jnp.floor(u * resolution).astype(jnp.int32)
    return jnp.clip(idx, 0, resolution - 1)


def query(grid: jax.Array, positions: jax.Array) -> jax.Array:
    """Nearest-voxel occupancy lookup for [..., 3] contracted positions."""
    idx = _voxel_indices(positions, grid.shape[0])
    return grid[idx[..., 0], idx[..., 1], idx[..., 2]]


def update(
    grid: jax.Array,
    positions: jax.Array,
    weights: jax.Array,
    decay: float = 0.99,
) -> jax.Array:
    """EMA'd scatter-max: grid <- max(grid * decay, splatted weights).

    Args:
      positions: [..., 3] contracted sample positions (stop-gradient'd).
      weights: [...] non-negative occupancy evidence (rendering weights work:
        weight ~ alpha * transmittance is exactly "this cell mattered").
    """
    idx = _voxel_indices(jax.lax.stop_gradient(positions.reshape(-1, 3)), grid.shape[0])
    w = jax.lax.stop_gradient(weights.reshape(-1))
    decayed = grid * decay
    return decayed.at[idx[:, 0], idx[:, 1], idx[:, 2]].max(w)


def ray_pdf(
    grid: jax.Array,
    origins: jax.Array,
    directions: jax.Array,
    near: jax.Array,
    far: jax.Array,
    num_probes: int,
    contract_fn,
    floor: float = 1e-2,
):
    """Per-ray sampling histogram from grid occupancy along each ray.

    Probes `num_probes` uniform fenceposts in [near, far], contracts the probe
    positions, looks up occupancy, and returns (bins [B, P+1],
    weights [B, P]) ready for sorted_piecewise_constant_pdf. `floor` keeps a
    minimum density everywhere so unexplored space still gets samples.
    """
    t = jnp.linspace(0.0, 1.0, num_probes + 1)
    bins = near * (1.0 - t) + far * t  # [B, P+1]
    t_mids = 0.5 * (bins[..., :-1] + bins[..., 1:])
    pts = origins[..., None, :] + t_mids[..., None] * directions[..., None, :]
    occ = query(grid, contract_fn(pts))  # [B, P]
    return bins, occ + floor
