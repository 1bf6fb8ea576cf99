"""Device mesh + sharding helpers (1-D data-parallel mesh over all chips).

Rays are embarrassingly parallel: the batch axis shards across the mesh, the
(small) MLP parameters replicate, and the only cross-chip traffic is the
gradient psum XLA inserts — riding ICI within a slice. This replaces the
reference's pmap/pmean/shard plumbing (train_boxpose.py:370-374,
utils.py:193-209) with compiler-managed SPMD.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = DATA_AXIS) -> Mesh:
    """A 1-D mesh over the given (default: all) devices."""
    devices = jax.devices() if devices is None else list(devices)
    return Mesh(np.asarray(devices), (axis,))


def eval_mesh(mesh: Mesh, axis: str = DATA_AXIS) -> Mesh:
    """The mesh full-image rendering runs on: the training mesh itself.

    Round 3: multi-host eval splits every chunk ACROSS hosts on the global
    mesh (each host feeds its slice via make_array_from_process_local_data
    and the render jit all-gathers the replicated result — train.py
    make_render_fn), matching the reference's per-host ray slices + in-pmap
    all_gather (obbpose_model.py:448-473). The round-2 host-LOCAL eval mesh
    this function used to return rendered the entire image redundantly on
    every host; kept as a helper for callers that want the render mesh
    explicitly."""
    del axis
    return mesh


def replicate(mesh: Mesh) -> NamedSharding:
    """Sharding that replicates a pytree's leaves on every device."""
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Sharding that splits the leading (ray-batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: dict, mesh: Mesh, batch_size: int, axis: str = DATA_AXIS) -> dict:
    """Place a host batch on the mesh: ray-batch leaves sharded, rest replicated.

    A leaf is 'per-ray' iff its leading dimension equals the per-host batch
    size (pixels, rays.*, depth, sky); box tables / extents / ts replicate.
    The global batch size must divide the mesh size (checked — the reference
    enforces the same, train_boxpose.py:332-333).

    Multi-host: each process passes its LOCAL slice (global batch /
    process_count rays) and the global array is assembled across hosts; the
    reference does the same split host-side (obbpose_dataset.py:65).
    """
    n = mesh.devices.size
    if batch_size % n != 0:
        raise ValueError(f"batch_size {batch_size} must divide mesh size {n}")
    multihost = jax.process_count() > 1
    local_batch = batch_size // jax.process_count()
    sharded = batch_sharding(mesh, axis)
    replicated = replicate(mesh)

    def place(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] == local_batch:
            if multihost:
                return jax.make_array_from_process_local_data(sharded, x)
            return jax.device_put(x, sharded)
        return jax.device_put(x, replicated)

    return jax.tree.map(place, batch)
