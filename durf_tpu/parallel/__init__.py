"""Mesh construction and sharding: the distributed-execution layer.

The reference's data parallelism is jax.pmap + lax.pmean + flax replicate
(train_boxpose.py:370-374,253; SURVEY.md §2 parallelism inventory). Here it is
the modern TPU idiom instead: one jax.sharding.Mesh, NamedSharding annotations
on the ray-batch axis, and a single jit whose gradient all-reduce XLA lowers
to ICI collectives automatically. Multi-host (DCN) falls out of the same code
via jax.distributed + per-host data loading.
"""

from durf_tpu.parallel.mesh import (
    batch_sharding,
    eval_mesh,
    make_mesh,
    replicate,
    shard_batch,
)

__all__ = ["make_mesh", "batch_sharding", "shard_batch", "replicate", "eval_mesh"]
