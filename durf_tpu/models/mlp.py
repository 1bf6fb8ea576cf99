"""The NeRF trunk MLP with skip connections and a view-conditioned color head.

Architecture parity with reference obbpose_model.py:293-418 (MLP and BoxMLP
are the same module at different widths there; here one module covers both).
TPU-first: operates on [..., S, F] directly (Dense contracts the last axis —
no reshape round-trips), with optional bfloat16 compute (params stay fp32,
activations/matmuls run bf16 on the MXU, outputs return fp32).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from durf_tpu.configs import MLPConfig

_ACTIVATIONS = {
    "relu": nn.relu,
    "sigmoid": nn.sigmoid,
    "softplus": nn.softplus,
    "gelu": nn.gelu,
}


def get_activation(name: str):
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"unknown activation {name!r}") from None


class NerfMLP(nn.Module):
    """Trunk of `net_depth` layers (input re-concatenated after every
    `skip_layer` layers), a density head, and — when a condition (encoded view
    direction) is given — a bottleneck + conditioned color head.

    Reference obbpose_model.py:305-354: the skip concatenates *after* the
    activation of layer i when i % skip_layer == 0 and i > 0.
    """

    config: MLPConfig
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, condition: Optional[jax.Array] = None):
        """Args:
          x: [..., S, F] encoded sample features.
          condition: [..., F_c] encoded view directions (no sample axis; it is
            broadcast across samples).

        Returns:
          (raw_rgb [..., S, 3], raw_density [..., S, 1]) in float32.
        """
        cfg = self.config
        act = get_activation(cfg.net_activation)
        dense = lambda width, name: nn.Dense(
            width,
            kernel_init=jax.nn.initializers.glorot_uniform(),
            dtype=self.compute_dtype,
            name=name,
        )

        x = x.astype(self.compute_dtype)
        inputs = x
        for i in range(cfg.net_depth):
            x = act(dense(cfg.net_width, f"trunk_{i}")(x))
            if i % cfg.skip_layer == 0 and i > 0:
                x = jnp.concatenate([x, inputs], axis=-1)
        raw_density = dense(cfg.num_density_channels, "density_head")(x)

        if condition is not None:
            bottleneck = dense(cfg.net_width, "bottleneck")(x)
            # Broadcast the per-ray condition over the sample axis.
            cond = jnp.broadcast_to(
                condition[..., None, :].astype(self.compute_dtype),
                bottleneck.shape[:-1] + (condition.shape[-1],),
            )
            x = jnp.concatenate([bottleneck, cond], axis=-1)
            for i in range(cfg.net_depth_condition):
                x = act(dense(cfg.net_width_condition, f"head_{i}")(x))
        raw_rgb = dense(cfg.num_rgb_channels, "rgb_head")(x)
        return raw_rgb.astype(jnp.float32), raw_density.astype(jnp.float32)
