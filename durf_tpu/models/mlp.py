"""The NeRF trunk MLP with skip connections and a view-conditioned color head.

Architecture parity with reference obbpose_model.py:293-418 (MLP and BoxMLP
are the same module at different widths there; here one module covers both).

TPU-first: two execution paths over ONE parameter tree —
  * the XLA path: split-matmul formulation (concats realized as row-split
    matmuls), optional bfloat16 compute with fp32 params/outputs;
  * the fused Pallas path (`use_pallas=True`): the whole MLP in a single
    VMEM-resident kernel (durf_tpu/ops/pallas/fused_mlp.py) — same weights,
    same math, no per-layer HBM round-trips.
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


class _DenseParams(nn.Module):
    """Declares a Dense layer's kernel/bias (same tree layout as nn.Dense)
    without fixing how they are applied."""

    features: int

    @nn.compact
    def __call__(self, in_dim: int):
        kernel = self.param(
            "kernel", jax.nn.initializers.glorot_uniform(), (in_dim, self.features)
        )
        bias = self.param("bias", jax.nn.initializers.zeros, (self.features,))
        return kernel, bias


class NerfMLP(nn.Module):
    """Trunk of `net_depth` layers (input re-concatenated after every
    `skip_layer` layers), a density head, and — when a condition (encoded view
    direction) is given — a bottleneck + conditioned color head.

    Reference obbpose_model.py:305-354: the skip concatenates *after* the
    activation of layer i when i % skip_layer == 0 and i > 0.
    """

    config: MLPConfig
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    # Wrap the XLA (non-Pallas) forward in jax.checkpoint: recompute the
    # trunk in the backward instead of storing per-layer activations
    # (ModelConfig.remat_mlp; lets `--no-pallas` survive batch 8192 on
    # 15.75 GB HBM). No effect on the Pallas path.
    remat: bool = False
    pallas_tile: int = 2048
    # Blend gate*x + (1-gate)*fill inside the Pallas kernel instead of in XLA.
    # Measured SLOWER at the flagship point (11.29M vs 11.55M ray-samples/s:
    # the vmapped kernel re-reads the shared features per object and writes
    # per-object dx), but it avoids materializing the [N_obj*N, F] blend — a
    # lever for scenes with many objects.
    pallas_gate_in_kernel: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        condition: Optional[jax.Array] = None,
        gate: Optional[jax.Array] = None,
        fill: Optional[jax.Array] = None,
        x_feature_major: bool = False,
        out_feature_major: bool = False,
    ):
        """Args:
          x: [..., S, F] encoded sample features — or FEATURE-MAJOR
            [F, ..., S] with x_feature_major=True (the coordinate-major
            encode's native layout; consumed via transposed-lhs dots so the
            row-major [N, F] array is never assembled — docs/DESIGN.md).
          condition: [..., F_c] encoded view directions (no sample axis; it is
            broadcast across samples).
          gate: optional [..., 1] 0/1 mask (no sample axis; broadcast like the
            condition). The effective input is gate*x + (1-gate)*fill — on the
            Pallas path the blend happens IN-KERNEL so the gated features are
            never materialized (the scene-graph object masking,
            models/mipnerf.py).
          fill: [1, 1, F] constant row used where gate == 0 (required with
            gate).
          out_feature_major: return ([3, ..., S], [1, ..., S]) channel planes
            (the heads emit transposed outputs directly; the compositing side
            then runs on dense tiles — docs/DESIGN.md).

        Returns:
          (raw_rgb [..., S, 3], raw_density [..., S, 1]) in float32 — or the
          feature-major shapes above with out_feature_major=True.
        """
        cfg = self.config
        if cfg.net_activation != "relu":
            raise NotImplementedError("fused/split MLP paths assume relu")
        fm = x_feature_major
        in_dim = x.shape[0] if fm else x.shape[-1]
        cond_dim = 0 if condition is None else condition.shape[-1]

        # Declare every layer's parameters (kernel order; skip concat and the
        # condition concat are folded into the consuming layer's input dim).
        weights = []
        for i in range(cfg.net_depth):
            if i == 0:
                d = in_dim
            elif (i - 1) % cfg.skip_layer == 0 and (i - 1) > 0:
                d = cfg.net_width + in_dim
            else:
                d = cfg.net_width
            weights += list(_DenseParams(cfg.net_width, name=f"trunk_{i}")(d))
        weights += list(
            _DenseParams(cfg.num_density_channels, name="density_head")(cfg.net_width)
        )
        head_width = cfg.net_width
        if condition is not None:
            weights += list(_DenseParams(cfg.net_width, name="bottleneck")(cfg.net_width))
            for i in range(cfg.net_depth_condition):
                d = cfg.net_width + cond_dim if i == 0 else cfg.net_width_condition
                weights += list(
                    _DenseParams(cfg.net_width_condition, name=f"head_{i}")(d)
                )
            head_width = cfg.net_width_condition
        weights += list(_DenseParams(cfg.num_rgb_channels, name="rgb_head")(head_width))

        # Flatten [..., S, F] -> [N, F] (or [F, ..., S] -> [F, N]); broadcast
        # the per-ray condition (and the optional gate) over samples.
        batch_shape = x.shape[1:] if fm else x.shape[:-1]
        flat_x = x.reshape(in_dim, -1) if fm else x.reshape(-1, in_dim)
        if condition is not None:
            cond_b = jnp.broadcast_to(
                condition[..., None, :], batch_shape + (cond_dim,)
            ).reshape(-1, cond_dim)
        else:
            cond_b = jnp.zeros((flat_x.shape[0], 0), flat_x.dtype)
        if gate is not None:
            gate_b = jnp.broadcast_to(
                gate[..., None, :], batch_shape + (1,)
            ).reshape(-1, 1)
            fill_row = fill.reshape(in_dim, 1) if fm else fill.reshape(1, in_dim)

        from durf_tpu.ops.pallas import fused_mlp as fk

        if self.use_pallas and condition is not None and not self.is_initializing():
            interpret = jax.default_backend() == "cpu"
            # Feed the kernel in compute dtype: the convert fuses into the
            # producing encode fusion (no separate cast pass at the custom-
            # call boundary) and halves the [N, F] HBM traffic under bf16.
            if (
                gate is not None
                and self.pallas_gate_in_kernel
                and not fm
                and not out_feature_major
            ):
                raw_rgb, raw_density = fk.fused_nerf_mlp_gated(
                    flat_x.astype(self.compute_dtype),
                    gate_b,
                    fill_row.astype(self.compute_dtype),
                    cond_b.astype(self.compute_dtype),
                    weights,
                    cfg,
                    self.pallas_tile,
                    interpret,
                )
            else:
                if gate is not None:
                    g = gate_b[:, 0][None, :] if fm else gate_b
                    flat_x = g * flat_x + (1.0 - g) * fill_row
                raw_rgb, raw_density = fk.fused_nerf_mlp(
                    flat_x.astype(self.compute_dtype),
                    cond_b.astype(self.compute_dtype),
                    weights,
                    cfg,
                    self.pallas_tile,
                    interpret,
                    fm,
                    out_feature_major,
                )
        else:
            if gate is not None:
                g = gate_b[:, 0][None, :] if fm else gate_b
                flat_x = g * flat_x + (1.0 - g) * fill_row

            def xla_forward(x_, c_, w_):
                return fk.mlp_reference_forward(
                    cfg,
                    x_,
                    c_,
                    w_,
                    has_condition=condition is not None,
                    dtype=self.compute_dtype,
                    x_fm=fm,
                    out_fm=out_feature_major,
                )

            if self.remat:
                # Recompute the trunk in the backward instead of storing
                # every [N, width] activation: the XLA-path backward at
                # batch 8192 x 256 samples holds ~28 GB of activations
                # (> 15.75 GB HBM, CLAUDE.md trap #5); with remat the peak
                # is one layer. The Pallas path needs no flag — its custom
                # backward already recomputes in-tile.
                xla_forward = jax.checkpoint(xla_forward)
            raw_rgb, raw_density = xla_forward(flat_x, cond_b, weights)
        if out_feature_major:
            raw_rgb = raw_rgb.reshape((cfg.num_rgb_channels,) + batch_shape)
            raw_density = raw_density.reshape((cfg.num_density_channels,) + batch_shape)
        else:
            raw_rgb = raw_rgb.reshape(batch_shape + (cfg.num_rgb_channels,))
            raw_density = raw_density.reshape(batch_shape + (cfg.num_density_channels,))
        return raw_rgb.astype(jnp.float32), raw_density.astype(jnp.float32)
