"""Pallas TPU kernels for the hot path."""

from durf_tpu.ops.pallas.fused_mlp import fused_nerf_mlp, mlp_params_from_flax

__all__ = ["fused_nerf_mlp", "mlp_params_from_flax"]
