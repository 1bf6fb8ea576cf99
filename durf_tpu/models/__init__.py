"""Model zoo: Mip-NeRF MLPs and the dynamic scene-graph radiance field."""

from durf_tpu.models.mlp import NerfMLP
from durf_tpu.models.mipnerf import MipNerf, construct_model, render_image

__all__ = ["NerfMLP", "MipNerf", "construct_model", "render_image"]
