"""Ray, frustum, encoding, sampling, rendering and scene-graph box ops.

One deduplicated implementation of the math that the reference spreads (and
duplicates) across internal/mip.py, internal/mip360.py and
internal/box_helpers.py.
"""

from durf_tpu.ops.frustum import (
    cast_rays,
    cast_rays_cm,
    conical_frustum_to_gaussian,
    cylinder_to_gaussian,
    lift_gaussian,
    lift_gaussian_cm,
)
from durf_tpu.ops.encoding import (
    expected_sin,
    integrated_pos_enc,
    integrated_pos_enc_cm,
    pos_enc,
    windowed_ipe,
    windowed_ipe_cm,
    windowed_pos_enc,
)
from durf_tpu.ops.sampling import resample_along_rays, sample_along_rays
from durf_tpu.ops.render import (
    volumetric_density,
    volumetric_rendering,
    volumetric_rendering_cm,
)
from durf_tpu.ops.contraction import contract, contract_gaussian, contract_gaussian_diag
from durf_tpu.ops.boxes import (
    axis_angle_to_matrix,
    ray_box_intersection,
    rotate_vec,
    world_to_box_frames,
)

__all__ = [
    "cast_rays",
    "conical_frustum_to_gaussian",
    "cylinder_to_gaussian",
    "lift_gaussian",
    "expected_sin",
    "integrated_pos_enc",
    "pos_enc",
    "windowed_ipe",
    "windowed_pos_enc",
    "resample_along_rays",
    "sample_along_rays",
    "volumetric_density",
    "volumetric_rendering",
    "contract",
    "contract_gaussian",
    "contract_gaussian_diag",
    "axis_angle_to_matrix",
    "ray_box_intersection",
    "rotate_vec",
    "world_to_box_frames",
]
