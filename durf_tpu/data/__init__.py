"""Data layer: on-disk scene format IO, unified loaders, prefetch pipeline.

One loader parameterized by a dataset spec replaces the reference's three
copy-pasted 2k-line Dataset classes (internal/obbpose_dataset.py,
internal/c2f_obb_dataset.py). The on-disk contract (SURVEY.md §1) is kept
exactly, so reference-prepared scene directories load unchanged.
"""

from durf_tpu.data.pipeline import RayDataset, get_dataset
from durf_tpu.data.scene import DATASET_SPECS, Scene, load_scene

__all__ = ["RayDataset", "get_dataset", "Scene", "load_scene", "DATASET_SPECS"]
