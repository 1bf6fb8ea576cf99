"""On-disk scene-directory format primitives (the L3<->L6 contract).

A scene directory contains (SURVEY.md §1; produced by the data tooling in
tools/):
  images_{factor}/          RGB PNG/JPG at each downsample factor
  poses_bounds.npy          [N, 17] (3x5 [R|t|hwf] flattened + near/far) or
                            [N, 19] with principal point (cx, cy) appended
  3D_boxes.npy              dict: "{ts}_{obj}_center" (4x4), "{ts}_{obj}_ext" (3,)
  depth_images.npz          arr_0: per-image [H, W] metric depth (0 = no return)
  sky_masks.npz             arr_0: per-image [H, W] binary sky masks
  2D_boxes.npz              arr_0: per-image [H, W] integer instance-id masks
"""

from __future__ import annotations

import os
import re
from os import path

import numpy as np
from PIL import Image


def natsorted(names):
    """Natural sort ('img2' < 'img10') — replaces the natsort dependency."""

    def key(s):
        return [int(tok) if tok.isdigit() else tok.lower() for tok in re.split(r"(\d+)", s)]

    return sorted(names, key=key)


def load_image_dir(data_dir: str, factor: int = 0):
    """Load images_{factor}/ as a list of [H, W, 3] float32 arrays in [0, 1].

    Alpha channels are dropped (reference obbpose_dataset.py:391-395).
    """
    suffix = f"_{factor}" if factor > 0 else ""
    imgdir = path.join(data_dir, "images" + suffix)
    if not path.exists(imgdir):
        raise FileNotFoundError(f"image folder {imgdir} does not exist")
    files = [
        path.join(imgdir, f)
        for f in natsorted(os.listdir(imgdir))
        if f.lower().endswith(("jpg", "jpeg", "png"))
    ]
    images = []
    for f in files:
        with open(f, "rb") as fh:
            images.append(np.asarray(Image.open(fh), dtype=np.float32)[..., :3] / 255.0)
    return images


def load_poses_bounds(data_dir: str):
    """Load poses_bounds.npy.

    Returns:
      (poses [N, 3, 5], bounds [N, 2], principal_points [N, 2] or None).
      17 columns = CARLA layout (obbpose_dataset.py:399-406); 19 columns
      appends the principal point (Waymo, obbpose_dataset.py:1659-1664).
    """
    arr = np.load(path.join(data_dir, "poses_bounds.npy"))
    if arr.shape[-1] == 17:
        pp = None
    elif arr.shape[-1] == 19:
        pp = arr[:, 17:].astype(np.float32)
    else:
        raise ValueError(f"poses_bounds.npy must have 17 or 19 cols, got {arr.shape}")
    poses = arr[:, :15].reshape([-1, 3, 5]).astype(np.float32)
    bounds = arr[:, 15:17].astype(np.float32)
    return poses, bounds, pp


def load_boxes_3d(data_dir: str) -> dict:
    """Load the 3D_boxes.npy dict of per-timestep box poses and extents."""
    return np.load(path.join(data_dir, "3D_boxes.npy"), allow_pickle=True).item()


def load_npz_stack(data_dir: str, name: str):
    """Load an arr_0-keyed npz of per-image arrays as a list."""
    data = np.load(path.join(data_dir, name), allow_pickle=True)["arr_0"]
    return [np.asarray(x) for x in data]


def save_scene(
    data_dir: str,
    images: list,
    poses_hwf: np.ndarray,
    bounds: np.ndarray,
    boxes_3d: dict,
    depths: list,
    sky_masks: list,
    masks_2d: list,
    factor: int = 4,
    principal_points: np.ndarray | None = None,
    base_factor: int | None = None,
):
    """Write a complete scene directory in the reference on-disk format.

    Per-factor npz files for non-base pyramid levels get a _{factor} suffix
    (the c2f contract, reference c2f_obb_dataset.py:628-653).
    """
    base_factor = factor if base_factor is None else base_factor
    suffix = "" if factor == base_factor else f"_{factor}"
    os.makedirs(path.join(data_dir, f"images_{factor}"), exist_ok=True)
    for i, img in enumerate(images):
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            path.join(data_dir, f"images_{factor}", f"img_{i:04d}.png")
        )
    flat = poses_hwf.reshape([len(images), 15])
    cols = [flat, bounds.reshape(len(images), 2)]
    if principal_points is not None:
        cols.append(principal_points.reshape(len(images), 2))
    np.save(path.join(data_dir, "poses_bounds.npy"), np.concatenate(cols, axis=-1))
    np.save(path.join(data_dir, "3D_boxes.npy"), boxes_3d, allow_pickle=True)

    def to_array(lst):
        # Stack when all images share a resolution, else a ragged object array
        # (the CARLA 5-camera rig mixes resolutions).
        if len({x.shape for x in lst}) == 1:
            return np.stack(lst)
        arr = np.empty(len(lst), dtype=object)
        for i, x in enumerate(lst):
            arr[i] = x
        return arr

    np.savez(path.join(data_dir, f"depth_images{suffix}.npz"), to_array(depths))
    np.savez(path.join(data_dir, f"sky_masks{suffix}.npz"), to_array(sky_masks))
    if not suffix:  # instance masks exist only at the base factor
        np.savez(path.join(data_dir, "2D_boxes.npz"), to_array(masks_2d))
