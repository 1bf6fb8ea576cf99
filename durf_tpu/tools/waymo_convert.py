"""Waymo Open Dataset tfrecord -> scene-directory converter.

Replaces the reference's notebooks/waymo_data.ipynb + waymo_labels.ipynb
(SURVEY.md §2 'Waymo preprocessing'):
  * per-timestep images from the 5 cameras in rig order (FRONT, FRONT_LEFT,
    SIDE_LEFT, FRONT_RIGHT, SIDE_RIGHT), reordered from the proto's camera
    ids (waymo_data.ipynb cell 3);
  * camera-to-world poses: frame.pose (vehicle->world) @ extrinsic
    (camera->vehicle), mapped from Waymo's (x forward, y left, z up) camera
    frame to the OpenGL (x right, y up, -z forward) convention the loaders
    expect -> 19-column poses_bounds.npy with principal points (cell 4);
  * sparse per-pixel depth from the first-return LIDAR range images projected
    through each camera, min-depth z-buffer at the image downsample factor
    (cell 6, incl. dual-return overlap);
  * 3D boxes: moving vehicles (speed_x^2 + speed_y^2 > threshold) as per-
    timestep 4x4 centers + full extents (halved again by the loader),
    expressed in world frame via the vehicle pose (labels cells 5, 7, 9);
  * 2D instance-id masks rasterized from the projected 3D boxes
    (labels cells 13-15).

Requires `waymo-open-dataset` + `tensorflow`, which are not part of this
image — the import is gated and the CLI exits with instructions when absent.

Usage:
  python -m durf_tpu.tools.waymo_convert --tfrecord seg.tfrecord \
      --out_dir scene/ --timesteps 5 --start_frame 0 --factor 4
"""

from __future__ import annotations

import argparse
import os

import numpy as np

try:  # import-gated heavy deps
    import tensorflow as tf
    from waymo_open_dataset import dataset_pb2
    from waymo_open_dataset.utils import frame_utils

    _WAYMO_AVAILABLE = True
except ImportError:  # pragma: no cover - deps not in this image
    _WAYMO_AVAILABLE = False

# Proto camera ids in rig order: FRONT=1, FRONT_LEFT=2, SIDE_LEFT=3,
# FRONT_RIGHT=4 is actually... the rig order used by the reference is
# [FRONT, FRONT_LEFT, SIDE_LEFT, FRONT_RIGHT, SIDE_RIGHT] = ids [1, 2, 4, 3, 5]
# reordered from the proto enum (FRONT=1, FRONT_LEFT=2, FRONT_RIGHT=3,
# SIDE_LEFT=4, SIDE_RIGHT=5).
RIG_ORDER = (1, 2, 4, 3, 5)

# Waymo cameras look along +x with +z up; OpenGL cameras look along -z with
# +y up: columns (right, up, backward) = (-y, z, -x).
WAYMO_CAM_TO_OPENGL = np.array(
    [
        [0, -1, 0, 0],
        [0, 0, 1, 0],
        [-1, 0, 0, 0],
        [0, 0, 0, 1],
    ],
    np.float64,
).T


def camera_to_world_opengl(vehicle_to_world: np.ndarray, cam_extrinsic: np.ndarray) -> np.ndarray:
    """OpenGL-convention c2w from Waymo vehicle pose and camera extrinsic."""
    c2w_waymo = vehicle_to_world @ cam_extrinsic
    return c2w_waymo @ WAYMO_CAM_TO_OPENGL


def moving_vehicle_boxes(frame, speed_sq_threshold: float = 10.0) -> dict:
    """{track_id: (center_4x4_world, extent_3)} for moving vehicles.

    Speed test matches the reference: |v_x * v_y|-style metadata energy above
    threshold (waymo_labels.ipynb cell 5 uses speed_x*speed_y > 10; we use
    v_x^2 + v_y^2 which is the robust intent — both keep only movers).
    """
    vehicle_to_world = np.asarray(frame.pose.transform, np.float64).reshape(4, 4)
    out = {}
    for label in frame.laser_labels:
        if label.type != label.TYPE_VEHICLE:
            continue
        meta = label.metadata
        if meta.speed_x**2 + meta.speed_y**2 <= speed_sq_threshold:
            continue
        box = label.box
        heading = box.heading
        c, s = np.cos(heading), np.sin(heading)
        center_v = np.array(
            [
                [c, -s, 0, box.center_x],
                [s, c, 0, box.center_y],
                [0, 0, 1, box.center_z],
                [0, 0, 0, 1],
            ],
            np.float64,
        )
        center_w = vehicle_to_world @ center_v
        extent = np.array([box.length, box.width, box.height], np.float32)
        out[label.id] = (center_w.astype(np.float32), extent)
    return out


def project_lidar_depth(frame, factor: int, rig_index: int):  # pragma: no cover
    """Sparse [H/f, W/f] min-depth image for one camera from the first- and
    second-return range images (waymo_data.ipynb cell 6)."""
    (range_images, camera_projections, _, range_image_top_pose) = (
        frame_utils.parse_range_image_and_camera_projection(frame)
    )
    cam_id = RIG_ORDER[rig_index]
    calib = next(c for c in frame.context.camera_calibrations if c.name == cam_id)
    h, w = calib.height // factor, calib.width // factor
    depth = np.zeros((h, w), np.float32)

    for ri_index in (0, 1):  # dual returns
        points, cp_points = frame_utils.convert_range_image_to_point_cloud(
            frame, range_images, camera_projections, range_image_top_pose, ri_index=ri_index
        )
        points = np.concatenate(points)
        cp = np.concatenate(cp_points)
        dist = np.linalg.norm(points, axis=-1)
        for slot in (0, 1):  # each point may project into two cameras
            name = cp[:, 3 * slot]
            xs = cp[:, 3 * slot + 1] // factor
            ys = cp[:, 3 * slot + 2] // factor
            sel = (name == cam_id) & (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
            for x, y, d in zip(xs[sel].astype(int), ys[sel].astype(int), dist[sel]):
                if depth[y, x] == 0 or d < depth[y, x]:
                    depth[y, x] = d
    return depth


def rasterize_box_masks(frame, rig_index: int, factor: int, id_map: dict):  # pragma: no cover
    """Integer instance-id mask from projected 3D box corners
    (waymo_labels.ipynb cells 13-15): fill the 2D AABB of each box's
    image-projected corners, nearest box wins."""
    cam_id = RIG_ORDER[rig_index]
    calib = next(c for c in frame.context.camera_calibrations if c.name == cam_id)
    h, w = calib.height // factor, calib.width // factor
    mask = np.zeros((h, w), np.int32)
    zbuf = np.full((h, w), np.inf, np.float32)

    extrinsic = np.asarray(calib.extrinsic.transform, np.float64).reshape(4, 4)
    intrinsic = calib.intrinsic  # [f_u, f_v, c_u, c_v, k...]
    w2c = np.linalg.inv(extrinsic)

    for label in frame.laser_labels:
        if label.id not in id_map:
            continue
        box = label.box
        c, s = np.cos(box.heading), np.sin(box.heading)
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        half = np.array([box.length, box.width, box.height]) / 2
        corners = np.array(
            [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
        ) * half
        corners = (rot @ corners.T).T + np.array([box.center_x, box.center_y, box.center_z])
        cam_pts = (w2c[:3, :3] @ corners.T).T + w2c[:3, 3]
        front = cam_pts[:, 0] > 0.1  # waymo cam looks along +x
        if not front.any():
            continue
        u = intrinsic[0] * (-cam_pts[:, 1] / cam_pts[:, 0]) + intrinsic[2]
        v = intrinsic[1] * (-cam_pts[:, 2] / cam_pts[:, 0]) + intrinsic[3]
        u, v = u / factor, v / factor
        x0, x1 = int(max(np.floor(u.min()), 0)), int(min(np.ceil(u.max()), w))
        y0, y1 = int(max(np.floor(v.min()), 0)), int(min(np.ceil(v.max()), h))
        if x1 <= x0 or y1 <= y0:
            continue
        d = float(np.linalg.norm(cam_pts.mean(0)))
        region = zbuf[y0:y1, x0:x1]
        closer = d < region
        mask[y0:y1, x0:x1] = np.where(closer, id_map[label.id], mask[y0:y1, x0:x1])
        zbuf[y0:y1, x0:x1] = np.where(closer, d, region)
    return mask


def convert(  # pragma: no cover - requires waymo deps
    tfrecord: str,
    out_dir: str,
    timesteps: int = 5,
    start_frame: int = 0,
    frame_stride: int = 1,
    factor: int = 4,
    near: float = 0.1,
    far: float = 75.0,
):
    if not _WAYMO_AVAILABLE:
        raise ImportError(
            "waymo-open-dataset and tensorflow are required: "
            "pip install waymo-open-dataset-tf-2-11-0"
        )
    from PIL import Image

    from durf_tpu.data import format as diskfmt

    ds = tf.data.TFRecordDataset(tfrecord, compression_type="")
    frames = []
    for i, data in enumerate(ds):
        idx = i - start_frame
        if idx < 0 or idx % frame_stride:
            continue
        frame = dataset_pb2.Frame()
        frame.ParseFromString(bytearray(data.numpy()))
        frames.append(frame)
        if len(frames) >= timesteps:
            break

    # Track ids present in every selected frame, renumbered densely from 1.
    movers = [moving_vehicle_boxes(f) for f in frames]
    common = sorted(set.intersection(*[set(m) for m in movers])) if movers else []
    id_map = {tid: i + 1 for i, tid in enumerate(common)}

    images, depths, skies, insts = [], [], [], []
    poses_hwf, bounds, pps = [], [], []
    boxes_3d: dict = {}
    for t, frame in enumerate(frames):
        v2w = np.asarray(frame.pose.transform, np.float64).reshape(4, 4)
        for tid, (center, extent) in movers[t].items():
            if tid in id_map:
                boxes_3d[f"{t + 1}_{id_map[tid]}_center"] = center
                boxes_3d[f"{t + 1}_{id_map[tid]}_ext"] = extent
        by_name = {im.name: im for im in frame.images}
        for rig_index, cam_id in enumerate(RIG_ORDER):
            calib = next(c for c in frame.context.camera_calibrations if c.name == cam_id)
            img = np.asarray(Image.open(__import__("io").BytesIO(by_name[cam_id].image)))
            h, w = calib.height // factor, calib.width // factor
            img = np.asarray(Image.fromarray(img).resize((w, h), Image.LANCZOS), np.float32) / 255.0
            images.append(img)

            extrinsic = np.asarray(calib.extrinsic.transform, np.float64).reshape(4, 4)
            c2w = camera_to_world_opengl(v2w, extrinsic)
            hwf = np.array([calib.height, calib.width, calib.intrinsic[0]], np.float32)
            poses_hwf.append(
                np.concatenate([c2w[:3, :4], hwf[:, None]], axis=1).astype(np.float32)
            )
            bounds.append([near, far])
            pps.append([calib.intrinsic[2], calib.intrinsic[3]])

            depths.append(project_lidar_depth(frame, factor, rig_index))
            # No segmentation model in this toolchain: sky = rows above the
            # horizon with no LIDAR return (a serviceable heuristic; swap in
            # an off-the-shelf segmenter's masks if available).
            sky = (depths[-1] == 0).astype(np.float32)
            sky[h // 2 :] = 0.0
            skies.append(sky)
            insts.append(rasterize_box_masks(frame, rig_index, factor, id_map))

    os.makedirs(out_dir, exist_ok=True)
    diskfmt.save_scene(
        out_dir,
        images,
        np.stack(poses_hwf),
        np.asarray(bounds, np.float32),
        boxes_3d,
        depths,
        skies,
        insts,
        factor=factor,
        principal_points=np.asarray(pps, np.float32),
    )


def main(argv=None):  # pragma: no cover
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tfrecord", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--timesteps", type=int, default=5)
    p.add_argument("--start_frame", type=int, default=0)
    p.add_argument("--frame_stride", type=int, default=1)
    p.add_argument("--factor", type=int, default=4)
    args = p.parse_args(argv)
    if not _WAYMO_AVAILABLE:
        raise SystemExit(
            "waymo-open-dataset + tensorflow are not installed in this image; "
            "run this converter in an environment with "
            "`pip install waymo-open-dataset-tf-2-11-0`."
        )
    convert(
        args.tfrecord,
        args.out_dir,
        timesteps=args.timesteps,
        start_frame=args.start_frame,
        frame_stride=args.frame_stride,
        factor=args.factor,
    )


if __name__ == "__main__":
    main()
