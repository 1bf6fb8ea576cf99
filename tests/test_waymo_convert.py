"""Waymo converter unit tests with synthetic proto-shaped frames.

No waymo-open-dataset/tensorflow needed: the converter's geometry/selection
core (durf_tpu/tools/waymo_convert.py) operates on plain attribute access
over Frame-shaped objects, reproduced here with tiny fakes. Contract under
test: notebooks/waymo_data.ipynb cells 3-6, waymo_labels.ipynb cells 5-15.
"""

import dataclasses
import io
from typing import List

import numpy as np
import pytest
from PIL import Image

from durf_tpu.tools import waymo_convert as wc


# ---------------------------------------------------------------------------
# Proto-shaped fakes (only the attributes the converter touches).
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class FakeBox:
    center_x: float
    center_y: float
    center_z: float
    heading: float
    length: float
    width: float
    height: float


@dataclasses.dataclass
class FakeMeta:
    speed_x: float
    speed_y: float


@dataclasses.dataclass
class FakeLabel:
    id: str
    box: FakeBox
    metadata: FakeMeta
    type: int = 1
    TYPE_VEHICLE: int = 1


@dataclasses.dataclass
class FakeTransform:
    transform: list


@dataclasses.dataclass
class FakeCalib:
    name: int
    width: int
    height: int
    intrinsic: list
    extrinsic: FakeTransform


@dataclasses.dataclass
class FakeImage:
    name: int
    image: bytes


@dataclasses.dataclass
class FakeContext:
    camera_calibrations: list


@dataclasses.dataclass
class FakeFrame:
    pose: FakeTransform
    laser_labels: list
    images: list
    context: FakeContext


def rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)


def make_pose(rot, t):
    m = np.eye(4)
    m[:3, :3] = rot
    m[:3, 3] = t
    return m


def png_bytes(h, w, value):
    img = np.full((h, w, 3), value, np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def make_frame(t: int, movers=("a", "b"), slow=("s",), img_hw=(32, 48)) -> FakeFrame:
    """One fake frame: ego at x = 3t (driving +x), 5 cameras, some labels."""
    h, w = img_hw
    v2w = make_pose(rot_z(0.05 * t), [3.0 * t, 0.1 * t, 1.0])
    labels = []
    for i, tid in enumerate(movers):
        labels.append(
            FakeLabel(
                id=tid,
                box=FakeBox(8.0 + i + 0.5 * t, 2.0 * i, 0.8, 0.3 * i, 4.2, 1.9, 1.6),
                metadata=FakeMeta(speed_x=3.0, speed_y=2.0),
            )
        )
    for tid in slow:
        labels.append(
            FakeLabel(
                id=tid,
                box=FakeBox(15.0, -3.0, 0.8, 0.0, 4.0, 2.0, 1.5),
                metadata=FakeMeta(speed_x=0.5, speed_y=0.5),
            )
        )
    calibs, images = [], []
    for cam_id in range(1, 6):
        # Camera extrinsic: at the front of the vehicle, yawed per camera.
        ext = make_pose(rot_z(0.3 * (cam_id - 1)), [1.5, 0.2 * (cam_id - 3), 1.8])
        calibs.append(
            FakeCalib(
                name=cam_id,
                width=w,
                height=h,
                intrinsic=[60.0, 60.0, w / 2, h / 2, 0, 0, 0, 0, 0],
                extrinsic=FakeTransform(list(ext.reshape(-1))),
            )
        )
        images.append(FakeImage(name=cam_id, image=png_bytes(h, w, 40 * cam_id)))
    return FakeFrame(
        pose=FakeTransform(list(v2w.reshape(-1))),
        laser_labels=labels,
        images=images,
        context=FakeContext(calibs),
    )


# ---------------------------------------------------------------------------
# Unit tests.
# ---------------------------------------------------------------------------


def test_rig_order_matches_reference():
    # waymo_labels.ipynb cell 13 `order = [1, 2, 4, 3, 5]`.
    assert wc.RIG_ORDER == (1, 2, 4, 3, 5)


def test_camera_to_world_reference_sandwich():
    # Hand-compute trafo2 @ (v2w @ c2v) @ opengl2waymo with the literal
    # matrices from waymo_data.ipynb cell 4.
    opengl2waymo = np.array(
        [[0, 0, -1, 0], [-1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1]], np.float64
    )
    trafo2 = np.array(
        [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], np.float64
    )
    rng = np.random.default_rng(0)
    from scipy.spatial.transform import Rotation as R

    v2w = make_pose(R.random(random_state=1).as_matrix(), rng.normal(size=3) * 10)
    c2v = make_pose(R.random(random_state=2).as_matrix(), rng.normal(size=3))
    expect = trafo2 @ (v2w @ c2v) @ opengl2waymo
    got = wc.camera_to_world_opengl(v2w, c2v)
    np.testing.assert_allclose(got, expect, atol=1e-12)
    # Result is a proper rigid transform.
    rot = got[:3, :3]
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-10)
    np.testing.assert_allclose(np.linalg.det(rot), 1.0, atol=1e-10)


def test_camera_to_world_identity_geometry():
    # With identity vehicle pose and extrinsic: the Waymo camera looks along
    # world +x. In the NeRF world (trafo2: (x,y,z)->(-x,z,y)) that becomes
    # -x... verify the OpenGL convention columns explicitly.
    c2w = wc.camera_to_world_opengl(np.eye(4), np.eye(4))
    # OpenGL camera: col0 = right, col1 = up, col2 = backward.
    right, up, backward = c2w[:3, 0], c2w[:3, 1], c2w[:3, 2]
    # Waymo cam right = -y_cam = world -y -> NeRF world -z.
    np.testing.assert_allclose(right, [0, 0, -1], atol=1e-12)
    # Waymo cam up = +z_cam = world +z -> NeRF world +y.
    np.testing.assert_allclose(up, [0, 1, 0], atol=1e-12)
    # Waymo cam forward = +x_cam = world +x -> NeRF -x; backward = +x (NeRF).
    np.testing.assert_allclose(backward, [1, 0, 0], atol=1e-12)


def test_moving_vehicle_boxes_speed_filter_and_contract():
    frame = make_frame(t=2)
    out = wc.moving_vehicle_boxes(frame)
    assert set(out) == {"a", "b"}  # slow label 's' filtered
    center, extent = out["a"]
    # Extent order is (width, height, length) — waymo_labels.ipynb cell 9.
    np.testing.assert_allclose(extent, [1.9, 1.6, 4.2])
    # Center matches the reference sandwich applied to the vehicle-frame box
    # pose (same trafo2/opengl2waymo as the cameras).
    v2w = np.asarray(frame.pose.transform).reshape(4, 4)
    box = frame.laser_labels[0].box
    pose_v = make_pose(rot_z(box.heading), [box.center_x, box.center_y, box.center_z])
    expect = wc.WAYMO_WORLD_TO_NERF @ v2w @ pose_v @ wc.OPENGL_TO_WAYMO_CAM
    np.testing.assert_allclose(center, expect, atol=1e-5)
    rot = center[:3, :3]
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-5)


def test_select_common_movers_dense_renumbering():
    movers = [
        {"x": None, "y": None, "z": None},
        {"y": None, "z": None},  # 'x' drops out in frame 1
        {"z": None, "y": None, "w": None},
    ]
    id_map = wc.select_common_movers(movers)
    assert id_map == {"y": 1, "z": 2}
    assert wc.select_common_movers([]) == {}


def test_zbuffer_min_depth_dual_slots_and_returns():
    # 3 points: one lands in-cam via slot 0, one via slot 1 on the SAME pixel
    # with larger depth (min must win), one out of bounds.
    cp = np.array(
        [
            [1, 8, 4, 0, 0, 0],  # cam 1, full-res px (8, 4) -> /4 = (2, 1)
            [9, 0, 0, 1, 9, 5],  # slot 1: cam 1, px (9, 5) -> (2, 1) again
            [1, 400, 4, 0, 0, 0],  # out of bounds after /4
        ]
    )
    dists = np.array([7.0, 3.0, 2.0])
    depth = wc.zbuffer_min_depth(cp, dists, cam_id=1, factor=4, height=8, width=12)
    assert depth.shape == (8, 12)
    assert depth[1, 2] == 3.0  # min of 7.0 and 3.0
    assert (depth > 0).sum() == 1  # everything else has no return
    # Dual-return merge: a second pass with a closer return updates the pixel;
    # a farther one does not.
    depth2 = wc.zbuffer_min_depth(
        np.array([[1, 8, 4, 0, 0, 0]]), np.array([1.5]), 1, 4, 8, 12, depth
    )
    assert depth2[1, 2] == 1.5
    depth3 = wc.zbuffer_min_depth(
        np.array([[1, 8, 4, 0, 0, 0]]), np.array([9.0]), 1, 4, 8, 12, depth2
    )
    assert depth3[1, 2] == 1.5


def test_rasterize_box_masks_front_fill_and_zorder():
    h, w = 32, 48
    calib = FakeCalib(
        name=1,
        width=w,
        height=h,
        intrinsic=[40.0, 40.0, w / 2, h / 2, 0, 0, 0, 0, 0],
        extrinsic=FakeTransform(list(np.eye(4).reshape(-1))),
    )
    near_box = FakeLabel(
        "near", FakeBox(6.0, 0.0, 0.0, 0.0, 2.0, 2.0, 2.0), FakeMeta(3, 3)
    )
    # Offset in y so part of its AABB sticks out past the near box's.
    far_box = FakeLabel(
        "far", FakeBox(12.0, 4.0, 0.0, 0.0, 2.0, 2.0, 2.0), FakeMeta(3, 3)
    )
    behind = FakeLabel(
        "behind", FakeBox(-6.0, 0.0, 0.0, 0.0, 2.0, 2.0, 2.0), FakeMeta(3, 3)
    )
    frame = FakeFrame(
        pose=FakeTransform(list(np.eye(4).reshape(-1))),
        laser_labels=[far_box, near_box, behind],
        images=[],
        context=FakeContext([calib]),
    )
    mask = wc.rasterize_box_masks(
        frame, rig_index=0, factor=1, id_map={"near": 1, "far": 2, "behind": 3}
    )
    assert mask.shape == (h, w)
    # Image center: both boxes project there; the NEAR one must win.
    assert mask[h // 2, w // 2] == 1
    assert (mask == 2).any()  # far box visible around the near one
    assert not (mask == 3).any()  # behind-camera box culled
    # Near box at distance 6 with half-extent 1 and f=40: half-width in
    # pixels ~ 40 * 1/6 ~ 6.7 -> the fill is a bounded AABB, not the image.
    assert 20 < (mask == 1).sum() < 500


def test_heuristic_sky_mask_and_external_masks(tmp_path):
    depth = np.zeros((8, 12), np.float32)
    depth[6, 3] = 5.0  # return below horizon
    depth[1, 1] = 9.0  # return above horizon
    sky = wc.heuristic_sky_mask(depth)
    assert sky[0, 0] == 1.0  # no return above horizon -> sky
    assert sky[1, 1] == 0.0  # return above horizon -> not sky
    assert sky[4:].sum() == 0  # below horizon never sky

    masks = [np.ones((8, 12), np.float32) * (i % 2) for i in range(10)]
    np.savez(tmp_path / "sky.npz", np.stack(masks))
    loaded = wc.load_sky_masks(str(tmp_path / "sky.npz"), 10)
    assert len(loaded) == 10
    with pytest.raises(ValueError):
        wc.load_sky_masks(str(tmp_path / "sky.npz"), 15)


def test_convert_frames_end_to_end_loads_in_our_loader(tmp_path):
    frames = [make_frame(t) for t in range(3)]

    def stub_depth(frame, factor, rig_index):
        h = frame.context.camera_calibrations[0].height // factor
        w = frame.context.camera_calibrations[0].width // factor
        d = np.zeros((h, w), np.float32)
        d[h // 2 :, :] = 10.0 + rig_index
        return d

    out = str(tmp_path / "scene")
    # Two pyramid levels: base factor 4 + a _8-suffixed coarse level (the c2f
    # on-disk contract, carla_postprocess parity).
    wc.convert_frames(frames, out, factors=(4, 8), near=0.1, far=75.0, depth_fn=stub_depth)

    # On-disk contract: 19-col poses_bounds, per-timestep box keys, npz maps.
    arr = np.load(f"{out}/poses_bounds.npy")
    assert arr.shape == (15, 19)
    import os

    assert os.path.isdir(f"{out}/images_4") and os.path.isdir(f"{out}/images_8")
    assert os.path.exists(f"{out}/depth_images_8.npz")
    assert os.path.exists(f"{out}/sky_masks_8.npz")
    boxes = np.load(f"{out}/3D_boxes.npy", allow_pickle=True).item()
    assert set(boxes) == {
        f"{t}_{i}_{k}" for t in (1, 2, 3) for i in (1, 2) for k in ("center", "ext")
    }
    np.testing.assert_allclose(boxes["1_1_ext"], [1.9, 1.6, 4.2])

    # And the whole directory round-trips through the Waymo loader spec.
    from tests.test_data import carla_config
    from durf_tpu.data import load_scene

    cfg = carla_config()
    cfg.dataset_loader = "waymo"
    cfg.factor = 4
    scene = load_scene(out, cfg, "train")
    assert scene.n_examples == 13  # waymo test split (10, 12)
    assert scene.total_timesteps == 3
    assert len(scene.obj_ids) == 2
    assert scene.images[0].shape == (8, 12, 3)
    assert scene.depth[0].shape == (8, 12)
    # Sky heuristic: above-horizon no-return rows are sky; the Waymo loader
    # remaps mask==1 to the 0.975 max NDC disparity (obbpose_dataset.py:
    # 1850-1853).
    assert scene.sky[0].max() == pytest.approx(0.975)
    # The coarse pyramid level loads too (suffixed npz + images_8).
    scene8 = load_scene(out, cfg, "train", factor=8)
    assert scene8.images[0].shape == (4, 6, 3)


def test_converted_scene_trains_and_evals(tmp_path):
    """One-command real-data readiness: waymo_convert output -> train CLI ->
    eval CLI, end to end (round-2 VERDICT item 7)."""
    frames = [make_frame(t) for t in range(3)]

    def stub_depth(frame, factor, rig_index):
        h = frame.context.camera_calibrations[0].height // factor
        w = frame.context.camera_calibrations[0].width // factor
        d = np.zeros((h, w), np.float32)
        d[h // 2 :, :] = 10.0 + rig_index
        return d

    scene = str(tmp_path / "scene")
    # Factor 2 (16x24 images): SSIM's 11x11 window needs >= 11 px per side.
    wc.convert_frames(frames, scene, factors=(2,), near=0.1, far=75.0, depth_fn=stub_depth)

    from durf_tpu.configs import load_config
    from durf_tpu import train as trainlib
    from durf_tpu import eval as evallib

    overrides = [
        'Config.dataset_loader = "waymo"',
        'Config.batching = "timestep"',
        "Config.factor = 2",
        "Config.batch_size = 16",
        "Config.max_steps = 3",
        "Config.save_every = 3",
        "Config.print_every = 1",
        "Config.near = 0.1",
        "Config.far = 75.",
        "Config.chunk = 16",
        "MipNerfModel.num_samples = 4",
        "MipNerfModel.num_levels = 2",
        "MipNerfModel.max_deg_point = 3",
        "MipNerfModel.deg_view = 2",
        "MipNerfModel.num_objects = 2",
        "MipNerfModel.timesteps = 3",
        "MLP.net_depth = 2",
        "MLP.net_width = 16",
        "MLP.net_width_condition = 8",
        "BoxMLP.net_depth = 2",
        "BoxMLP.net_width = 8",
        "BoxMLP.net_width_condition = 8",
    ]
    config = load_config([], overrides)
    train_dir = str(tmp_path / "train")
    trainlib.run_training(config, scene, train_dir, log_fn=lambda *a: None)
    out = evallib.evaluate(
        config, scene, train_dir, str(tmp_path / "eval"), log_fn=lambda *a: None
    )
    assert np.isfinite(out["psnr"])
    import os

    assert os.path.exists(str(tmp_path / "eval" / "metrics.json"))

    # The converted scene's rasterized masks feed the per-ray 'inst'
    # channel (losses.box_surface_loss input) — rasterized at the training
    # factor, ids consistent with the box-key object indices.
    from durf_tpu.data import RayDataset

    ds = RayDataset("train", scene, config)
    batch = next(ds)
    assert batch["inst"].shape == (16, 1)
    assert set(np.unique(batch["inst"])) <= {0, 1, 2}
    np.testing.assert_array_equal(np.sort(batch["obj_ids"]), [1, 2])
