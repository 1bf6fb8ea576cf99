"""Synchronous CARLA capture: the 5-camera Waymo-style rig on an ego vehicle.

Replaces the reference's carla/data_generation.py (731 LoC): spawns traffic
plus an autopilot ego vehicle, rigs 5 camera positions x {RGB, depth,
semantic, instance} sensors, steps the world at fixed_delta 0.1 s, and writes
the intermediate capture contract consumed by
durf_tpu.tools.carla_postprocess:
  poses.npy    {"{frame:08d}_{cam}": 4x4 NeRF-convention camera-to-world,
                "hwf_{cam}": [h, w, focal]}
  bboxes.npy   {frame: {vehicle_id: {"center": 4x4 world pose,
                                      "extent": [3] half extents}}}
  {frame:08d}_{kind}{cam}.png sensor images

Requires the `carla` PyPI wheel and a running simulator (0.9.13+); the import
is gated — this image has neither.

Usage:
  python -m durf_tpu.tools.carla_capture --out_dir capture/ --frames 5 \
      [--host localhost --port 2000 --town Town03 --vehicles 30]
"""

from __future__ import annotations

import argparse
import os
import queue

import numpy as np

try:  # pragma: no cover - carla not in this image
    import carla

    _CARLA_AVAILABLE = True
except ImportError:  # pragma: no cover
    _CARLA_AVAILABLE = False

# 5-camera rig mimicking the Waymo layout (reference data_generation.py:
# 499-590): [x forward, y right, z up] offsets in the ego frame + yaw degrees.
RIG = [
    dict(pos=(1.6, 0.0, 1.6), yaw=0.0, fov=60.0, size=(1920, 1280)),  # FRONT
    dict(pos=(1.5, -0.4, 1.6), yaw=-45.0, fov=60.0, size=(1920, 1280)),  # FRONT_LEFT
    dict(pos=(1.0, -0.8, 1.6), yaw=-90.0, fov=75.0, size=(1920, 886)),  # SIDE_LEFT
    dict(pos=(1.5, 0.4, 1.6), yaw=45.0, fov=60.0, size=(1920, 1280)),  # FRONT_RIGHT
    dict(pos=(1.0, 0.8, 1.6), yaw=90.0, fov=75.0, size=(1920, 886)),  # SIDE_RIGHT
]
SENSOR_KINDS = {
    "rgb": "sensor.camera.rgb",
    "depth": "sensor.camera.depth",
    "sem": "sensor.camera.semantic_segmentation",
    "inst": "sensor.camera.instance_segmentation",
}

# CARLA's UE4 camera frame (x forward, y right, z up) -> OpenGL c2w
# (x right, y up, looking down -z): the same basis sandwich as the
# reference's carla2Nerf (data_generation.py:96-122).
_T1 = np.array([[0, 1, 0, 0], [0, 0, 1, 0], [-1, 0, 0, 0], [0, 0, 0, 1]], np.float64)
_T2 = np.array([[0, 0, -1, 0], [1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1]], np.float64)


def carla_to_nerf(mat: np.ndarray) -> np.ndarray:
    """UE4 camera transform matrix -> OpenGL-convention camera-to-world."""
    return _T1 @ np.asarray(mat, np.float64) @ _T2


def focal_from_fov(width: int, fov_deg: float) -> float:
    return width / (2.0 * np.tan(np.radians(fov_deg) / 2.0))


def capture(  # pragma: no cover - requires a CARLA server
    out_dir: str,
    frames: int = 5,
    host: str = "localhost",
    port: int = 2000,
    town: str | None = None,
    vehicles: int = 30,
    steps_between_frames: int = 10,
    speed_threshold: float = 1.0,
    max_distance: float = 75.0,
):
    if not _CARLA_AVAILABLE:
        raise ImportError("the carla package is required (pip install carla==0.9.13)")
    os.makedirs(out_dir, exist_ok=True)
    client = carla.Client(host, port)
    client.set_timeout(10.0)
    world = client.load_world(town) if town else client.get_world()

    settings = world.get_settings()
    settings.synchronous_mode = True
    settings.fixed_delta_seconds = 0.1  # reference data_generation.py:301-304
    world.apply_settings(settings)
    tm = client.get_trafficmanager()
    tm.set_synchronous_mode(True)

    bp_lib = world.get_blueprint_library()
    spawn_points = world.get_map().get_spawn_points()

    actors, sensors = [], []
    try:
        # Traffic + ego.
        for i in range(vehicles):
            bp = np.random.choice(bp_lib.filter("vehicle.*"))
            npc = world.try_spawn_actor(bp, spawn_points[i % len(spawn_points)])
            if npc is not None:
                npc.set_autopilot(True, tm.get_port())
                actors.append(npc)
        ego = world.spawn_actor(bp_lib.find("vehicle.tesla.model3"), spawn_points[-1])
        ego.set_autopilot(True, tm.get_port())
        actors.append(ego)

        # Rig: 5 positions x 4 sensor kinds.
        q: queue.Queue = queue.Queue()
        for cam, spec in enumerate(RIG):
            for kind, bp_name in SENSOR_KINDS.items():
                bp = bp_lib.find(bp_name)
                bp.set_attribute("image_size_x", str(spec["size"][0]))
                bp.set_attribute("image_size_y", str(spec["size"][1]))
                bp.set_attribute("fov", str(spec["fov"]))
                tf = carla.Transform(
                    carla.Location(x=spec["pos"][0], y=spec["pos"][1], z=spec["pos"][2]),
                    carla.Rotation(yaw=spec["yaw"]),
                )
                sensor = world.spawn_actor(bp, tf, attach_to=ego)
                sensor.listen(
                    lambda data, c=cam, k=kind, s=sensor: q.put((data.frame, c, k, data, s))
                )
                sensors.append(sensor)

        poses: dict = {}
        for cam, spec in enumerate(RIG):
            poses[f"hwf_{cam}"] = np.array(
                [spec["size"][1], spec["size"][0], focal_from_fov(spec["size"][0], spec["fov"])],
                np.float32,
            )
        bboxes: dict = {}

        for t in range(frames):
            for _ in range(steps_between_frames):
                world.tick()
                while not q.empty():
                    q.get_nowait()
            frame_id = world.tick()
            # Drain exactly one image per sensor for this tick.
            got = 0
            while got < len(sensors):
                fid, cam, kind, data, sensor = q.get(timeout=10.0)
                if fid != frame_id:
                    continue
                data.save_to_disk(os.path.join(out_dir, f"{frame_id:08d}_{kind}{cam}.png"))
                if kind == "rgb":
                    poses[f"{frame_id:08d}_{cam}"] = carla_to_nerf(
                        sensor.get_transform().get_matrix()
                    )
                got += 1

            # Moving vehicles near the ego (reference :614-685).
            frame_boxes = {}
            for npc in world.get_actors().filter("*vehicle*"):
                if npc.id == ego.id:
                    continue
                v = npc.get_velocity()
                speed = abs(v.x) + abs(v.y) + abs(v.z)
                dist = npc.get_transform().location.distance(ego.get_transform().location)
                if speed > speed_threshold and dist < max_distance:
                    bb = npc.bounding_box
                    center = np.asarray(
                        npc.get_transform().get_matrix(), np.float64
                    ) @ np.asarray(
                        carla.Transform(bb.location, bb.rotation).get_matrix(), np.float64
                    )
                    frame_boxes[npc.id] = {
                        "center": center.astype(np.float32),
                        "extent": np.array(
                            [bb.extent.x, bb.extent.y, bb.extent.z], np.float32
                        ),
                    }
            bboxes[f"{frame_id:08d}"] = frame_boxes

        np.save(os.path.join(out_dir, "poses.npy"), poses, allow_pickle=True)
        np.save(os.path.join(out_dir, "bboxes.npy"), bboxes, allow_pickle=True)
    finally:
        for s in sensors:
            s.stop()
            s.destroy()
        for a in actors:
            a.destroy()
        settings.synchronous_mode = False
        world.apply_settings(settings)


def main(argv=None):  # pragma: no cover
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--frames", type=int, default=5)
    p.add_argument("--host", default="localhost")
    p.add_argument("--port", type=int, default=2000)
    p.add_argument("--town", default=None)
    p.add_argument("--vehicles", type=int, default=30)
    args = p.parse_args(argv)
    if not _CARLA_AVAILABLE:
        raise SystemExit("the carla package is not installed in this image")
    capture(
        args.out_dir,
        frames=args.frames,
        host=args.host,
        port=args.port,
        town=args.town,
        vehicles=args.vehicles,
    )


if __name__ == "__main__":
    main()
