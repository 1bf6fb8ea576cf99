"""Trajectory rendering CLI: novel camera paths (and movable boxes) from a checkpoint.

Replaces notebooks/durf_render_traj.ipynb with a script. Paths:
  --path spiral | spherical | interp (through the split's camera poses)
  --trajectory file.npz with 'poses' [K, 3, 4] (and optional 'box_poses'
    [K, N_obj, 6] to move objects independently of the camera).

Usage:
  python -m durf_tpu.render --data_dir=... --train_dir=... \
      --gin_file=configs/waymo.gin --out_dir=frames/ --path spiral --n_views 60
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from durf_tpu import vis
from durf_tpu.configs import load_config
from durf_tpu.data.paths import interpolate_poses, spherical_path, spiral_path
from durf_tpu import train as trainlib
from durf_tpu.eval import restore_for_eval
from durf_tpu.models import render_image
from durf_tpu.parallel import replicate
from durf_tpu.rays import camera_rays
from durf_tpu.train import make_alpha_schedule


def render_trajectory(
    config,
    data_dir: str,
    train_dir: str,
    out_dir: str,
    path: str = "spiral",
    n_views: int = 60,
    trajectory: str | None = None,
    timestep: int = 0,
    save_gif: bool = True,
    log_fn=print,
):
    mesh, dataset, model, state, render_chunk = restore_for_eval(
        config, data_dir, train_dir, split="render"
    )
    scene = dataset.scene
    alpha = float(make_alpha_schedule(config)(int(state.step)))
    params = trainlib.params_for_render(state)

    box_poses = None
    if trajectory is not None:
        data = np.load(trajectory)
        poses = data["poses"]
        box_poses = data.get("box_poses")
    elif path == "spiral":
        bounds = np.asarray([[scene.near + 0.5, scene.far]] * len(scene.camtoworlds))
        poses = spiral_path(scene.camtoworlds, bounds, n_views=n_views)
    elif path == "spherical":
        poses = spherical_path(scene.camtoworlds, n_views=n_views)
    elif path == "interp":
        poses = interpolate_poses(scene.camtoworlds, n_views=n_views)
    else:
        raise ValueError(f"unknown path {path!r}")

    width = int(scene.width[0])
    height = int(scene.height[0])
    focal = float(scene.focal[0])

    # Box tables (static over the path unless a trajectory overrides them).
    batch0 = next(dataset)
    init = batch0.get("init")
    ext = batch0.get("ext")

    os.makedirs(out_dir, exist_ok=True)
    frames = []
    for k, c2w in enumerate(poses):
        rays = camera_rays(
            c2w, width, height, focal, scene.near, scene.far, use_ndc=not config.spherify
        )
        init_k = init
        if box_poses is not None and init is not None:
            init_k = np.asarray(init).copy()
            init_k[timestep] = box_poses[min(k, len(box_poses) - 1)]
        dev = {
            "init": None if init_k is None else jax.device_put(np.asarray(init_k), replicate(mesh)),
            "ext": None if ext is None else jax.device_put(np.asarray(ext), replicate(mesh)),
            "ts": jax.device_put(np.int32(timestep), replicate(mesh)),
        }
        render = lambda r: render_chunk(
            params, r, dev["init"], dev["ext"], dev["ts"], jnp.asarray(alpha, jnp.float32)
        )
        out = render_image(render, rays, chunk=config.chunk)
        frame = np.clip(np.asarray(out["rgb"]), 0, 1)
        frames.append(frame)
        from PIL import Image

        Image.fromarray((frame * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"frame_{k:04d}.png")
        )
        depth_vis = vis.visualize_depth(out["depth"], out["acc"])
        Image.fromarray((np.clip(depth_vis, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"depth_{k:04d}.png")
        )
        log_fn(f"frame {k + 1}/{len(poses)}")

    if save_gif and frames:
        from PIL import Image

        imgs = [Image.fromarray((f * 255).astype(np.uint8)) for f in frames]
        imgs[0].save(
            os.path.join(out_dir, "trajectory.gif"),
            save_all=True,
            append_images=imgs[1:],
            duration=80,
            loop=0,
        )
    return frames


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--train_dir", required=True)
    p.add_argument("--gin_file", action="append", default=[])
    p.add_argument("--gin_param", action="append", default=[])
    p.add_argument("--out_dir", required=True)
    p.add_argument("--path", default="spiral", choices=["spiral", "spherical", "interp"])
    p.add_argument("--trajectory", default=None, help="npz with poses [K,3,4]")
    p.add_argument("--n_views", type=int, default=60)
    p.add_argument("--timestep", type=int, default=0)
    p.add_argument("--chunk", type=int, default=None)
    args = p.parse_args(argv)
    # One TPU client per box at a time (tpu_lock.py; CLAUDE.md trap #6).
    from durf_tpu.tpu_lock import acquire_tpu_lock

    acquire_tpu_lock()
    config = load_config(args.gin_file, args.gin_param)
    if args.chunk is not None:
        config.chunk = args.chunk
    render_trajectory(
        config,
        args.data_dir,
        args.train_dir,
        args.out_dir,
        path=args.path,
        n_views=args.n_views,
        trajectory=args.trajectory,
        timestep=args.timestep,
    )


if __name__ == "__main__":
    main()
