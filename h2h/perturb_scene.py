"""Scene perturbation tool for the box-surface-prior robustness grid.

Copies a reference-format scene directory and injects controlled sensor /
label imperfections (round-5 VERDICT item: map the prior's operating
envelope beyond clean synthetic LIDAR):

  * --noise_sigma S     gaussian depth noise, meters (real automotive LIDAR
                        is ~2-5 cm one sigma)
  * --outlier_frac F    fraction of valid depth pixels replaced by a uniform
                        random range (multi-return / blooming outliers)
  * --ext_scale K       scale every box half-extent by K (label error; Waymo
                        extents are fitted, not exact)
  * --drop_depth        zero all depth (camera-only scene: the prior's
                        documented fallback regime)
  * --occlude_ts "4,5"  drop the LIDAR returns ON THE OBJECTS (pixels whose
                        2D_boxes.npz instance id > 0) for the listed 1-based
                        timesteps — an object occluded from the LIDAR in
                        those frames. The camera still sees the object
                        (images are untouched), so this isolates exactly the
                        box-surface prior's per-frame anchor: pose entries
                        are per-timestep parameters, and an occluded
                        timestep has no anchor of its own.

Usage:
  python h2h/perturb_scene.py --src /tmp/scene --out /tmp/scene_n5 \
      --noise_sigma 0.05 --outlier_frac 0.01
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil

import numpy as np


def _load_stack(path: str) -> np.ndarray:
    with np.load(path, allow_pickle=True) as z:
        return z[z.files[0]]


def perturb_depth(
    depths: np.ndarray,
    rng: np.random.Generator,
    noise_sigma: float,
    outlier_frac: float,
    drop: bool,
) -> np.ndarray:
    """Perturb a [N, H, W] (or ragged object) depth stack in place-like.

    Invalid pixels (depth == 0) stay invalid: noise and outliers model the
    sensor's RETURNS, not new returns where there were none.
    """
    def one(d):
        d = np.array(d, np.float32)
        if drop:
            return np.zeros_like(d)
        valid = d > 0
        if noise_sigma > 0:
            d = np.where(valid, d + rng.normal(0, noise_sigma, d.shape).astype(np.float32), d)
            d = np.where(valid, np.maximum(d, 1e-3), d)  # returns stay in front
        if outlier_frac > 0:
            hit = valid & (rng.uniform(size=d.shape) < outlier_frac)
            lo, hi = 0.5, float(d[valid].max()) if valid.any() else 1.0
            d = np.where(hit, rng.uniform(lo, hi, d.shape).astype(np.float32), d)
        return d

    if depths.dtype == object:
        out = np.empty(len(depths), dtype=object)
        for i in range(len(depths)):
            out[i] = one(depths[i])
        return out
    return np.stack([one(d) for d in depths])


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--noise_sigma", type=float, default=0.0)
    p.add_argument("--outlier_frac", type=float, default=0.0)
    p.add_argument("--ext_scale", type=float, default=1.0)
    p.add_argument("--drop_depth", action="store_true")
    p.add_argument("--occlude_ts", default="", help="comma-separated 1-based timesteps")
    p.add_argument("--cams", type=int, default=5, help="cameras per timestep")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    if os.path.exists(args.out):
        shutil.rmtree(args.out)
    shutil.copytree(args.src, args.out)
    rng = np.random.default_rng(args.seed)

    occluded = [int(t) for t in args.occlude_ts.split(",") if t.strip()]
    inst = _load_stack(os.path.join(args.out, "2D_boxes.npz")) if occluded else None

    for path in sorted(glob.glob(os.path.join(args.out, "depth_images*.npz"))):
        depths = _load_stack(path)
        depths = perturb_depth(depths, rng, args.noise_sigma, args.outlier_frac, args.drop_depth)
        if occluded:
            out = np.empty(len(depths), dtype=object) if depths.dtype == object else depths.copy()
            n_obj_px = 0
            for i in range(len(depths)):
                d = np.array(depths[i], np.float32)
                if i // args.cams + 1 in occluded:
                    m = np.asarray(inst[i])
                    if m.shape != d.shape:  # factor mismatch (pyramid levels)
                        ys = np.linspace(0, m.shape[0] - 1, d.shape[0]).round().astype(int)
                        xs = np.linspace(0, m.shape[1] - 1, d.shape[1]).round().astype(int)
                        m = m[ys][:, xs]
                    hit = m > 0
                    n_obj_px += int((hit & (d > 0)).sum())
                    d = np.where(hit, 0.0, d)
                out[i] = d
            depths = out if depths.dtype == object else np.stack([np.asarray(x) for x in out])
            print(f"occluded ts {occluded}: dropped {n_obj_px} object returns")
        np.savez(path.removesuffix(".npz"), depths)
        print(f"perturbed {os.path.basename(path)}: sigma={args.noise_sigma} "
              f"outliers={args.outlier_frac} drop={args.drop_depth}")

    if args.ext_scale != 1.0:
        bpath = os.path.join(args.out, "3D_boxes.npy")
        boxes = np.load(bpath, allow_pickle=True).item()
        n = 0
        for k in boxes:
            if k.endswith("_ext"):
                boxes[k] = np.asarray(boxes[k], np.float32) * args.ext_scale
                n += 1
        np.save(bpath, boxes, allow_pickle=True)
        print(f"scaled {n} box extents by {args.ext_scale}")


if __name__ == "__main__":
    main()
