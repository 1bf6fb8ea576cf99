"""Evaluation CLI: test-split PSNR / SSIM / depth-MSE (/ LPIPS) from a checkpoint.

Replaces the reference's notebooks/render_eval_durf.ipynb with a script:
restore checkpoint -> render every test view chunked over the mesh -> image
metrics + saved renders. LPIPS (AlexNet, via torch) is optional and loaded
lazily like the reference notebook does.

Usage:
  python -m durf_tpu.eval --data_dir=... --train_dir=... \
      --gin_file=configs/waymo.gin [--out_dir=...] [--lpips]
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from durf_tpu import mathx, vis
from durf_tpu.checkpoints import CheckpointManager
from durf_tpu.configs import Config, load_config
from durf_tpu.data import get_dataset
from durf_tpu.models import construct_model
from durf_tpu.parallel import eval_mesh, make_mesh, replicate, shard_batch
from durf_tpu.train import (
    create_train_state,
    evaluate_image,
    make_alpha_schedule,
    make_optimizer,
    make_render_fn,
    params_for_render,
)


def restore_for_eval(config: Config, data_dir: str, train_dir: str, split: str = "test"):
    """Shared app bootstrap: dataset + model + restored params + renderer."""
    mesh = make_mesh()
    dataset = get_dataset(split, data_dir, config)
    # Model init needs a train-shaped example batch.
    train_ds = get_dataset("train", data_dir, config)
    example = shard_batch(train_ds.peek(), mesh, config.batch_size)
    model, variables = construct_model(jax.random.key(0), example, config.model)

    tx = make_optimizer(config)
    state = jax.device_put(create_train_state(config, variables, tx), replicate(mesh))
    ckpt = CheckpointManager(train_dir, keep=config.checkpoint_keep)
    if ckpt.latest_step is None:
        raise FileNotFoundError(f"no checkpoint found in {train_dir}")
    state = ckpt.restore(state)
    # Rendering runs on the host-local mesh under multihost (parallel.eval_mesh).
    rmesh = eval_mesh(mesh)
    render_chunk = make_render_fn(model, config, rmesh)
    return rmesh, dataset, model, state, render_chunk


def _lpips_fn(weights: Optional[str] = None):
    """Optional LPIPS (AlexNet) metric; None when unavailable.

    Resolution order: the `lpips` pip package (the reference notebook's
    dependency, render_eval_durf.ipynb cell 5) when importable, else the
    pure-JAX implementation (durf_tpu.lpips) fed by a LOCAL weights file —
    `weights`, or $DURF_LPIPS_WEIGHTS — since a zero-egress box cannot
    download the torchvision backbone the package needs."""
    try:
        import lpips  # type: ignore
        import torch

        net = lpips.LPIPS(net="alex")

        def fn(a: np.ndarray, b: np.ndarray) -> float:
            to_t = lambda x: torch.from_numpy(
                (x.transpose(2, 0, 1)[None] * 2 - 1).astype(np.float32)
            )
            with torch.no_grad():
                return float(net(to_t(a), to_t(b)))

        return fn
    except ImportError:
        pass
    weights = weights or os.environ.get("DURF_LPIPS_WEIGHTS")
    if weights and os.path.exists(weights):
        from durf_tpu.lpips import load_lpips

        return load_lpips(weights)
    return None


def evaluate(
    config: Config,
    data_dir: str,
    train_dir: str,
    out_dir: Optional[str] = None,
    use_lpips: bool = False,
    log_fn=print,
    lpips_weights: Optional[str] = None,
) -> dict:
    mesh, dataset, model, state, render_chunk = restore_for_eval(config, data_dir, train_dir)
    alpha = float(make_alpha_schedule(config)(int(state.step)))
    lpips = _lpips_fn(lpips_weights) if use_lpips else None
    if use_lpips and lpips is None:
        log_fn(
            "lpips requested but neither the lpips package nor a local "
            "weights file (--lpips_weights / $DURF_LPIPS_WEIGHTS) is "
            "available; skipping"
        )

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)

    per_image = []
    t_start = time.time()
    total_rays = 0
    for i in range(dataset.size):
        case = next(dataset)
        dev = {k: jax.device_put(np.asarray(v), replicate(mesh)) for k, v in case.items() if k != "rays"}
        dev["rays"] = case["rays"]
        out = evaluate_image(render_chunk, params_for_render(state), dev, alpha, chunk=config.chunk)
        gt = case["pixels"]
        mse = float(((out["rgb"] - gt) ** 2).mean())
        psnr = float(mathx.mse_to_psnr(mse))
        ssim = float(mathx.compute_ssim(jnp.asarray(out["rgb"]), jnp.asarray(gt), max_val=1.0))
        gt_depth = case["depth"].squeeze(-1)
        mask = gt_depth > 0
        depth_mse = float((((out["depth"] - gt_depth) ** 2) * mask).sum() / max(mask.sum(), 1))
        row = {"index": i, "psnr": psnr, "ssim": ssim, "depth_mse": depth_mse}
        if lpips is not None:
            row["lpips"] = lpips(np.asarray(out["rgb"], np.float32), np.asarray(gt, np.float32))
        per_image.append(row)
        total_rays += int(np.prod(gt.shape[:2]))
        log_fn(f"view {i}: psnr={psnr:.2f} ssim={ssim:.3f} depth_mse={depth_mse:.4f}")

        if out_dir:
            from PIL import Image

            Image.fromarray((np.clip(out["rgb"], 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(out_dir, f"pred_{i:03d}.png")
            )
            Image.fromarray((np.clip(gt, 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(out_dir, f"gt_{i:03d}.png")
            )
            depth_vis = vis.visualize_depth(out["depth"], out["acc"])
            Image.fromarray((np.clip(depth_vis, 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(out_dir, f"depth_{i:03d}.png")
            )
            # Raw metric depth as float32 TIFF (reference utils.py:220-223).
            Image.fromarray(np.nan_to_num(out["depth"]).astype(np.float32)).save(
                os.path.join(out_dir, f"depth_{i:03d}.tiff"), "TIFF"
            )

    dt = time.time() - t_start
    summary = {
        "num_views": len(per_image),
        "psnr": float(np.mean([r["psnr"] for r in per_image])),
        "ssim": float(np.mean([r["ssim"] for r in per_image])),
        "depth_mse": float(np.mean([r["depth_mse"] for r in per_image])),
        "eval_rays_per_sec": total_rays / dt,
        "step": int(state.step),
        "per_image": per_image,
    }
    if lpips is not None:
        summary["lpips"] = float(np.mean([r["lpips"] for r in per_image]))
        # The paper's geometric-mean 'average' error (reference math.py:59-63).
        summary["avg_error"] = float(
            mathx.compute_avg_error(
                jnp.asarray(summary["psnr"]),
                jnp.asarray(summary["ssim"]),
                jnp.asarray(summary["lpips"]),
            )
        )
    if out_dir:
        with open(os.path.join(out_dir, "metrics.json"), "w") as f:
            json.dump(summary, f, indent=2)
    log_fn(
        f"eval @ step {summary['step']}: psnr={summary['psnr']:.2f} "
        f"ssim={summary['ssim']:.3f} depth_mse={summary['depth_mse']:.4f} "
        f"({summary['eval_rays_per_sec']:.0f} rays/s)"
    )
    return summary


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--train_dir", required=True)
    p.add_argument("--gin_file", action="append", default=[])
    p.add_argument("--gin_param", action="append", default=[])
    p.add_argument("--out_dir", default=None)
    p.add_argument("--chunk", type=int, default=None)
    p.add_argument("--lpips", action="store_true")
    p.add_argument(
        "--lpips_weights",
        default=None,
        help="local AlexNet-LPIPS weights (lpips state_dict .pt/.pth or the "
        "durf_tpu .npz layout) for the pure-JAX metric when the lpips "
        "package is unavailable; also read from $DURF_LPIPS_WEIGHTS",
    )
    args = p.parse_args(argv)
    # One TPU client per box at a time (tpu_lock.py; CLAUDE.md trap #6).
    from durf_tpu.tpu_lock import acquire_tpu_lock

    acquire_tpu_lock()
    config = load_config(args.gin_file, args.gin_param)
    if args.chunk is not None:
        config.chunk = args.chunk
    evaluate(
        config,
        args.data_dir,
        args.train_dir,
        args.out_dir,
        args.lpips,
        lpips_weights=args.lpips_weights,
    )


if __name__ == "__main__":
    main()
