"""Evaluate a REFERENCE checkpoint on the test split.

Reproduces notebooks/render_eval_durf.ipynb cell 5 exactly (PSNR via
math.mse_to_psnr on the mean MSE per image, SSIM via math.compute_ssim,
chunked render_image on the 'test' dataset), plus the depth-MSE over pixels
with a LIDAR return (the eval protocol durf_tpu.eval also implements).

Usage:
  python h2h/eval_reference.py --data_dir /tmp/h2h/scene \
      --train_dir /tmp/h2h/ref --gin_file /root/reference/configs/carla_dyn.gin \
      [--gin_param ...] [--chunk 4096] [--cpu] [--out metrics.json]
"""

import argparse
import functools
import json
import sys

sys.path.insert(0, "/root/repo/h2h")
import ref_shims

ref_shims.install()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--train_dir", required=True)
    ap.add_argument("--gin_file", action="append", default=[])
    ap.add_argument("--gin_param", action="append", default=[])
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--alpha", type=float, default=10.0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import flax
    import gin
    import numpy as np
    from flax.training import checkpoints
    from jax import random

    from internal import math, obbpose_dataset, obbpose_model, utils

    gin.parse_config_files_and_bindings(args.gin_file, args.gin_param)
    config = utils.Config()

    dataset = obbpose_dataset.get_dataset("test", args.data_dir, config)
    rng = random.PRNGKey(20200823)
    _, key = random.split(rng)
    model, variables = obbpose_model.construct_mipnerf(key, dataset.peek())
    optimizer = flax.optim.Adam(config.lr_init).create(variables)
    state = utils.TrainState(optimizer=optimizer)
    state = checkpoints.restore_checkpoint(args.train_dir, state)
    step = int(state.optimizer.state.step)
    print(f"restored checkpoint at step {step}")
    variables = state.optimizer.target

    def render_eval_fn(variables, _, batch):
        return jax.lax.all_gather(
            model.apply(
                variables,
                random.PRNGKey(0),
                batch["rays"],
                batch["init"],
                batch["ext"],
                batch["ts"],
                randomized=False,
                white_bkgd=config.white_bkgd,
                rand_bkgd=False,
                alpha=batch["alpha"],
            ),
            axis_name="batch",
        )

    render_eval_pfn = jax.pmap(
        render_eval_fn,
        in_axes=(None, None, 0),
        donate_argnums=(2,),
        axis_name="batch",
    )
    ssim_fn = jax.jit(functools.partial(math.compute_ssim, max_val=1.0))

    psnrs, ssims, dmses = [], [], []
    for i, batch in zip(range(dataset.size), dataset):
        pred_color, pred_distance, pred_acc = obbpose_model.render_image(
            functools.partial(render_eval_pfn, variables),
            batch["rays"],
            batch["init"],
            batch["ext"],
            batch["ts"],
            None,
            alpha=args.alpha,
            chunk=args.chunk,
        )
        pred_color = np.asarray(pred_color)
        gt = np.asarray(batch["pixels"])
        psnrs.append(float(math.mse_to_psnr(((pred_color - gt) ** 2).mean())))
        ssims.append(float(ssim_fn(pred_color, gt)))
        depth_gt = np.asarray(batch["depth"]).squeeze()
        valid = depth_gt > 0
        dist = np.asarray(pred_distance).squeeze()
        dmses.append(float(((dist - depth_gt) ** 2 * valid).sum() / max(valid.sum(), 1)))
        print(
            f"image {i}: psnr={psnrs[-1]:.2f} ssim={ssims[-1]:.4f} "
            f"depth_mse={dmses[-1]:.4f}",
            flush=True,
        )

    result = {
        "impl": "reference",
        "step": step,
        "psnr": float(np.mean(psnrs)),
        "ssim": float(np.mean(ssims)),
        "depth_mse": float(np.mean(dmses)),
        "per_image": {"psnr": psnrs, "ssim": ssims, "depth_mse": dmses},
    }
    print(json.dumps({k: v for k, v in result.items() if k != "per_image"}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
