"""Run the REFERENCE trainer (/root/reference/train_boxpose.py) unmodified.

Head-to-head protocol: same scene, same .gin hyperparameters, same step
count as the durf_tpu run — only the implementation differs. The reference's
own main() runs end to end through the compat shims (h2h/ref_shims.py).

Usage:
  python h2h/run_reference.py --data_dir /tmp/h2h_scene \
      --train_dir /tmp/h2h_ref --gin_file configs/h2h.gin \
      [--gin_param 'Config.max_steps = 20000' ...] [--render_every 0] [--cpu]
"""

import argparse
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
    ap.add_argument("--render_every", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--cpu", action="store_true", help="force true-CPU jax")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    # absl flags: populate the reference's own flag set programmatically.
    import train_boxpose  # noqa: F401  (defines FLAGS via utils + its own)
    from absl import flags

    argv = [
        "train_boxpose",
        f"--train_dir={args.train_dir}",
        f"--data_dir={args.data_dir}",
        f"--chunk={args.chunk}",
        f"--render_every={args.render_every}",
    ]
    for f in args.gin_file:
        argv.append(f"--gin_file={f}")
    for p in args.gin_param:
        argv.append(f"--gin_param={p}")
    flags.FLAGS(argv)

    print(f"devices: {jax.devices()}", flush=True)
    train_boxpose.main(None)


if __name__ == "__main__":
    main()
