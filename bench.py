"""Benchmark: training-step ray-sample throughput on the real chip.

Runs the flagship dynamic scene-graph model (reference waymo.gin operating
point: 2 levels x 128 samples, 8x256 background MLP + 2 object MLPs,
full loss stack + Adam) and reports ray-samples/sec/chip.

Baseline target (BASELINE.md): >= 5M ray-samples/sec/chip on TPU v5e.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Persistent compilation cache (first compile of the big train step is slow).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/durf_tpu_xla_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import numpy as np

BASELINE_RAY_SAMPLES_PER_SEC = 5e6


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=4096)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument(
        "--dtype",
        default="bfloat16",
        help="model compute dtype; bfloat16 (default) is 1.6x fp32 at equal "
        "convergence on the synthetic scene — pass float32 for parity runs",
    )
    p.add_argument(
        "--pallas",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="fused Pallas MLP kernels (default on: 8.3M vs 4.8M XLA; "
        "--no-pallas for the plain XLA path)",
    )
    p.add_argument(
        "--grid_sampling",
        action="store_true",
        help="occupancy-grid level-0 sampling (VaxNeRF-style empty-space "
        "skipping; durf_tpu extension, off in all reference-parity configs)",
    )
    p.add_argument(
        "--use_box_nearfar",
        action="store_true",
        help="sample box-hitting rays inside the ray/box intersection "
        "(the reference computes and discards these bounds — DEFECTS.md #3)",
    )
    p.add_argument(
        "--obj_capacity",
        type=float,
        default=0.0625,
        help="object-ray compaction fraction (ModelConfig.obj_ray_capacity): "
        "run the object encode+MLPs on only the top-k hit rays and scatter "
        "back — exact when the batch's hit count fits the capacity. The "
        "bench batch hits ~2.9%% of rays, so the 6.25%% default carries >2x "
        "headroom and is exact (measured sweep: 0.25 -> 23.7M, 0.125 -> "
        "25.5M, 0.0625 -> 26.6M vs 16.4M uncompacted). 0 disables.",
    )
    p.add_argument(
        "--remat",
        action="store_true",
        help="remat the XLA-path MLP forward (jax.checkpoint) — lets "
        "--no-pallas run batch 8192 within 15.75 GB HBM",
    )
    p.add_argument(
        "--fused_objects",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="objects-in-grid kernel (one pallas_call over tiles x objects "
        "with in-kernel hit-masked accumulation; --no-fused_objects for the "
        "vmapped per-object kernels)",
    )
    p.add_argument(
        "--proposal",
        action="store_true",
        help="proposal-MLP coarse levels (mip-NeRF 360 style; the full-width "
        "background MLP runs only on the final level — see "
        "ModelConfig.use_proposal)",
    )
    p.add_argument(
        "--proposal_samples",
        type=int,
        default=0,
        help="samples per proposal level (0 = num_samples); only read with "
        "--proposal — mip-NeRF 360's many-cheap-proposal/few-expensive-fine "
        "split (ModelConfig.proposal_samples)",
    )
    p.add_argument(
        "--profile_dir",
        default=None,
        help="capture a jax.profiler (xprof) trace of the timed steps into "
        "this directory — the step-breakdown source for docs/DESIGN.md",
    )
    p.add_argument(
        "--recurrent_encode",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="double-angle/repeated-squaring IPE (~5x fewer VPU "
        "transcendentals in the encode fusions; --no-recurrent_encode for "
        "the reference's direct form)",
    )
    args = p.parse_args()

    # Serialize TPU client launches across processes (CLAUDE.md trap #6:
    # concurrent/killed clients orphan server-side compiles and can wedge
    # the chip claim for 45+ min).
    from durf_tpu.tpu_lock import acquire_tpu_lock

    acquire_tpu_lock()

    # Backend-init failures (PJRT client init — the exact rc=1 that cost
    # round 3 its BENCH number) are cached in-process by jax, so an in-process
    # retry can never recover; re-exec for a genuinely fresh client. The flock
    # fd is CLOEXEC (PEP 446), so the lock releases on exec and the fresh
    # process re-acquires it.
    attempt = int(os.environ.get("DURF_BENCH_ATTEMPT", "0"))
    try:
        return _run(args)
    except RuntimeError as e:  # includes JaxRuntimeError (axon hiccups)
        if attempt >= 2:
            raise
        print(f"# re-exec after backend error (attempt {attempt}): {e}", flush=True)
        time.sleep(30 * (attempt + 1))
        os.environ["DURF_BENCH_ATTEMPT"] = str(attempt + 1)
        sys.stdout.flush()
        os.execv(sys.executable, [sys.executable] + sys.argv)


def _run(args):
    from __graft_entry__ import _flagship_config
    from durf_tpu.data.synthetic import example_ray_batch
    from durf_tpu.models import construct_model
    from durf_tpu.parallel import make_mesh, replicate, shard_batch
    from durf_tpu.train import create_train_state, make_optimizer, make_train_step

    config = _flagship_config()
    config.batch_size = args.batch_size
    if args.dtype:
        config.model.compute_dtype = args.dtype
    if args.pallas:
        config.model.use_pallas_mlp = True
    config.model.recurrent_encode = args.recurrent_encode
    config.model.fused_objects = args.fused_objects
    config.model.remat_mlp = args.remat
    config.model.grid_sampling = args.grid_sampling
    config.model.use_box_nearfar = args.use_box_nearfar
    config.model.obj_ray_capacity = args.obj_capacity
    config.model.use_proposal = args.proposal
    config.model.proposal_samples = args.proposal_samples

    mesh = make_mesh()
    n_chips = mesh.devices.size
    batch = example_ray_batch(batch_size=config.batch_size)
    batch_dev = shard_batch(batch, mesh, config.batch_size)

    model, variables = construct_model(jax.random.key(0), batch_dev, config.model)
    tx = make_optimizer(config)
    state = jax.device_put(create_train_state(config, variables, tx), replicate(mesh))
    train_step = jax.jit(
        make_train_step(model, config, tx, jax.random.key(1)), donate_argnums=(0,)
    )

    for _ in range(args.warmup):
        state, stats = train_step(state, batch_dev)
    # NOTE: block_until_ready is unreliable on the axon remote backend (it
    # returns before execution); a scalar device_get is the only trustworthy
    # fence. The donated-state chain serializes the steps themselves.
    _ = jax.device_get(stats["train/loss"])

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    t0 = time.time()
    for _ in range(args.steps):
        state, stats = train_step(state, batch_dev)
    _ = jax.device_get(stats["train/loss"])
    dt = time.time() - t0
    if args.profile_dir:
        jax.profiler.stop_trace()

    samples_per_ray = config.model.samples_per_ray()
    ray_samples_per_sec = args.steps * config.batch_size * samples_per_ray / dt
    per_chip = ray_samples_per_sec / n_chips
    print(
        json.dumps(
            {
                "metric": "train_ray_samples_per_sec_per_chip",
                "value": round(per_chip, 1),
                "unit": "ray-samples/s/chip",
                "vs_baseline": round(per_chip / BASELINE_RAY_SAMPLES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
