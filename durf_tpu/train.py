"""Training driver: device-resident jit train step over a data-parallel mesh.

The reference's training call stack (SURVEY.md §3.1) rebuilt TPU-first:
  * ONE jit'd train step over a jax.sharding.Mesh — no pmap, no host-fed
    schedule scalars: LR/eps/alpha schedules are computed on device from
    state.step, and the pose-TV "previous timestep" pose is read from the
    live pose table instead of a per-step host round-trip (the reference
    syncs `pose` to host every step, train_boxpose.py:428-437);
  * optax Adam with the log-lerp LR schedule; gradient NaN-scrub, value clip
    and global-norm clip (reference train_boxpose.py:262-288);
  * Orbax checkpoints, tensorboardX metrics, jax.profiler hooks.

CLI (mirrors reference scripts/train_*.sh):
  python -m durf_tpu.train --data_dir=... --train_dir=... \
      --gin_file=configs/waymo.gin [--gin_param='Config.x = 1' ...]
"""

from __future__ import annotations

import argparse
import functools
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from durf_tpu import mathx, vis
from durf_tpu.checkpoints import CheckpointManager
from durf_tpu.configs import Config, load_config
from durf_tpu.data import device_data, get_dataset
from durf_tpu.losses import compute_losses, weight_l2
from durf_tpu.metrics import MetricsWriter, Throughput
from durf_tpu.models import MipNerf, construct_model, render_image
from durf_tpu.parallel import batch_sharding, eval_mesh, make_mesh, replicate, shard_batch


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    # Contracted-domain occupancy grid (None unless config.grid_sampling).
    grid: Any = None


def make_lr_schedule(config: Config):
    return functools.partial(
        mathx.log_lerp_decay,
        v_init=config.lr_init,
        v_final=config.lr_final,
        max_steps=config.max_steps,
        delay_steps=config.lr_delay_steps,
        delay_mult=config.lr_delay_mult,
    )


def make_eps_schedule(config: Config):
    return functools.partial(
        mathx.log_lerp_decay,
        v_init=config.eps_init,
        v_final=config.eps_final,
        max_steps=config.eps_max_steps,
        delay_steps=config.eps_delay_steps,
        delay_mult=config.lr_delay_mult,
    )


def make_alpha_schedule(config: Config):
    return functools.partial(
        mathx.freq_alpha_schedule,
        alpha_init=config.alpha_init,
        alpha_final=config.alpha_final,
        delay_steps=config.alpha_delay_steps,
        max_steps=config.alpha_max_steps,
    )


def make_optimizer(config: Config) -> optax.GradientTransformation:
    """Adam with the log-lerp schedule; the pose table optionally gets its own
    LR scale (pose_lr_mult — the reference's single flax.optim.Adam cannot
    separate pose and MLP step sizes, which makes joint pose optimization
    twitchy at MLP-friendly learning rates)."""
    lr_fn = make_lr_schedule(config)
    # optax evaluates the schedule at count=0 for the first update; the
    # reference's 1-indexed loop uses lr(1) there (train_boxpose.py:420,425),
    # and lr(max_steps) — not lr(max_steps - 1) — on the final update.
    tx = optax.adam(learning_rate=lambda count: lr_fn(count + 1))
    delay, ramp = config.pose_lr_delay_steps, max(config.pose_lr_ramp_steps, 1)
    decay = config.pose_lr_decay_steps
    if config.pose_lr_mult != 1.0 or delay > 0 or decay > 0 or ramp > 1:

        def pose_scale(count):
            # 1-indexed like the schedules above; 0 until the delay, then a
            # linear ramp to pose_lr_mult (see configs.pose_lr_delay_steps),
            # then (pose_lr_decay_steps > 0) a cosine decay to 0 — the
            # schedule shape the round-2 isolation probe converged under
            # (docs/DESIGN.md "Joint pose optimization"): recover the pose
            # inside the coarse BARF window, then freeze it before the
            # random-walk phase.
            step = count + 1
            # Applied unconditionally: with delay=0 and ramp_steps=0 (ramp=1)
            # this is 1.0 from the first update, so parity defaults are
            # unchanged — but a BARF-style `delay=0, ramp>1` recipe now
            # actually ramps instead of silently running at full pose LR
            # (round-3 advisor finding; the e1/e2 ledger rows predate this).
            gate = jnp.clip((step - delay) / ramp, 0.0, 1.0)
            if decay > 0:
                t = jnp.clip((step - delay - ramp) / decay, 0.0, 1.0)
                gate = gate * 0.5 * (1.0 + jnp.cos(jnp.pi * t))
            return config.pose_lr_mult * gate

        tx = optax.chain(
            tx,
            optax.masked(
                # scale_by_learning_rate flips the sign; plain schedule scale.
                optax.scale_by_schedule(pose_scale),
                lambda params: jax.tree.map_with_path(
                    lambda path, _: any(
                        getattr(k, "key", None) == "box_centers" for k in path
                    ),
                    params,
                ),
            ),
        )
    if config.pose_freeze_field:
        # Probe-regime freeze: while the pose window is active, every
        # non-pose update is scaled to 0, so the pose optimizes against a
        # genuinely static field (the isolation probe's working regime —
        # docs/STATUS.md; the mult-only recipes leave a tiny field LR that
        # lets the object MLP re-absorb the pose error). Field training
        # resumes after the decay window (never, if decay == 0).

        def field_scale(count):
            step = count + 1  # 1-indexed like the schedules above
            active = (step > delay).astype(jnp.float32)
            if decay > 0:
                active = active * (step <= delay + ramp + decay).astype(jnp.float32)
            return 1.0 - active

        tx = optax.chain(
            tx,
            optax.masked(
                optax.scale_by_schedule(field_scale),
                lambda params: jax.tree.map_with_path(
                    lambda path, _: not any(
                        getattr(k, "key", None) == "box_centers" for k in path
                    ),
                    params,
                ),
            ),
        )
    return tx


def create_train_state(config: Config, variables, tx) -> TrainState:
    from durf_tpu.ops import grid as gridops

    grid = (
        gridops.make_grid(config.model.grid_resolution)
        if config.model.grid_sampling
        else None
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        opt_state=tx.init(variables["params"]),
        grid=grid,
    )


def _global_norm(tree) -> jax.Array:
    return jnp.sqrt(
        jax.tree_util.tree_reduce(lambda x, y: x + jnp.sum(y**2), tree, initializer=0.0)
    )


def make_train_step(model: MipNerf, config: Config, tx, base_key: jax.Array):
    """Build the (un-jitted) train step fn(state, batch) -> (state, stats)."""
    eps_fn = make_eps_schedule(config)
    alpha_fn = make_alpha_schedule(config)
    lr_fn = make_lr_schedule(config)
    dynamic = config.model.dynamics

    def train_step(state: TrainState, batch: Dict[str, Any]):
        step = state.step
        key = jax.random.fold_in(base_key, step)
        # Schedules are keyed on the 1-indexed step number to match the
        # reference loop `range(init_step=1, max_steps + 1)`
        # (train_boxpose.py:420,425-427): update k uses schedule(k), so a
        # 200k-step run ends on schedule(200k), not schedule(200k - 1).
        eps = eps_fn(step + 1)
        alpha = alpha_fn(step + 1)

        init_boxes = batch.get("init")
        ext = batch.get("ext")
        ts = batch.get("ts")

        def loss_fn(params):
            out = model.apply(
                {"params": params},
                rng=key,
                rays=batch["rays"],
                init_boxes=init_boxes,
                ext=ext,
                ts=ts,
                randomized=config.randomized,
                background=config.background,
                alpha=alpha,
                grid=state.grid,
            )
            if dynamic and init_boxes is not None:
                # Previous-timestep pose for the TV loss, straight from the
                # live table (device-resident; fresher than the reference's
                # host-tracked copy — train_boxpose.py:428-437).
                table = jax.lax.stop_gradient(params["box_centers"])
                adj = jnp.where(ts == 0, ts + 1, ts - 1)
                prev_pose = table[adj.squeeze()]
            else:
                prev_pose = jnp.zeros_like(out[0]["pose"][..., :3])
                prev_pose = jnp.concatenate([prev_pose, prev_pose], axis=-1)
            total, aux = compute_losses(config, out, batch, prev_pose, eps)
            if config.weight_decay_mult > 0:
                total = total + config.weight_decay_mult * weight_l2(params)
            if dynamic and init_boxes is not None:
                aux["obj_hit_rays"] = out[-1]["obj_hit_rays"]
            if config.model.grid_sampling:
                aux["grid_positions"] = out[-1]["positions_c"]
                # Pre-masked by the model: box-hitting rays contribute zero
                # (their positions are object-frame, not the grid's world
                # frame — see models/mipnerf.py).
                aux["grid_weights"] = out[-1]["grid_weights"]
            return total, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)

        # Gradient hygiene (reference train_boxpose.py:262-286). NaN/Inf are
        # scrubbed to 0 (the reference's nan_to_num call effectively zeroes
        # NaN/+Inf but leaves -Inf at float-min until the value clip; see
        # docs/DEFECTS.md).
        grads = jax.tree.map(lambda g: jnp.nan_to_num(g, nan=0.0, posinf=0.0, neginf=0.0), grads)
        if config.grad_max_val > 0:
            grads = jax.tree.map(
                lambda g: jnp.clip(g, -config.grad_max_val, config.grad_max_val), grads
            )
        grad_abs_max = jax.tree_util.tree_reduce(
            lambda x, y: jnp.maximum(x, jnp.max(jnp.abs(y))), grads, initializer=0.0
        )
        grad_norm = _global_norm(grads)
        if config.grad_max_norm > 0:
            mult = jnp.minimum(1.0, config.grad_max_norm / (1e-7 + grad_norm))
            grads = jax.tree.map(lambda g: mult * g, grads)
        grad_norm_clipped = _global_norm(grads)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_grid = state.grid
        if config.model.grid_sampling:
            from durf_tpu.ops import grid as gridops

            new_grid = gridops.update(
                state.grid,
                aux.pop("grid_positions"),
                aux.pop("grid_weights"),
                decay=config.model.grid_decay,
            )
        new_state = TrainState(
            step=step + 1, params=new_params, opt_state=new_opt_state, grid=new_grid
        )

        psnrs = mathx.mse_to_psnr(aux["rgb"])
        stats = {
            "train/loss": loss,
            "train/psnr": psnrs[-1],
            # Object-region PSNR (reference Stats.obj_psnr; NaN-scrubbed when
            # no rays hit a box, as the reference's logger does).
            "train/obj_psnr": jnp.nan_to_num(
                mathx.mse_to_psnr(aux["obj_rgb"][-1]), nan=0.0, posinf=0.0
            ),
            "train/grad_norm": grad_norm,
            "train/grad_abs_max": grad_abs_max,
            "train/grad_norm_clipped": grad_norm_clipped,
            "schedule/lr": lr_fn(step + 1),
            "schedule/eps": eps,
            "schedule/alpha": alpha,
        }
        for i in range(config.model.num_levels):
            stats[f"train/psnr_level{i}"] = psnrs[i]
            for k in (
                "rgb",
                "depth",
                "near",
                "empty",
                "sky",
                "distortion",
                "tv",
                "centering",
                "obj_rgb",
            ):
                stats[f"loss/{k}_{i}"] = aux[k][i]
            stats[f"pose/offset_{i}"] = aux["offset"][i]
            stats[f"pose/offset_yaw_{i}"] = aux["offset_yaw"][i]
            # First ray's sampling histogram for the nerf_weights image
            # (reference train_boxpose.py:484-493); "viz/" keys are arrays and
            # are popped by the train loop before scalar logging.
            stats[f"viz/t_vals_{i}"] = aux["viz_t_vals"][i]
            stats[f"viz/weights_{i}"] = aux["viz_weights"][i]
        stats["loss/box_surface"] = aux["box_surface"]
        if config.model.use_proposal:
            stats["loss/interlevel"] = aux["interlevel"]
        if "obj_hit_rays" in aux:
            # Compaction safety: fraction of rays hitting any box, and rays
            # over the obj_ray_capacity budget (> 0 means object content was
            # dropped this batch — raise the capacity).
            from durf_tpu.models.mipnerf import obj_capacity_k

            stats["obj/hit_frac"] = aux["obj_hit_rays"] / config.batch_size
            if config.model.obj_ray_capacity > 0.0:
                k = obj_capacity_k(
                    config.batch_size, config.model.obj_ray_capacity
                )
                stats["obj/overflow_rays"] = jnp.maximum(
                    0.0, aux["obj_hit_rays"] - k
                )
        return new_state, stats

    return train_step


def make_render_fn(model: MipNerf, config: Config, mesh):
    """Jitted full-eval forward on a chunk of rays -> last-level outputs."""

    # Eval never composites a random background (reference render_eval_fn
    # passes rand_bkgd=False, train_boxpose.py:388).
    eval_background = "white" if config.white_bkgd else "gray"

    multihost = jax.process_count() > 1

    def render_chunk(params, rays, init_boxes, ext, ts, alpha):
        out = model.apply(
            {"params": params},
            rng=jax.random.key(0),
            rays=rays,
            init_boxes=init_boxes,
            ext=ext,
            ts=ts,
            randomized=False,
            background=eval_background,
            alpha=alpha,
        )[-1]
        out = {"rgb": out["rgb"], "depth": out["depth"], "acc": out["acc"]}
        if multihost:
            # All-gather the chunk results so EVERY host holds the full chunk
            # (each host computed only its slice — the reference's pattern:
            # per-host ray slices + in-pmap all_gather + unshard,
            # obbpose_model.py:463-473).
            out = jax.lax.with_sharding_constraint(out, replicate(mesh))
        return out

    jitted = jax.jit(
        render_chunk,
        in_shardings=(
            replicate(mesh),  # params
            batch_sharding(mesh),  # rays
            replicate(mesh),  # init_boxes
            replicate(mesh),  # ext
            replicate(mesh),  # ts
            replicate(mesh),  # alpha
        ),
    )
    if not multihost:
        return jitted

    # Multi-host: the render runs on the GLOBAL training mesh, each host
    # feeding its 1/process_count slice of every chunk (round-2 VERDICT weak
    # #2b: the old host-local eval mesh rendered the ENTIRE image redundantly
    # on every host). Every host owns a full copy of the test rays, so the
    # local slice is assembled with make_array_from_process_local_data; the
    # jit's replicated output arrives complete on every host.
    bshard = batch_sharding(mesh)
    pc, pid = jax.process_count(), jax.process_index()
    synced = False

    def call(params, rays, init_boxes, ext, ts, alpha):
        # Align processes before the FIRST render dispatch: the render jit's
        # collective (the output all-gather) initializes a communicator with
        # a ~30 s rendezvous deadline, and a compile-cache hit/miss split
        # between hosts can skew their dispatch past it ("Gloo context
        # initialization failed: DEADLINE_EXCEEDED"). The barrier is a tiny
        # computation (seconds to compile even on a miss), so after it every
        # host starts the big render compile together.
        nonlocal synced
        if not synced:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("durf_render_start")
            synced = True
        def place(x):
            x = np.asarray(x)
            if x.shape[0] % pc != 0:
                raise ValueError(
                    f"render chunk of {x.shape[0]} rays must divide "
                    f"process_count {pc} (pad the chunk size)"
                )
            local = x.shape[0] // pc
            return jax.make_array_from_process_local_data(
                bshard, x[pid * local : (pid + 1) * local]
            )

        rays = jax.tree.map(place, rays)
        out = jitted(params, rays, init_boxes, ext, ts, alpha)
        # Host numpy per chunk: eager slicing/concat of cross-host global
        # arrays in render_image would itself be a multi-controller op chain;
        # materializing here keeps render_image host-local (same contract as
        # the reference's per-chunk unshard).
        return jax.device_get(out)

    return call


def params_for_render(state):
    """Params for the renderer: the live training arrays, unconditionally —
    the render jit runs on the SAME global mesh as training (round 3; the
    round-2 host-local eval mesh needed a host copy here and rendered the
    full image redundantly on every host)."""
    return state.params


def evaluate_image(render_chunk, params, test_case, alpha, chunk: int):
    """Render one full test image through the chunked renderer."""
    render = lambda rays: render_chunk(
        params,
        rays,
        test_case.get("init"),
        test_case.get("ext"),
        test_case.get("ts"),
        jnp.asarray(alpha, jnp.float32),
    )
    return render_image(render, test_case["rays"], chunk=chunk)


def resolve_obj_capacity(config: Config, dataset, log_fn=print) -> float:
    """Size object-ray compaction from measured scene statistics
    (ModelConfig.obj_ray_capacity == -1, the flagship .gin default).

    capacity = margin * max-over-(timesteps, pyramid factors) any-hit ray
    fraction, with box extents inflated by the pose-noise radius
    (Config.box_noise when random_box — joint pose optimization moves the
    boxes by up to that much, and the runtime hit mask follows the live
    pose table). Returns 0.0 (compaction off) for object-free scenes and
    1.0 (k == batch, numerically the uncompacted path) when the margin
    leaves no headroom — so the auto mode can never be lossy at startup;
    train.warn_obj_overflow remains the loud runtime guard if the scene's
    statistics drift beyond the measured margin mid-training.
    """
    from durf_tpu.data.scene import max_hit_fraction

    inflate = config.box_noise if config.random_box else 0.0
    frac = max(
        max_hit_fraction(s, use_off=config.random_box, inflate=inflate)
        for s in dataset.scenes.values()
    )
    if frac == 0.0:
        return 0.0
    cap = min(1.0, config.model.obj_capacity_margin * frac)
    from durf_tpu.models.mipnerf import obj_capacity_k

    k = obj_capacity_k(config.batch_size, cap)
    log_fn(
        f"obj_ray_capacity auto: max hit fraction {frac:.4f} "
        f"(extents +{inflate:.2f} m) * margin {config.model.obj_capacity_margin} "
        f"-> capacity {cap:.4f} (k={k} of batch {config.batch_size})"
    )
    return cap


def warn_obj_overflow(host_stats: dict, step: int, log_fn=print) -> bool:
    """Make a mis-sized obj_ray_capacity LOUD, not just a logged scalar.

    Compaction is exact only while the batch's box-hit count fits the
    capacity (models/mipnerf.py compaction note); overflowing rays silently
    lose their object contribution. The scalar obj/overflow_rays already
    lands in TensorBoard/metrics.jsonl — this mirrors it to the console the
    moment it goes positive. Returns True when a warning was emitted."""
    over = host_stats.get("obj/overflow_rays", 0.0)
    if over and over > 0:
        log_fn(
            f"WARNING step {step}: obj_ray_capacity overflow — {over:.0f} rays "
            f"over budget lost their object contribution this batch "
            f"(hit_frac={host_stats.get('obj/hit_frac', float('nan')):.4f}); "
            f"raise ModelConfig.obj_ray_capacity"
        )
        return True
    return False


def run_training(
    config: Config,
    data_dir: str,
    train_dir: str,
    max_steps: Optional[int] = None,
    log_fn=print,
) -> TrainState:
    """The full training loop. Returns the final state."""
    max_steps = config.max_steps if max_steps is None else max_steps
    mesh = make_mesh()

    dataset = get_dataset("train", data_dir, config)
    test_dataset = get_dataset("test", data_dir, config)

    if config.model.obj_ray_capacity < 0.0:
        config.model.obj_ray_capacity = resolve_obj_capacity(config, dataset, log_fn)

    example = dataset.peek()
    example_dev = shard_batch(example, mesh, config.batch_size)
    model, variables = construct_model(jax.random.key(20200823), example_dev, config.model)
    num_params = jax.tree_util.tree_reduce(
        lambda x, y: x + int(np.prod(y.shape)), variables["params"], initializer=0
    )
    log_fn(f"params being optimized: {num_params}")

    tx = make_optimizer(config)
    state = create_train_state(config, variables, tx)
    state = jax.device_put(state, replicate(mesh))

    ckpt = CheckpointManager(train_dir, keep=config.checkpoint_keep)
    state = ckpt.restore(state)
    init_step = int(state.step)

    step_body = make_train_step(model, config, tx, jax.random.key(20200823))

    # Device-resident fast path: pools uploaded once, batches sampled in-jit
    # (see durf_tpu/data/device_data.py). Under c2f every pyramid level's pool
    # is resident and a lax.switch on the device step picks the level — no
    # host fallback at factor boundaries. Host streaming otherwise.
    use_device_data = (
        config.device_resident_data
        and config.batching == "timestep"
        and device_data.pool_bytes(dataset) <= config.device_data_max_bytes
    )
    if use_device_data:
        pools = (
            device_data.build_pools_c2f(dataset, mesh)
            if config.use_c2f
            else [device_data.build_pools(dataset, mesh)]
        )
        sample_key = jax.random.key(20201473)
        bsharding = batch_sharding(mesh)
        c2f_steps = tuple(config.c2f_steps)

        def device_step(state, pools):
            key = jax.random.fold_in(sample_key, state.step)
            # Schedules (and the reference's c2f driver, train_boxpose.py:421)
            # key on the 1-indexed step number.
            batch = device_data.sample_batch_c2f(
                pools, state.step + 1, c2f_steps, key, config.batch_size, bsharding
            )
            return step_body(state, batch)

        train_step = jax.jit(device_step, donate_argnums=(0,))
        log_fn(f"device-resident data: {device_data.pool_bytes(dataset) >> 20} MiB of pools")
    else:
        train_step = jax.jit(step_body, donate_argnums=(0,))
    rmesh = eval_mesh(mesh)  # the global training mesh: eval chunks are
    # host-split via make_array_from_process_local_data and all-gathered
    # inside the render jit (see render_image / eval_mesh).
    render_chunk = make_render_fn(model, config, rmesh)
    alpha_fn = make_alpha_schedule(config)

    is_host0 = jax.process_index() == 0
    writer = MetricsWriter(train_dir, enable_tensorboard=is_host0)
    throughput = Throughput(config.batch_size, config.model.samples_per_ray())

    # Periodic manual GC instead of ambient collections mid-step (reference
    # train_boxpose.py:416, 441-442).
    import gc

    gc.disable()
    stats = {}
    for step in range(init_step, max_steps):
        # The c2f schedule keys on the 1-indexed step number, like the
        # reference's `test_dataset.train_it = step` (train_boxpose.py:421).
        dataset.set_step(step + 1)
        test_dataset.set_step(step + 1)
        if use_device_data:
            state, stats = train_step(state, pools)
        else:
            batch = shard_batch(next(dataset), mesh, config.batch_size)
            state, stats = train_step(state, batch)
        throughput.tick()

        if (step + 1) % config.gc_every == 0:
            gc.collect()

        if (step + 1) % config.print_every == 0:
            host_all = jax.device_get(stats)
            viz = {k: np.asarray(v) for k, v in host_all.items() if k.startswith("viz/")}
            host_stats = {
                k: float(v) for k, v in host_all.items() if not k.startswith("viz/")
            }
            host_stats.update(throughput.report())
            writer.scalars(step + 1, host_stats)
            if viz and is_host0:
                n_levels = config.model.num_levels
                writer.image(
                    step + 1,
                    "train/nerf_weights",
                    vis.render_weight_bars(
                        [viz[f"viz/t_vals_{i}"] for i in range(n_levels)],
                        [viz[f"viz/weights_{i}"] for i in range(n_levels)],
                    ),
                )
            log_fn(
                f"step {step + 1}/{max_steps}: loss={host_stats['train/loss']:.4f} "
                f"psnr={host_stats['train/psnr']:.2f} "
                f"{host_stats['perf/rays_per_sec']:.0f} rays/s"
            )
            warn_obj_overflow(host_stats, step + 1, log_fn)

        if (step + 1) % config.save_every == 0:
            ckpt.save(step + 1, jax.device_get(state))

        if config.render_every > 0 and (step + 1) % config.render_every == 0:
            t0 = time.time()
            test_case = next(test_dataset)
            test_dev = {
                k: jax.device_put(np.asarray(v), replicate(rmesh))
                for k, v in test_case.items()
                if k != "rays"
            }
            test_dev["rays"] = test_case["rays"]
            out = evaluate_image(
                render_chunk,
                params_for_render(state),
                test_dev,
                float(alpha_fn(step + 1)),
                chunk=config.chunk,
            )
            psnr = float(mathx.mse_to_psnr(((out["rgb"] - test_case["pixels"]) ** 2).mean()))
            ssim = float(
                mathx.compute_ssim(
                    jnp.asarray(out["rgb"]), jnp.asarray(test_case["pixels"]), max_val=1.0
                )
            )
            n_rays = int(np.prod(test_case["pixels"].shape[:2]))
            writer.scalars(
                step + 1,
                {
                    "test/psnr": psnr,
                    "test/ssim": ssim,
                    "test/rays_per_sec": n_rays / (time.time() - t0),
                },
            )
            writer.image(step + 1, "test/pred_rgb", out["rgb"])
            writer.image(step + 1, "test/target_rgb", test_case["pixels"])
            suite = vis.visualize_suite(out["depth"], out["acc"])
            for k, v in suite.items():
                writer.image(step + 1, f"test/{k}", v)
            log_fn(f"eval step {step + 1}: psnr={psnr:.2f} ssim={ssim:.3f}")
            throughput.reset()  # don't count eval time into train throughput

    gc.enable()
    if max_steps % config.save_every != 0:
        ckpt.save(max_steps, jax.device_get(state), force=True)
    ckpt.wait()
    writer.close()
    return state


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--train_dir", required=True)
    p.add_argument("--gin_file", action="append", default=[])
    p.add_argument("--gin_param", action="append", default=[])
    p.add_argument("--chunk", type=int, default=None)
    p.add_argument("--render_every", type=int, default=None)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument(
        "--multihost",
        action="store_true",
        help="initialize the jax distributed runtime (cross-host DCN training)",
    )
    p.add_argument(
        "--profile_dir",
        default=None,
        help="capture an xprof trace of the first ~20 post-warmup steps here",
    )
    args = p.parse_args(argv)
    # One TPU client per box at a time (tpu_lock.py; CLAUDE.md trap #6).
    from durf_tpu.tpu_lock import acquire_tpu_lock

    acquire_tpu_lock()
    if args.multihost:
        jax.distributed.initialize()
    if args.profile_dir:
        from durf_tpu import metrics as _metrics

        _metrics.start_profiler(args.profile_dir)
        import atexit

        atexit.register(_metrics.stop_profiler)

    config = load_config(args.gin_file, args.gin_param)
    if args.chunk is not None:
        config.chunk = args.chunk
    if args.render_every is not None:
        config.render_every = args.render_every
    run_training(config, args.data_dir, args.train_dir, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
