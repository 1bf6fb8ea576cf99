"""The training loss stack: RGB, URF depth/near/empty, sky, distortion, pose TV.

Behavioral parity with the loss block of reference train_boxpose.py:67-252
under the published configs. Differences (documented, all inert for the
published configs — see docs/DEFECTS.md):
  * the distortion regularizer defaults to the O(N) cumulative-sum form of the
    Mip-NeRF 360 paper instead of materializing [B, S, S] matrices
    (reference train_boxpose.py:146-153); `config.exact_distortion=True`
    switches to the reference's O(N^2) form for parity runs;
  * the depth-mask box-weighting is computed per level rather than
    accumulated across levels (identical when box_loss_mult == 0, which both
    published configs set).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from jax import lax

from durf_tpu import ops


def weight_l2(variables) -> jax.Array:
    """Mean squared parameter value (reference train_boxpose.py:69-75)."""
    tree_sum = lambda fn: jax.tree_util.tree_reduce(
        lambda x, y: x + fn(y), variables, initializer=0
    )
    total = tree_sum(lambda z: jnp.sum(z**2))
    count = tree_sum(lambda z: jnp.prod(jnp.asarray(z.shape)))
    return total / count


def distortion_loss(weights: jax.Array, t_mids: jax.Array, t_dists: jax.Array, exact: bool = False):
    """Mip-NeRF 360 distortion: E_{i,j}[w_i w_j |s_i - s_j|] + (1/3) Σ w² Δs.

    Args:
      weights: [B, S]; t_mids: [B, S] (sorted ascending); t_dists: [B, S].
      exact: use the O(S²) double sum (reference train_boxpose.py:146-153)
        instead of the O(S) sorted cumulative-sum identity
        Σ_ij w_i w_j |s_i−s_j| = 2 Σ_i w_i (s_i W_{<i} − C_{<i}),
        with W_{<i} = Σ_{j<i} w_j and C_{<i} = Σ_{j<i} w_j s_j.
    """
    if exact:
        w_ij = weights[..., :, None] * weights[..., None, :]
        s_ij = jnp.abs(t_mids[..., :, None] - t_mids[..., None, :])
        term1 = (w_ij * s_ij).sum()
    else:
        w_cum = jnp.cumsum(weights, axis=-1) - weights
        ws_cum = jnp.cumsum(weights * t_mids, axis=-1) - weights * t_mids
        term1 = 2.0 * (weights * (t_mids * w_cum - ws_cum)).sum()
    term2 = (1.0 / 3.0) * (weights**2 * t_dists).sum()
    return term1 + term2


def interlevel_loss(
    t_fine: jax.Array,
    w_fine: jax.Array,
    t_prop: jax.Array,
    w_prop: jax.Array,
    eps: float = 1e-6,
) -> jax.Array:
    """Proposal distillation: penalize proposal histograms whose OUTER
    measure under-covers the fine weights (the interlevel loss of mip-NeRF
    360 — the upper-envelope bound of Sec. 3 of that paper; the reference
    never used a proposal level, see configs.ModelConfig.use_proposal).

    For each fine interval [a, b) the proposal's outer measure is the total
    proposal weight over every proposal interval intersecting [a, b). The
    bound w_fine <= outer holds for any histogram refining the same mass, so
    clip(w_fine - outer, 0)^2 / (w_fine + eps) is zero iff the proposal
    places mass everywhere the fine level found it. Fine inputs are
    stop-gradiented: the loss trains the PROPOSAL toward the fine
    distribution, never the reverse.

    TPU note: the overlap is contracted as a DENSE comparison mask batched
    into one [Sf, Sp] matmul per ray — the searchsorted/take_along_axis
    formulation lowers to a scan of per-element gathers (fwd) and
    scatter-adds (VJP), the exact pathology the PDF sampler hit in round 2
    (docs/DESIGN.md "matmul-bracket PDF sampler"; measured here: 26.6M ->
    7.9M ray-samples/s for the WHOLE train step before this rewrite).

    Args:
      t_fine: [B, Sf+1] fine fenceposts; w_fine: [B, Sf] fine weights.
      t_prop: [B, Sp+1] proposal fenceposts; w_prop: [B, Sp] weights.
    """
    t_fine = lax.stop_gradient(t_fine)
    w_fine = lax.stop_gradient(w_fine)
    # overlap[b, k, j] = 1 iff proposal interval j intersects fine interval
    # k: t_prop[j+1] > a_k and t_prop[j] < b_k. Comparisons are non-diff, so
    # the gradient flows only through the matmul's w_prop operand.
    a = t_fine[..., :-1, None]  # [B, Sf, 1]
    b = t_fine[..., 1:, None]
    overlap = jnp.logical_and(
        t_prop[..., None, 1:] > a, t_prop[..., None, :-1] < b
    ).astype(w_prop.dtype)  # [B, Sf, Sp]
    outer = jnp.einsum(
        "bkj,bj->bk", overlap, w_prop, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.mean(jnp.maximum(w_fine - outer, 0.0) ** 2 / (w_fine + eps))


def urf_depth_losses(
    weights: jax.Array,
    t0_vals: jax.Array,
    depth: jax.Array,
    gt_depth: jax.Array,
    depth_mask: jax.Array,
    eps,
):
    """URF LIDAR supervision: depth-MSE, 'near' (line-of-sight) and 'empty'
    (volume carving) losses.

    Args:
      weights: [B, S] rendering weights.
      t0_vals: [B, S] the interval start fenceposts (reference crops
        t_vals[:, :-1], train_boxpose.py:145).
      depth: [B] rendered expected depth.
      gt_depth: [B] metric ground-truth depth (0 = no LIDAR return).
      depth_mask: [B] {0,1} valid-depth mask (possibly box-boosted).
      eps: scalar window half-width (annealed over training).

    Returns:
      (depth_mse, near_loss, empty_loss). Reference train_boxpose.py:155-175:
      the near target is a peak-normalized Gaussian of width eps/3 around the
      GT depth, masked to the ±eps window; 'empty' penalizes weight beyond
      depth+eps; all normalized by the number of valid-depth rays.
    """
    denom = jnp.maximum(depth_mask.sum(), 1.0)
    depth_t = jnp.broadcast_to(gt_depth[..., None], t0_vals.shape)
    sigma = (eps / 3.0) ** 2

    mask_near = ((t0_vals > depth_t - eps) & (t0_vals < depth_t + eps)).astype(weights.dtype)
    mask_near = mask_near * depth_mask[..., None]
    mask_empty = (t0_vals > depth_t + eps).astype(weights.dtype) * depth_mask[..., None]

    dist = mask_near * (t0_vals - depth_t)
    distr = (1.0 / (sigma * jnp.sqrt(2 * jnp.pi))) * jnp.exp(-(dist**2) / (2 * sigma**2))
    distr = distr / distr.max()
    distr = distr * mask_near

    near_loss = ((mask_near * weights - distr) ** 2).sum() / denom
    empty_loss = ((mask_empty * weights) ** 2).sum() / denom
    depth_mse = (depth_mask * (depth - gt_depth) ** 2).sum() / denom
    return depth_mse, near_loss, empty_loss


def sky_loss(depth: jax.Array, sky_mask: jax.Array, gt_sky: jax.Array):
    """Push sky rays to (near-)infinite disparity-style depth.

    sky_depth = 1 - 1/max(depth, 1) on sky rays, regressed to the dataset's
    sky constant (0.995 CARLA / 0.975 Waymo — the 'max NDC disparity').
    Reference train_boxpose.py:186-189.
    """
    denom = jnp.maximum(sky_mask.sum(), 1.0)
    sky_depth = sky_mask * (1.0 - (1.0 / jnp.maximum(sky_mask * depth, 1.0)))
    return ((sky_mask * (sky_depth - gt_sky)) ** 2).sum() / denom


def box_surface_loss(
    rays,
    gt_depth: jax.Array,
    pose: jax.Array,
    rot: jax.Array,
    ext: jax.Array,
    margin: float,
    inst: jax.Array | None = None,
    obj_ids: jax.Array | None = None,
) -> jax.Array:
    """Depth-point-to-box-surface pose prior (Config.box_surface_loss_mult).

    World LIDAR points p = o + d * t_gt (metric depth in the unnormalized-ray
    parameterization, data/synthetic.py:67 — the same convention the URF
    losses consume) are mapped into each object's canonical frame at the
    batch timestep's OPTIMIZED pose; points within `margin` of the box
    surface are regressed onto it via the squared box-SDF. This is a pure
    function of the pose (and data): unlike the photometric and centering
    losses the field cannot co-adapt to absorb it, so its basin is anchored
    at the true box fit. No reference analogue; it uses the same LIDAR
    channel as the reference's URF losses (train_boxpose.py:155-175) and the
    dataset premise that boxes fit their objects (README.md:43-46).

    Args:
      rays: the batch Rays.
      gt_depth: [B] metric GT depth (0 = no LIDAR return).
      pose: [N_obj, 3] optimized box centers for the batch timestep.
      rot: [N_obj, 3] optimized axis-angle (world->object convention).
      ext: [N_obj, 3] box half-extents.
      margin: trim radius in meters — |sdf| >= margin points are outliers
        (background seen past a miss, ground adjacent to the footprint).
      inst: optional [B, 1] per-ray instance ids from the dataset's 2D
        instance masks (2D_boxes.npz — the channel the reference loads but
        never batches, obbpose_dataset.py:524-595). When given with
        obj_ids, only rays whose mask id matches the object are kept: exact
        outlier rejection (a ground point adjacent to the footprint passes
        the margin trim but not the mask).
      obj_ids: optional [N_obj] instance id per model object index.

    Returns:
      Scalar: mean squared SDF over kept points, summed over objects.
    """
    p = rays.origins + rays.directions * gt_depth[:, None]  # [B, 3]
    rmat = ops.axis_angle_to_matrix(rot)  # [N_obj, 3, 3] world->object
    x = jnp.einsum(
        "oij,boj->boi", rmat, p[:, None, :] - pose[None, :, :]
    )  # [B, N_obj, 3] canonical depth points
    q = jnp.abs(x) - ext[None]
    # Safe norm: for interior points max(q, 0) is the zero vector and the
    # exact norm has a 0/0 gradient (NaN); the 1e-12 floor keeps the
    # gradient 0 there at a value bias of 1e-6 m.
    out_dist = jnp.sqrt((jnp.maximum(q, 0.0) ** 2).sum(axis=-1) + 1e-12)
    sdf = out_dist + jnp.minimum(q.max(axis=-1), 0.0)
    # [B, N_obj] box SDF (negative inside)
    keep = (gt_depth > 0.0)[:, None] & (
        jnp.abs(lax.stop_gradient(sdf)) < margin
    )
    if inst is not None and obj_ids is not None:
        keep = keep & (inst.reshape(-1, 1) == obj_ids[None, :])
    keep = keep.astype(jnp.float32)
    per_obj = (keep * sdf**2).sum(axis=0) / jnp.maximum(keep.sum(axis=0), 1.0)
    return per_obj.sum()


def compute_losses(
    config,
    levels: List[Dict[str, Any]],
    batch: Dict[str, Any],
    prev_pose: jax.Array,
    eps,
) -> tuple[jax.Array, Dict[str, jax.Array]]:
    """Aggregate the full per-level loss stack.

    Args:
      config: durf_tpu.configs.Config.
      levels: model output list (see MipNerf.__call__).
      batch: dict with 'rays' (Rays), 'pixels' [B,3], 'depth' [B,1],
        'sky' [B,1], 'target' [N_obj,6].
      prev_pose: [N_obj, 6] pose of the adjacent timestep for the TV loss.
      eps: URF window half-width for this step.

    Returns:
      (total_loss, aux) where aux holds per-level scalars for logging.
    """
    rays = batch["rays"]
    pixels = batch["pixels"][..., :3]
    gt_depth = batch["depth"].squeeze(-1) if batch["depth"].ndim > 1 else batch["depth"]
    gt_sky = batch["sky"].squeeze(-1) if batch["sky"].ndim > 1 else batch["sky"]

    mask = rays.lossmult
    if config.disable_multiscale_loss:
        mask = jnp.ones_like(mask)

    depth_valid = (gt_depth > 0.0).astype(jnp.float32)
    sky_valid = (gt_sky > 0.0).astype(jnp.float32)
    sky_valid = sky_valid - depth_valid * sky_valid  # LIDAR wins on overlap

    per_level: Dict[str, list] = {
        k: []
        for k in (
            "rgb",
            "obj_rgb",
            "depth",
            "near",
            "empty",
            "sky",
            "distortion",
            "tv",
            "centering",
            "offset",
            "offset_x",
            "offset_y",
            "offset_z",
            "offset_yaw",
        )
    }

    for level in levels:
        rgb = level["rgb"]
        depth = level["depth"]
        weights = level["weights"]
        t0_vals = level["t_vals"][:, :-1]
        dyn_mask = level["dyn_mask"]  # [B, 1]
        pose, rot = level["pose"], level["rot"]  # [N_obj, 3] each

        # Pose diagnostics vs the (noise-free) targets.
        target = batch.get("target")
        if target is None:  # static scene: no boxes, diagnostics vs zero
            target = jnp.zeros((pose.shape[0], 6), pose.dtype)
        per_level["offset"].append(((pose - target[:, :3]) ** 2).sum())
        per_level["offset_x"].append(((pose[:, 0] - target[:, 0]) ** 2).sum())
        per_level["offset_y"].append(((pose[:, 1] - target[:, 1]) ** 2).sum())
        per_level["offset_z"].append(((pose[:, 2] - target[:, 2]) ** 2).sum())
        per_level["offset_yaw"].append(((rot - target[:, 3:]) ** 2).sum())

        # Temporal smoothness vs the adjacent timestep's pose.
        per_level["tv"].append(((pose - prev_pose[:, :3]) ** 2).sum())

        # Object-centering prior: ||density-weighted canonical centroid||^2
        # per object (models/mipnerf.py returns it for dynamic scenes; see
        # Config.centering_loss_mult — 0.0 keeps reference parity).
        per_level["centering"].append(
            (level["obj_centroid"] ** 2).sum()
            if "obj_centroid" in level
            else jnp.zeros(())
        )

        # Rays whose GT depth lies inside an object box get the box boost.
        box_mask = (gt_depth < level["z_out"]).astype(jnp.float32)
        depth_mask = depth_valid + config.box_loss_mult * dyn_mask.squeeze(-1) * box_mask

        per_level["distortion"].append(
            distortion_loss(weights, level["t_mids"], level["t_dists"], config.exact_distortion)
        )

        d_mse, near_l, empty_l = urf_depth_losses(
            weights, t0_vals, depth, gt_depth, depth_mask, eps
        )
        per_level["depth"].append(d_mse)
        per_level["near"].append(near_l)
        per_level["empty"].append(empty_l)
        per_level["sky"].append(sky_loss(depth, sky_valid, gt_sky))

        rgb_weight = mask + config.box_loss_mult * dyn_mask * box_mask[..., None]
        per_level["rgb"].append(((rgb_weight * (rgb - pixels) ** 2).sum()) / mask.sum())
        per_level["obj_rgb"].append(
            (dyn_mask * (rgb - pixels) ** 2).sum() / jnp.maximum(dyn_mask.sum(), 1e-8)
        )

    # Box-surface depth prior: pose-only (level-independent), computed once
    # from the final level's live pose tensors. Gated on dynamics (ext
    # present) and the config mult, so parity configs trace nothing extra.
    ext = batch.get("ext")
    if config.box_surface_loss_mult > 0.0 and ext is not None:
        surface = box_surface_loss(
            rays,
            gt_depth,
            levels[-1]["pose"],
            levels[-1]["rot"],
            ext,
            config.box_surface_margin,
            inst=batch.get("inst"),
            obj_ids=batch.get("obj_ids"),
        )
    else:
        surface = jnp.zeros(())

    aux = {k: jnp.asarray(v) for k, v in per_level.items()}
    aux["box_surface"] = surface
    # First ray's sampling state, for the weights-histogram visualization.
    # Proposal levels may carry a different sample count (ModelConfig.
    # proposal_samples): pad to the widest level so the stack stays legal —
    # t fenceposts edge-extended, weights zero-padded (an empty histogram
    # tail, invisible in the viz).
    s_max = max(lv["t_vals"].shape[-1] for lv in levels)
    aux["viz_t_vals"] = jnp.stack(
        [
            jnp.pad(lv["t_vals"][0], (0, s_max - lv["t_vals"].shape[-1]), mode="edge")
            for lv in levels
        ]
    )
    aux["viz_weights"] = jnp.stack(
        [
            jnp.pad(lv["weights"][0], (0, s_max - 1 - lv["weights"].shape[-1]))
            for lv in levels
        ]
    )

    # Proposal levels (ModelConfig.use_proposal) carry no meaningful rgb:
    # zero the RGB-dependent coarse-level loss weights (python zeros, so XLA
    # dead-code-eliminates those computations) and add the interlevel
    # distillation loss against the stop-gradiented final level. The
    # WEIGHT-HISTOGRAM losses (URF depth/near/empty, sky, distortion, pose
    # TV) stay at their reference coarse multipliers — they are functions of
    # (weights, t_vals, depth) only, and dropping them measurably hurts:
    # the first proposal quality run zeroed everything and the proposal
    # histogram, deprived of LIDAR supervision, placed fine samples off the
    # true surface (equal-step depth-MSE 1.72 vs 1.14 baseline — round-5
    # STATUS table); keeping them restores the reference's depth-shaped
    # coarse sampling.
    use_prop = getattr(config.model, "use_proposal", False) and len(levels) > 1
    if use_prop:
        aux_inter = jnp.sum(
            jnp.asarray(
                [
                    interlevel_loss(
                        levels[-1]["t_vals"],
                        levels[-1]["weights"],
                        lv["t_vals"],
                        lv["weights"],
                    )
                    for lv in levels[:-1]
                ]
            )
        )
    else:
        aux_inter = jnp.zeros(())

    # Aggregation weights follow reference train_boxpose.py:211-220.
    def agg(vals, final_mult, coarse_mult, rgb_dependent=False):
        if use_prop and rgb_dependent:
            coarse_mult = 0.0
        return final_mult * vals[-1] + coarse_mult * jnp.sum(vals[:-1])

    total = agg(aux["rgb"], 1.0, config.coarse_loss_mult, rgb_dependent=True)
    total += agg(aux["sky"], 10.0 * config.sky_loss_mult, config.sky_loss_mult)
    total += agg(aux["depth"], config.depth_loss_mult, 0.1 * config.depth_loss_mult)
    total += agg(aux["near"], config.near_loss_mult, 0.1 * config.near_loss_mult)
    total += agg(aux["empty"], config.empty_loss_mult, 0.1 * config.empty_loss_mult)
    total += agg(aux["tv"], config.tv_loss_mult, 0.1 * config.tv_loss_mult)
    total += agg(
        aux["centering"], config.centering_loss_mult, 0.1 * config.centering_loss_mult
    )
    total += agg(aux["distortion"], config.distortion_loss_mult, config.distortion_loss_mult)
    total += config.box_surface_loss_mult * aux["box_surface"]
    aux["interlevel"] = aux_inter
    total += config.proposal_loss_mult * aux_inter
    return total, aux
