"""Configuration: typed dataclasses plus a gin-compatible config-file parser.

The reference drives everything through gin files binding `Config`,
`MipNerfModel` and `MLP` fields (reference internal/utils.py:89-165,
configs/*.gin). gin is not available here, so this module provides the same
two-tier system natively: dataclasses with the same field names, and
`load_config()` which parses the reference's .gin syntax (`Class.field =
literal`, comments, tuples) directly onto them — reference-prepared config
files work unchanged.
"""

from __future__ import annotations

import ast
import dataclasses
from dataclasses import dataclass, field
from typing import Any, Tuple


@dataclass
class MLPConfig:
    """MLP hyperparameters (reference obbpose_model.py:293-303, 357-367)."""

    net_depth: int = 8  # layers in the trunk
    net_width: int = 256  # trunk width
    net_depth_condition: int = 1  # layers in the viewdir-conditioned head
    net_width_condition: int = 128  # head width
    net_activation: str = "relu"
    skip_layer: int = 4  # concat the input after every N trunk layers
    num_rgb_channels: int = 3
    num_density_channels: int = 1


@dataclass
class ModelConfig:
    """MipNerfModel hyperparameters (reference obbpose_model.py:42-66)."""

    num_samples: int = 128  # samples per level
    num_levels: int = 2  # sampling levels (coarse, fine)
    resample_padding: float = 0.01  # histogram padding for level-2 resampling
    stop_level_grad: bool = True  # block gradients across levels
    use_viewdirs: bool = True
    lindisp: bool = False  # sample in disparity instead of depth
    ray_shape: str = "cone"  # 'cone' | 'cylinder'
    min_deg_point: int = 0
    max_deg_point: int = 10
    deg_view: int = 4
    num_objects: int = 2  # moving objects in the scene graph
    density_activation: str = "softplus"
    density_noise: float = 0.1  # stddev of raw-density regularization noise
    density_bias: float = -1.0
    rgb_activation: str = "sigmoid"
    rgb_padding: float = 0.001
    disable_integration: bool = False  # PE instead of IPE
    contraction: bool = True  # mip360 unbounded-scene contraction
    contract_threshold: float = 0.1  # reference uses 0.1 (paper: 1.0)
    dynamics: bool = True  # scene-graph object decomposition
    timesteps: int = 5
    no_pose_opt: bool = False  # stop-gradient on box translations
    no_yaw_opt: bool = False  # stop-gradient on box rotations
    # Sample box-hitting rays inside [z_in - margin, z_out + margin] instead
    # of the global near/far (the reference computes these bounds and then
    # discards them — docs/DEFECTS.md #3; off by default for parity).
    use_box_nearfar: bool = False
    box_nearfar_margin: float = 5.0
    # TPU-first additions (not in the reference):
    # Occupancy-grid level-0 sampling (VaxNeRF-style empty-space skipping):
    # a contracted-domain density grid threads through TrainState, is updated
    # each step from rendering weights, and replaces uniform stratified
    # sampling with a grid-informed per-ray PDF.
    grid_sampling: bool = False
    grid_resolution: int = 96
    grid_probes: int = 128  # cheap occupancy taps per ray (no MLP)
    grid_floor: float = 1e-2  # minimum PDF mass so unexplored space is seen
    grid_decay: float = 0.995  # per-step EMA decay of the grid
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16' MLP compute
    use_pallas_mlp: bool = False  # fused Pallas MLP kernel on TPU
    # Remat the XLA-path MLP forward (jax.checkpoint): recompute the trunk in
    # the backward instead of storing per-layer activations. Without it the
    # XLA backward at batch 8192 needs ~28 GB (> 15.75 GB HBM); the Pallas
    # path recomputes in-tile already and ignores this flag.
    remat_mlp: bool = False
    # Objects-in-grid kernel: all object MLPs in ONE pallas_call with the
    # object axis as an inner grid dimension — shared features fetched once
    # per tile, hit-masked outputs accumulated in-kernel, per-ray viewdir
    # condition hoisted out (ops/pallas/obj_mlp.py). Exact same math as the
    # vmapped path; active only with use_pallas_mlp + coord_major + dynamics.
    fused_objects: bool = True
    # Plain (unguarded) trig in the encodings: exact while |2^k x| stays far
    # below the TPU blow-up range (~1e8) — guaranteed post-contraction; skips
    # the mod/where range reduction on the hot VPU path. False = reference's
    # safe_sin everywhere.
    fast_trig: bool = False
    # Recurrence IPE: one exp/sin/cos per coordinate, degrees built by
    # repeated squaring + double angles (~10x fewer VPU transcendentals at
    # max_deg=10; the encode fusion dominates the non-MLP step time). Error
    # grows ~2^k ulps along the band — far below bf16 resolution; pair with
    # compute_dtype='bfloat16'. Needs diag_covariance. False = reference form.
    recurrent_encode: bool = False
    # Diagonal-covariance pipeline: EXACT for the axis-aligned power-of-two
    # IPE basis (the only basis used), and avoids hauling [B,S,3,3] tensors
    # through forward+backward. False restores the reference's full-cov path.
    diag_covariance: bool = True
    # Coordinate-major sample pipeline (diag only): means/covs flow as
    # [3, B, S] planes instead of [B, S, 3] rows. XLA stores [N, 3] arrays
    # padded to (8, 128) tiles — 3 of 128 lanes used — so every elementwise
    # op on row-major coordinates moves ~42x the logical HBM bytes (measured
    # ~17 ms of an 87 ms flagship step; docs/DESIGN.md round-2 profile).
    # Same values, dense tiles. False = row-major (always used for full cov).
    coord_major: bool = True
    # Object-centering readout mode (see Config.centering_loss_mult):
    #  'mean'     — density-weighted mean of in-slab canonical samples. For
    #               OPAQUE objects the field's density is a shell on the
    #               VISIBLE faces only, so the mass mean sits toward the
    #               camera-facing face — centering on it parks the box
    #               half-an-extent off (measured: the g1 recipe's z error
    #               converges to ~0.6*ext_z, the front-face shell centroid).
    #  'midrange' — (softmax_hi + softmin_lo)/2 of the OCCUPIED canonical
    #               extent per axis: a tight-bounding-box fit. Visible side
    #               faces span the full slab, so the occupancy extremes hit
    #               +/-ext even when only some faces are observed, and the
    #               midrange reads the true center where the mass mean is
    #               shell-biased.
    # Object-ray compaction: run the object encode + MLPs on only the top
    # ceil(obj_ray_capacity * batch) rays (hit rays first, k rounded up to a
    # kernel-legal multiple of 128) and scatter the outputs back. Objects
    # cover 2-10% of rays at the flagship operating points while the object
    # pipeline costs ~40% of the step — numerically EXACT whenever the
    # batch's hit count stays under the capacity (gather/scatter is a
    # permutation; the rest have hit == 0). 0.0 = off (reference parity).
    # -1.0 = AUTO: the trainer sizes the capacity at startup from the
    # scene's measured worst-timestep hit fraction (data.scene.
    # max_hit_fraction with extents inflated by the pose-noise radius),
    # times obj_capacity_margin — the shipped default in the flagship .gin
    # configs. The contract: rays beyond capacity lose their object
    # contribution (train.warn_obj_overflow makes any overflow loud, and
    # obj/overflow_rays is logged every print_every); the auto sizing keeps
    # a measured-margin guarantee instead of a hand-picked knob. The static
    # k keeps the one-compile property. Resolved only by the trainer;
    # eval/render leave -1 as off (uncompacted == exact, and eval chunks
    # amortize the object cost anyway).
    obj_ray_capacity: float = 0.0
    # AUTO-mode safety factor over the measured worst-timestep hit fraction
    # (2x absorbs batch-sampling variance — a batch is a binomial draw from
    # the pool, and k also rounds up to the next multiple of 128).
    obj_capacity_margin: float = 2.0
    centering_mode: str = "midrange"
    centering_beta: float = 16.0  # softmax sharpness, 1/meters (midrange)
    centering_tau: float = 1.0  # occupancy saturation density (midrange)
    # Proposal-MLP coarse levels (mip-NeRF 360's proposal architecture; the
    # reference never used it, though its mip360.py:126-157 volumetric_density
    # is exactly the proposal-level scaffold): every level but the last
    # evaluates the small `proposal_mlp` instead of the full background MLP.
    # The proposal's histogram only has to PLACE the fine samples, not render
    # — it is trained by distilling the final level's weights through
    # losses.interlevel_loss (Config.proposal_loss_mult) while the coarse
    # photometric/URF losses switch off. Profiled motivation (round 5,
    # docs/DESIGN.md): the 8x256 background MLP is 77% of the compacted step,
    # half of it on level 0. Off by default (reference parity).
    use_proposal: bool = False
    proposal_mlp: MLPConfig = field(
        default_factory=lambda: MLPConfig(net_depth=4, net_width=128)
    )
    # Samples per PROPOSAL level (0 = num_samples). mip-NeRF 360 decouples
    # the two: many cheap proposal samples buy placement resolution for few
    # expensive fine samples. Only read when use_proposal; the final level
    # always draws num_samples.
    proposal_samples: int = 0
    mlp: MLPConfig = field(default_factory=MLPConfig)
    box_mlp: MLPConfig = field(
        default_factory=lambda: MLPConfig(net_width=128)
    )

    def level_samples(self, i_level: int) -> int:
        """Samples drawn at level i (proposal levels may differ — see
        proposal_samples)."""
        if (
            self.use_proposal
            and self.proposal_samples > 0
            and i_level < self.num_levels - 1
        ):
            return self.proposal_samples
        return self.num_samples

    def samples_per_ray(self) -> int:
        """Total MLP-evaluated samples per ray across all levels (the
        ray-samples throughput denominator)."""
        return sum(self.level_samples(i) for i in range(self.num_levels))

    def __post_init__(self):
        if self.recurrent_encode and not self.contraction and not self.fast_trig:
            import warnings

            warnings.warn(
                "recurrent_encode ignores the safe_sin range guard (its "
                "recurrence seeds call raw trig); with contraction=False the "
                "uncontracted 2^deg*x inputs can reach the TPU transcendental "
                "blow-up range. Enable contraction, or disable "
                "recurrent_encode for unbounded raw coordinates.",
                stacklevel=2,
            )


@dataclass
class Config:
    """Training/data configuration, field-compatible with reference
    internal/utils.py:89-144."""

    dataset_loader: str = "multicam"
    batching: str = "all_images"  # all_images|single_image|timestep|...
    batch_size: int = 4096  # rays per optimization step (global)
    factor: int = 0  # image downsample factor
    spherify: bool = False
    centering: bool = False  # recenter poses around the average camera
    random_box: bool = False  # jitter GT box centers (pose-opt experiments)
    random_yaw: bool = False
    box_noise: float = 0.5  # meters of uniform box-center noise
    yaw_noise: float = 5.0  # degrees of yaw noise
    render_path: bool = False
    llffhold: int = 8
    timesteps: int = 5
    lr_init: float = 5e-4
    lr_final: float = 5e-6
    lr_delay_steps: int = 2500
    lr_delay_mult: float = 0.01
    eps_delay_steps: int = 0
    eps_init: float = 3.0  # URF near-loss window start
    eps_final: float = 0.2
    eps_max_steps: int = 1_000_000
    l2_reg: bool = False
    alpha_init: float = 0.0  # BARF frequency-annealing schedule
    alpha_final: float = 10.0
    alpha_delay_steps: int = 0
    alpha_max_steps: int = 1_000_000
    psreg_init: float = 10e5
    psreg_final: float = 10e-1
    psreg_delay_steps: int = 5000
    psreg_delay_mult: float = 1.0
    tv_loss_mult: float = 0.0001
    depth_loss_mult: float = 0.0001
    near_loss_mult: float = 0.01
    empty_loss_mult: float = 1.0
    sky_loss_mult: float = 1.0
    distortion_loss_mult: float = 1e-6  # hardcoded in reference train_boxpose.py:220
    c2f_steps: Tuple[int, ...] = (5000, 10000, 15000)
    grad_max_norm: float = 0.0
    grad_max_val: float = 0.0
    max_steps: int = 1_000_000
    save_every: int = 100_000
    print_every: int = 100
    gc_every: int = 10_000
    test_render_interval: int = 1
    render_every: int = 5000
    chunk: int = 8192
    disable_multiscale_loss: bool = False
    randomized: bool = True
    near: float = 2.0
    far: float = 6.0
    coarse_loss_mult: float = 0.1
    # Proposal distillation weight (ModelConfig.use_proposal): the coarse
    # levels' only training signal — losses.interlevel_loss between each
    # proposal histogram and the stop-gradiented final-level weights
    # (mip-NeRF 360's interlevel loss; their published weight is 1.0).
    proposal_loss_mult: float = 1.0
    box_loss_mult: float = 0.0
    # Object-centering prior (durf_tpu extension; no reference analogue):
    # penalize the density-weighted centroid of each object's CANONICAL-frame
    # samples. KNOWN NOT TO RECOVER POSES — kept as the documented negative:
    # every recorded use drifted (all 8 g-recipes, docs/STATUS.md "Object-
    # centering prior"), because any prior read out of the reconstructed
    # field has a fixed point the field co-adapts to during joint training
    # ('mean' converges to the visible-shell mass centroid, ~0.6*ext_z off;
    # 'midrange' inherits the occupancy bias). Superseded by
    # box_surface_loss_mult, whose anchor is the LIDAR data, not the field.
    # 0.0 = off (reference parity).
    centering_loss_mult: float = 0.0
    # Box-surface depth prior (durf_tpu extension; no reference analogue):
    # LIDAR depth points that land inside/near an object's box should lie ON
    # the box surface (the dataset's box premise — boxes are fitted to the
    # object, reference README.md:43-46). Penalizing the squared signed
    # distance of each canonical-frame depth point to the box surface is a
    # pose loss with NO path through the field: the field cannot absorb it,
    # so it supplies a restoring force that survives warmup entrenchment
    # (unlike photometric/centering, whose fixed points the field co-adapts
    # to — round-4 f/g ledger). Points farther than box_surface_margin from
    # the surface are trimmed (background/ground outliers). 0.0 = off.
    box_surface_loss_mult: float = 0.0
    # Trim radius in the model's internal units (the loader divides the
    # world by WORLD_SCALE=5, scene.py:51, so 0.2 here ~= 1 m real on
    # CARLA/Waymo-style scenes).
    box_surface_margin: float = 0.2
    weight_decay_mult: float = 0.0
    white_bkgd: bool = False
    rand_bkgd: bool = True
    # TPU-first additions (not in the reference):
    test_indices: Tuple[int, ...] = ()  # override the loader's test split
    # Device-resident ray pools: upload the dataset once, sample batches
    # inside the jit (zero per-step host traffic). Applies to 'timestep'
    # batching without the c2f pyramid; falls back to host streaming above
    # the byte limit.
    device_resident_data: bool = True
    device_data_max_bytes: int = 4 << 30
    use_c2f: bool = False  # coarse-to-fine resolution pyramid (16/12/8/4)
    exact_distortion: bool = False  # O(N^2) parity form instead of O(N)
    pose_lr_mult: float = 1.0  # LR multiplier for the box_centers pose table
    # Pose-LR warmup (durf_tpu extension; 0 = off): the pose table's LR is 0
    # until `pose_lr_delay_steps`, then ramps linearly to pose_lr_mult over
    # `pose_lr_ramp_steps`. Rationale (docs/DESIGN.md "Joint pose
    # optimization"): before the field has coarse structure, pose gradients
    # are noise — a measured 0.23->0.47 pose-MSE blowup in the first 5k steps
    # at pose_lr_mult=2 — while a converged field recovers noised poses
    # cleanly. Delay the pose updates past the garbage-gradient phase.
    pose_lr_delay_steps: int = 0
    pose_lr_ramp_steps: int = 1000
    # Cosine-decay the pose LR to 0 over this many steps AFTER delay+ramp
    # (0 = no decay). The isolation probe's converged schedule: recover the
    # pose inside the coarse BARF window, then freeze it — without decay the
    # recovered pose random-walks away again (docs/DESIGN.md).
    pose_lr_decay_steps: int = 0
    # Hard-freeze every NON-pose parameter while the pose window is active
    # (steps in (delay, delay+ramp+decay]; to the end of the run if decay=0).
    # This reproduces the isolation probe's PROVEN regime — pose optimized
    # against a genuinely static field (0.23 -> 0.036 pose-MSE) — inside one
    # continuous run. The mult-only f recipes approximate it with a tiny late
    # field LR, which still lets the object MLP absorb pose error (the ~2x
    # drift failure mode in the round-3 ledger).
    pose_freeze_field: bool = False
    checkpoint_keep: int = 100
    data_parallel_axis: str = "data"
    model: ModelConfig = field(default_factory=ModelConfig)

    @property
    def background(self) -> str:
        """Map the reference's two bools onto a background mode.

        Reference mip.py:321-326: white wins, then random, else mid-gray.
        """
        if self.white_bkgd:
            return "white"
        if self.rand_bkgd:
            return "random"
        return "gray"


# Mapping of gin binding targets onto (object path inside Config).
_SCOPE_TO_PATH = {
    "Config": (),
    "MipNerfModel": ("model",),
    "MLP": ("model", "mlp"),
    "BoxMLP": ("model", "box_mlp"),
    "ProposalMLP": ("model", "proposal_mlp"),
}

# gin external_configurable names used by the reference configs.
_ACTIVATION_NAMES = {
    "flax.nn.relu": "relu",
    "flax.nn.sigmoid": "sigmoid",
    "flax.nn.softplus": "softplus",
    "@flax.nn.relu": "relu",
    "@flax.nn.sigmoid": "sigmoid",
    "@flax.nn.softplus": "softplus",
}


def _coerce(value: Any, current: Any) -> Any:
    """Coerce a parsed literal to the type of the existing dataclass field."""
    if isinstance(current, bool):
        return bool(value)
    if isinstance(current, int) and not isinstance(value, bool):
        if isinstance(value, float) and value != int(value):
            return value  # keep e.g. eps_final=0.2 on an int-hinted field
        return int(value)
    if isinstance(current, float):
        return float(value)
    if isinstance(current, tuple):
        return tuple(value)
    return value


def apply_binding(config: Config, scope: str, name: str, value: Any) -> None:
    """Apply one `Scope.name = value` binding onto the config tree."""
    if scope not in _SCOPE_TO_PATH:
        raise ValueError(f"unknown config scope {scope!r}")
    target = config
    for attr in _SCOPE_TO_PATH[scope]:
        target = getattr(target, attr)
    if not hasattr(target, name):
        raise ValueError(f"unknown config field {scope}.{name}")
    current = getattr(target, name)
    setattr(target, name, _coerce(value, current))


def parse_gin_lines(config: Config, lines) -> Config:
    """Parse reference-style gin lines onto `config` (in place; returned)."""
    for raw in lines:
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if "=" not in line:
            raise ValueError(f"cannot parse config line: {raw!r}")
        lhs, rhs = (s.strip() for s in line.split("=", 1))
        if "." not in lhs:
            raise ValueError(f"expected Scope.field on lhs: {raw!r}")
        scope, name = lhs.split(".", 1)
        if rhs in _ACTIVATION_NAMES:
            value: Any = _ACTIVATION_NAMES[rhs]
        else:
            value = ast.literal_eval(rhs)
        apply_binding(config, scope, name, value)
    return config


def load_config(gin_files=(), bindings=(), base: Config | None = None) -> Config:
    """Build a Config from gin files plus `Scope.field=value` override strings.

    Mirrors reference utils.load_config() (utils.py:162-165) without the gin
    dependency.
    """
    config = base if base is not None else Config()
    for path in gin_files:
        with open(path) as f:
            parse_gin_lines(config, f.readlines())
    parse_gin_lines(config, bindings)
    return config


def config_to_dict(config) -> dict:
    """Recursive dataclass -> dict (for checkpoint metadata / logging)."""
    return dataclasses.asdict(config)
