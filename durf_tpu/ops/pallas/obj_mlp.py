"""Objects-in-grid fused MLP kernel: every object MLP in ONE pallas_call.

Replaces the vmapped per-object kernel dispatch (reference python-unrolls the
object loop entirely, obbpose_model.py:174-201; round 2 vmapped it into a
batched kernel). The remaining waste the round-2 profile charged to the
object path (~45-55% MXU efficiency, 3-7 ms of a 64 ms step):

  * the gate blend `hit*enc + (1-hit)*c0` materialized per object in HBM
    ([N_obj, N, F] written + read back);
  * per-object outputs [N_obj, C, N] written out, then hit-masked and summed
    by XLA (read again);
  * the shared [F, N] features fetched once PER OBJECT;
  * the per-ray viewdir condition matmul done once PER SAMPLE per object.

This kernel makes the object axis an inner GRID dimension instead:
grid = (tiles, objects), object innermost. Per tile the shared feature block
is fetched once and reused by every object (constant index map over the
object dim); per (tile, object) the kernel runs the object's MLP and
ACCUMULATES `hit_o * out_o` directly into the [C, tile] output block — the
masked sum over objects that the model wants, so per-object outputs never
exist in HBM. The gate blend disappears entirely: for a 0/1 hit mask,
`hit * MLP(hit*enc + (1-hit)*c0) == hit * MLP(enc)` in value AND gradient
(where hit = 0 the contribution and its cotangent are both zero), so the
kernel just scales outputs by the gate.

The per-ray condition is hoisted: `cond @ head_0_kernel[width:]` depends only
on the ray, so it is computed once per ray per object OUTSIDE the kernel
(a [B, F_c] x [F_c, W_c] matmul, B rays not B*S samples) and the kernel
expands the [R, W_c] per-ray rows to [T, W_c] per-sample rows with an exact
0/1 expansion matmul (rows repeat S times; its transpose in the backward IS
the per-ray gradient sum). Net per-sample condition traffic drops S-fold and
the in-kernel condition matmul vanishes.

The backward recomputes the forward per (tile, object) in VMEM (same recipe
as fused_mlp.py): input grads accumulate over the inner object loop into the
tile's dx block; weight grads accumulate into VMEM-resident stacked blocks
(constant index maps, ~1.3 MB fp32 for two 128-wide MLPs) that flush once at
the end; the gate needs no gradient (the model stop-gradients the hit mask).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from durf_tpu.ops.pallas.fused_mlp import _dot_t, _forward_tile, mlp_params_from_flax


def _tile_geometry(s_per_ray: int, tile_max: int):
    """Pick (rays_per_tile, tile) with tile = R*S, R % 8 == 0, tile % 128 == 0.

    Mosaic block shapes need the second-minor dim divisible by 8 (the per-ray
    condition block is [R, W_c]) and the minor dim divisible by 128 (the
    feature block is [F, tile]); tiles hold whole rays so the in-kernel
    ray->sample expansion stays a static reshape.
    """
    k0 = 16 // math.gcd(s_per_ray, 16)
    r_unit = 8 * k0
    t_unit = r_unit * s_per_ray
    m = max(1, tile_max // t_unit)
    return r_unit * m, t_unit * m


def _expand_rows(per_ray, s_per_ray: int):
    """[R, W] per-ray rows -> [R*S, W] per-sample rows: a pure sublane
    broadcast + merge (no compute). An earlier 0/1 expansion MATMUL was exact
    but MXU-latency-bound (K = R = 16 wastes the systolic depth; measured
    ~2 us per grid step, ~2 ms/step across fwd+bwd grids — the whole win of
    the fused kernel). The vjp of broadcast+reshape is the per-ray sum over
    the sample axis, on the VPU."""
    r, w = per_ray.shape
    return jnp.broadcast_to(per_ray[:, None, :], (r, s_per_ray, w)).reshape(
        r * s_per_ray, w
    )


def _as_3d(weights):
    """Give stacked biases [N_obj, W] a unit middle axis -> [N_obj, 1, W]:
    Mosaic requires a block's last two dims divisible by (8, 128) or EQUAL to
    the array dims, so a (1, W) bias block over [N_obj, W] is illegal while
    (1, 1, W) over [N_obj, 1, W] is. Kernels [N_obj, r, c] pass through; the
    in-kernel [0]-strip then yields [r, c] kernels and [1, W] biases — the
    exact operand convention _forward_tile expects."""
    return [w if w.ndim == 3 else w[:, None, :] for w in weights]


def _pad_ray_axis(x, gate, cond_lin, n: int, b: int, s: int, rays_per_tile: int):
    b_pad = -(-max(b, rays_per_tile) // rays_per_tile) * rays_per_tile
    n_pad = b_pad * s
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, b_pad - b), (0, 0)))
        gate = jnp.pad(gate, ((0, 0), (0, 0), (0, n_pad - n)))
        cond_lin = jnp.pad(cond_lin, ((0, 0), (0, b_pad - b), (0, 0)))
    return x, gate, cond_lin, b_pad, n_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_obj_mlp(x, gate, cond_lin, weights, config, s_per_ray: int, tile: int = 2048, interpret: bool = False):
    """All object MLPs in one grid: (rgb_acc [3, N], density_acc [1, N]).

    Args:
      x: [F, B, S] shared encoded sample PLANES — the coordinate-major
        encode's NATIVE layout and dtype, unflattened and uncast. Flattening
        [F, B, S] -> [F, N] in XLA forced a per-plane relayout copy (each
        [B, S] tile-dense plane rewritten as a flat [1, N] row — measured
        2.5 ms/step of copy_bitcast fusions at the flagship point); instead
        the kernel contracts each [F, S] ray-row chunk separately (static
        slices, layout-native) and the backward emits d(enc) in the same
        plane layout with no relayout or convert anywhere.
      gate: [N_obj, 1, N] 0/1 per-SAMPLE hit mask, pre-broadcast by XLA
        (4 MB bf16 at the flagship point — cheaper than any in-kernel
        ray->sample relayout; no gradient — the model stop-gradients it).
      cond_lin: [N_obj, B, W_c] per-ray precomputed condition contribution
        `viewdirs_enc @ head_0_kernel[net_width:]` per object.
      weights: stacked operand list (mlp_params_from_flax on the nn.vmap'd
        param tree: every leaf has a leading N_obj axis).
      config: MLPConfig (static).
      s_per_ray: samples per ray (static; tiles hold whole rays).
      tile: max samples per grid step (static; rounded to ray geometry).
      interpret: run in interpreter mode (CPU testing).

    Returns the hit-masked SUM over objects of each object MLP's raw outputs,
    feature-major — exactly `(hit * mlp_o(enc)).sum(objects)`.
    """
    return _obj_forward(x, gate, cond_lin, list(weights), config, s_per_ray, tile, interpret)


def _chunked_dot_x(x3, w):
    """Contract [F, R, S] plane-chunks with [F, W] weights -> [R*S, W].

    Each [F, S] ray-row slice is contracted separately and the results are
    concatenated along the sample (sublane) axis. Slicing + dot lowers on
    Mosaic (an in-kernel lane-concat to one flat [F, T] tile does NOT:
    "result/input offset mismatch on non-concat dimension"); the per-chunk
    page->sublane relayout rides the kernel instead of materializing a
    2.5 ms/step HBM relayout in XLA. The vjp emits d(x3) in the same plane
    layout."""
    chunks = [
        _dot_t(x3[:, r, :], w, jnp.bfloat16) for r in range(x3.shape[1])
    ]
    return jnp.concatenate(chunks, axis=0)


def _obj_forward(x, gate, cond_lin, weights, config, s_per_ray, tile, interpret):
    orig_weights = weights
    weights = _as_3d(weights)
    n_obj = gate.shape[0]
    in_dim, b = x.shape[0], x.shape[1]
    n = b * s_per_ray
    w_c = cond_lin.shape[-1]
    rays_pt, tile = _tile_geometry(s_per_ray, tile)
    x, gate, cond_lin, b_pad, n_pad = _pad_ray_axis(
        x, gate, cond_lin, n, b, s_per_ray, rays_pt
    )
    grid = (n_pad // tile, n_obj)

    def kernel(x_ref, gate_ref, cond_ref, *refs):
        w_refs, (rgb_ref, den_ref) = refs[:-2], refs[-2:]
        o = pl.program_id(1)
        ws = [w[0] for w in w_refs]
        cond_b = _expand_rows(cond_ref[0], s_per_ray)
        g_fm = gate_ref[0]  # [1, T] per-sample gate row
        rgb, den = _forward_tile(
            config,
            in_dim,
            x_ref[:],
            cond_b,
            ws,
            out_fm=True,
            cond_preapplied=True,
            dot_x_fn=_chunked_dot_x,
        )

        @pl.when(o == 0)
        def _():
            rgb_ref[:] = g_fm * rgb
            den_ref[:] = g_fm * den

        @pl.when(o > 0)
        def _():
            rgb_ref[:] += g_fm * rgb
            den_ref[:] += g_fm * den

    w_specs = [
        pl.BlockSpec((1,) + w.shape[1:], lambda i, o, nd=w.ndim: (o,) + (0,) * (nd - 1))
        for w in weights
    ]
    rgb, density = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((in_dim, rays_pt, s_per_ray), lambda i, o: (0, i, 0)),
            pl.BlockSpec((1, 1, tile), lambda i, o: (o, 0, i)),
            pl.BlockSpec((1, rays_pt, w_c), lambda i, o: (o, i, 0)),
            *w_specs,
        ],
        out_specs=[
            pl.BlockSpec((config.num_rgb_channels, tile), lambda i, o: (0, i)),
            pl.BlockSpec((config.num_density_channels, tile), lambda i, o: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((config.num_rgb_channels, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((config.num_density_channels, n_pad), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(x, gate, cond_lin, *weights)
    return rgb[:, :n], density[:, :n]


def _obj_fwd(x, gate, cond_lin, weights, config, s_per_ray, tile, interpret):
    out = _obj_forward(x, gate, cond_lin, list(weights), config, s_per_ray, tile, interpret)
    return out, (x, gate, cond_lin, list(weights))


def _obj_bwd(config, s_per_ray, tile, interpret, residuals, grads):
    x, gate, cond_lin, weights = residuals
    orig_weights, weights = weights, _as_3d(weights)
    g_rgb, g_den = grads
    n_obj = gate.shape[0]
    in_dim, b = x.shape[0], x.shape[1]
    n = b * s_per_ray
    w_c = cond_lin.shape[-1]
    # Backward tiles hold recomputed activations + vjp residuals in VMEM;
    # halve the sample tile like the background kernel (fused_mlp.py).
    rays_pt, tile = _tile_geometry(s_per_ray, max(tile // 2, 256))
    x, gate_p, cond_p, b_pad, n_pad = _pad_ray_axis(
        x, gate, cond_lin, n, b, s_per_ray, rays_pt
    )
    if n_pad != n:
        g_rgb = jnp.pad(g_rgb, ((0, 0), (0, n_pad - n)))
        g_den = jnp.pad(g_den, ((0, 0), (0, n_pad - n)))
    grid = (n_pad // tile, n_obj)
    n_w = len(weights)

    def kernel(x_ref, gate_ref, cond_ref, grgb_ref, gden_ref, *refs):
        w_refs = refs[:n_w]
        dx_ref, dcond_ref = refs[n_w], refs[n_w + 1]
        dw_refs = refs[n_w + 2 :]
        o = pl.program_id(1)
        ws = [w[0] for w in w_refs]
        g_fm = gate_ref[0]  # [1, T] per-sample gate row

        def fwd(x_t, cond_rows, ws_):
            cond_b = _expand_rows(cond_rows, s_per_ray)
            rgb, den = _forward_tile(
                config,
                in_dim,
                x_t,
                cond_b,
                ws_,
                act_dtype=jnp.bfloat16,
                out_fm=True,
                cond_preapplied=True,
                dot_x_fn=_chunked_dot_x,
            )
            return g_fm * rgb, g_fm * den

        _, vjp = jax.vjp(fwd, x_ref[:], cond_ref[0], ws)
        dx, dcond, dws = vjp((grgb_ref[:], gden_ref[:]))
        dcond_ref[0] = dcond.astype(dcond_ref.dtype)

        @pl.when(o == 0)
        def _():
            dx_ref[:] = dx

        @pl.when(o > 0)
        def _():
            dx_ref[:] += dx

        @pl.when((pl.program_id(0) == 0) & (o == 0))
        def _():
            for r in dw_refs:
                r[:] = jnp.zeros_like(r)

        for k in range(n_obj):

            @pl.when(o == k)
            def _(k=k):
                for r, dw in zip(dw_refs, dws):
                    r[k] += dw.astype(jnp.float32).reshape(r.shape[1:])

    w_specs = [
        pl.BlockSpec((1,) + w.shape[1:], lambda i, o, nd=w.ndim: (o,) + (0,) * (nd - 1))
        for w in weights
    ]
    # Stacked weight-grad blocks: FULL arrays with constant index maps — they
    # stay VMEM-resident across the whole sequential grid and flush once.
    dw_specs = [
        pl.BlockSpec(w.shape, lambda i, o, nd=w.ndim: (0,) * nd) for w in weights
    ]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((in_dim, rays_pt, s_per_ray), lambda i, o: (0, i, 0)),
            pl.BlockSpec((1, 1, tile), lambda i, o: (o, 0, i)),
            pl.BlockSpec((1, rays_pt, w_c), lambda i, o: (o, i, 0)),
            pl.BlockSpec((config.num_rgb_channels, tile), lambda i, o: (0, i)),
            pl.BlockSpec((config.num_density_channels, tile), lambda i, o: (0, i)),
            *w_specs,
        ],
        out_specs=[
            pl.BlockSpec((in_dim, rays_pt, s_per_ray), lambda i, o: (0, i, 0)),
            pl.BlockSpec((1, rays_pt, w_c), lambda i, o: (o, i, 0)),
            *dw_specs,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((in_dim, b_pad, s_per_ray), x.dtype),
            jax.ShapeDtypeStruct((n_obj, b_pad, w_c), cond_lin.dtype),
            *[jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights],
        ],
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
    )(x, gate_p, cond_p, g_rgb, g_den, *weights)
    dx, dcond_lin, *dweights = outs
    dweights = [dw.reshape(w.shape) for dw, w in zip(dweights, orig_weights)]
    return (
        dx[:, :b],  # [F, B, S] — the encode's plane layout, no relayout
        jnp.zeros_like(gate),  # hit mask is stop-gradiented by the model
        dcond_lin[:, :b].astype(cond_lin.dtype),
        dweights,
    )


fused_obj_mlp.defvjp(_obj_fwd, _obj_bwd)


def fused_obj_vmem_ok(params, config, budget_bytes: int = 32 * 1024 * 1024) -> bool:
    """Scaling-envelope guard for the objects-in-grid backward.

    The backward keeps the FULL stacked weight-grad blocks VMEM-resident
    across the whole sequential grid (constant index maps; they flush once
    at the end) — ~0.65 MB fp32 per 128-wide object, so the flagship
    N_obj=2 uses ~1.3 MB of the kernel's 96 MB limit. The reference
    supports arbitrary object counts (obbpose_model.py:174-201), so above
    this budget the model must fall back to the vmapped per-object kernels
    (models/mipnerf.py gates `use_fused_obj` on this predicate) instead of
    failing Mosaic VMEM allocation at compile time. 32 MB leaves the other
    ~64 MB for the recomputed activations + vjp residuals of a 1024-sample
    tile; it admits ~48 stacked 128-wide object MLPs.
    """
    del config  # the dw stack mirrors the param tree leaf-for-leaf
    dw_bytes = sum(
        4 * math.prod(leaf.shape) for leaf in jax.tree.leaves(params)
    )  # fp32 stacked weight-grad blocks, one per param leaf
    return dw_bytes <= budget_bytes


def obj_mlps_apply(
    params,
    config,
    enc_fm,
    viewdirs_enc,
    hit,
    compute_dtype,
    tile: int = 2048,
    interpret: bool = False,
):
    """Apply every object MLP through the objects-in-grid kernel.

    Args:
      params: the nn.vmap'd NerfMLP param tree (leaves stacked [N_obj, ...]) —
        models/mipnerf.py pulls it from the parent scope so the tree layout
        (and checkpoints) stay identical to the vmapped path.
      config: MLPConfig of the object MLPs.
      enc_fm: [F, B, S] feature-major shared windowed-IPE features.
      viewdirs_enc: [B, F_c] per-ray encoded view directions.
      hit: [B, N_obj] 0/1 ray-box hit mask (already stop-gradiented).
      compute_dtype: kernel matmul dtype (bf16 on the perf path).

    Returns (obj_rgbs [3, B, S], obj_densities [1, B, S]): the hit-masked sum
    over objects — what the scene graph adds to the background's raw outputs
    (reference obbpose_model.py:174-205).
    """
    f, bsz, s = enc_fm.shape
    weights = mlp_params_from_flax(params, config)
    hk = params["head_0"]["kernel"]  # [N_obj, net_width + F_c, W_c]
    tails = hk[:, config.net_width :, :]
    # Per-ray condition contribution, once per ray per object (bf16 inputs,
    # fp32 accumulation — the same recipe as the in-kernel _dot it replaces).
    cond_lin = jnp.einsum(
        "bc,ocw->obw",
        viewdirs_enc.astype(compute_dtype),
        tails.astype(compute_dtype),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST
        if jnp.dtype(compute_dtype) == jnp.float32
        else None,
    )
    # Per-sample gate row, broadcast by XLA: [N_obj, 1, B*S] in compute dtype
    # (~4 MB at the flagship point — any in-kernel ray->sample relayout of the
    # gate measured slower than just streaming this).
    n_obj = hit.shape[-1]
    gate = jnp.broadcast_to(
        hit.T[:, None, :, None].astype(compute_dtype), (n_obj, 1, bsz, s)
    ).reshape(n_obj, 1, bsz * s)
    # enc_fm goes in UNTOUCHED — its [F, B, S] plane layout and dtype are the
    # kernel's input contract (no XLA-side flatten/cast relayout).
    rgb, den = fused_obj_mlp(
        enc_fm, gate, cond_lin.astype(compute_dtype), weights, config, s, tile, interpret
    )
    return (
        rgb.reshape(config.num_rgb_channels, bsz, s).astype(jnp.float32),
        den.reshape(config.num_density_channels, bsz, s).astype(jnp.float32),
    )
