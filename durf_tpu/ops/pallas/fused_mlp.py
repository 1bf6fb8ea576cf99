"""Fused NeRF-MLP Pallas kernel: the whole trunk + heads in one VMEM-resident pass.

Why: at the flagship operating point (4096 rays x 256 samples) every trunk
layer's [N, 256] activation is ~0.5 GB in fp32 — the XLA graph round-trips it
to HBM between matmuls, making the MLP bandwidth-bound. This kernel tiles the
sample axis, keeps the tile's activations in VMEM through all layers (weights
are VMEM-resident too: ~1.2 MB in bf16), and touches HBM only for the
[N, F_in] inputs and [N, 4] outputs — the speed-of-light traffic.

The skip connection (reference obbpose_model.py:329-333 concatenates the
input after every `skip_layer`-th activation) is realized WITHOUT concat by
splitting the following layer's weight matrix: concat(h, x) @ W ==
h @ W[:width] + x @ W[width:]. Same trick for the viewdir-conditioned head.

Matmuls run on the MXU in bfloat16 with fp32 accumulation; activations stay
fp32 in VMEM. A custom VJP recomputes the forward per tile in the backward
kernel (activations are never materialized to HBM in either pass) and
accumulates fp32 weight gradients in VMEM scratch across the sequential grid.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot_impl(a, w, dtype):
    return jax.lax.dot_general(
        a.astype(dtype),
        w.astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dot(a, w, dtype=jnp.bfloat16):
    """MXU matmul with fp32 accumulation (inputs cast to `dtype`).

    Custom VJP: the fp32-accumulated forward makes the incoming cotangent
    fp32, and without intervention XLA runs every transposed matmul in fp32 —
    measured as the backward costing ~4x the forward. The VJP casts the
    cotangent to `dtype` so the backward matmuls are full-speed MXU ops while
    still ACCUMULATING in fp32 (the mixed-precision recipe)."""
    return _dot_impl(a, w, dtype)


def _dot_fwd(a, w, dtype):
    return _dot_impl(a, w, dtype), (a, w)


def _dot_bwd(dtype, res, g):
    a, w = res
    # CPU's dot thunk lacks bf16xbf16->f32 for these layouts; only TPU gets
    # the low-precision backward inputs (CPU is the test backend anyway).
    if jax.default_backend() == "cpu":
        dtype = jnp.float32
    g16 = g.astype(dtype)
    da = jax.lax.dot_general(
        g16,
        w.astype(dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),  # g @ w^T
        preferred_element_type=jnp.float32,
    ).astype(a.dtype)
    dw = jax.lax.dot_general(
        a.astype(dtype),
        g16,
        dimension_numbers=(((0,), (0,)), ((), ())),  # a^T @ g
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    return da, dw


_dot.defvjp(_dot_fwd, _dot_bwd)


def _dot_t_impl(a_t, w, dtype):
    # a_t [F, T] (feature-major), w [F, W] -> [T, W]; the MXU takes either
    # operand order, so the transposed-lhs contraction costs the same.
    return jax.lax.dot_general(
        a_t.astype(dtype),
        w.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dot_t(a_t, w, dtype=jnp.bfloat16):
    """Feature-major-lhs MXU matmul with fp32 accumulation (see _dot)."""
    return _dot_t_impl(a_t, w, dtype)


def _dot_t_fwd(a_t, w, dtype):
    return _dot_t_impl(a_t, w, dtype), (a_t, w)


def _dot_t_bwd(dtype, res, g):
    a_t, w = res
    if jax.default_backend() == "cpu":
        dtype = jnp.float32
    g16 = g.astype(dtype)
    da_t = jax.lax.dot_general(
        w.astype(dtype),
        g16,
        dimension_numbers=(((1,), (1,)), ((), ())),  # w @ g^T -> [F, T]
        preferred_element_type=jnp.float32,
    ).astype(a_t.dtype)
    dw = jax.lax.dot_general(
        a_t.astype(dtype),
        g16,
        dimension_numbers=(((1,), (0,)), ((), ())),  # a_t @ g -> [F, W]
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    return da_t, dw


_dot_t.defvjp(_dot_t_fwd, _dot_t_bwd)


def _dot_ot_impl(a, w, dtype):
    # (a @ w)^T computed directly: a [T, K], w [K, W] -> [W, T]. Emitting the
    # head outputs feature-major avoids any in-kernel transpose.
    return jax.lax.dot_general(
        w.astype(dtype),
        a.astype(dtype),
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dot_ot(a, w, dtype=jnp.bfloat16):
    """Transposed-OUTPUT MXU matmul with fp32 accumulation (see _dot)."""
    return _dot_ot_impl(a, w, dtype)


def _dot_ot_fwd(a, w, dtype):
    return _dot_ot_impl(a, w, dtype), (a, w)


def _dot_ot_bwd(dtype, res, g_t):
    a, w = res
    if jax.default_backend() == "cpu":
        dtype = jnp.float32
    g16 = g_t.astype(dtype)  # [W_out, T]
    da = jax.lax.dot_general(
        g16,
        w.astype(dtype),
        dimension_numbers=(((0,), (1,)), ((), ())),  # g_t^T @ w^T -> [T, K]
        preferred_element_type=jnp.float32,
    ).astype(a.dtype)
    dw = jax.lax.dot_general(
        a.astype(dtype),
        g16,
        dimension_numbers=(((0,), (1,)), ((), ())),  # a^T @ g_t^T -> [K, W]
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    return da, dw


_dot_ot.defvjp(_dot_ot_fwd, _dot_ot_bwd)


def _layer_dims(config, in_dim: int) -> list:
    """Input dim of every trunk layer (skip concat folded in)."""
    dims = []
    for i in range(config.net_depth):
        if i == 0:
            dims.append(in_dim)
        elif (i - 1) % config.skip_layer == 0 and (i - 1) > 0:
            dims.append(config.net_width + in_dim)
        else:
            dims.append(config.net_width)
    return dims


def mlp_params_from_flax(params: Dict[str, Any], config) -> list:
    """Flatten a flax NerfMLP param dict into the kernel's operand list.

    Order: per trunk layer (kernel, bias), then density (k, b), bottleneck
    (k, b), per head layer (k, b), rgb (k, b). Kernels whose layer consumes a
    skip concat stay full-size; the kernel splits them by row internally.
    """
    ops = []
    for i in range(config.net_depth):
        p = params[f"trunk_{i}"]
        ops += [p["kernel"], p["bias"]]
    ops += [params["density_head"]["kernel"], params["density_head"]["bias"]]
    ops += [params["bottleneck"]["kernel"], params["bottleneck"]["bias"]]
    for i in range(config.net_depth_condition):
        p = params[f"head_{i}"]
        ops += [p["kernel"], p["bias"]]
    ops += [params["rgb_head"]["kernel"], params["rgb_head"]["bias"]]
    return ops


def _forward_tile(config, in_dim: int, x, cond, weights, has_condition: bool = True, dtype=jnp.bfloat16, act_dtype=None, x_fm: bool = False, out_fm: bool = False, cond_preapplied: bool = False, dot_x_fn=None):
    """Run the full MLP on one [T, in_dim] tile (pure jnp; used inside the
    kernel so it lowers to MXU ops on VMEM values).

    act_dtype: optional storage dtype for post-relu activations. Every
    consumer matmul casts to `dtype` anyway, so storing relu outputs in bf16
    is numerically free on the forward; in the backward kernel it halves the
    jax.vjp residual footprint in VMEM, which is what bounds the tile size.
    x_fm: x arrives FEATURE-MAJOR [in_dim, T] (the coordinate-major encode's
    native layout); the x-consuming matmuls contract its leading axis.
    out_fm: emit (raw_rgb [3, T], raw_density [1, T]) feature-major — the
    head matmuls produce the transposed outputs directly (_dot_ot), so the
    compositing consumes dense [C, N] planes with no transpose anywhere.
    cond_preapplied: `cond` is already cond_raw @ head_0_kernel[width:] (the
    per-RAY condition matmul hoisted out of the kernel — it depends only on
    the ray, not the sample, so doing it per sample wastes S× the work and
    the [N, F_c] per-sample traffic; docs/DESIGN.md round-3). The head_0
    matmul then uses only the first `net_width` kernel rows."""
    it = iter(weights)
    nxt = lambda: next(it)
    if dot_x_fn is not None:
        # Caller-supplied x contraction (e.g. the objects-in-grid kernel's
        # chunked plane dot: x stays in the encode's [F, R, S] plane layout
        # and each [F, S] ray-row chunk is contracted separately — static
        # slices only, no relayout of x anywhere).
        dot_x = dot_x_fn
    else:
        dot_x = (lambda a, w: _dot_t(a, w, dtype)) if x_fm else (lambda a, w: _dot(a, w, dtype))
    h = None
    for i in range(config.net_depth):
        k, b = nxt(), nxt()
        if i == 0:
            h = dot_x(x, k) + b
        elif (i - 1) % config.skip_layer == 0 and (i - 1) > 0:
            # h is conceptually concat(prev_h, x): split the weight rows.
            h = (
                _dot(h, k[: config.net_width], dtype)
                + dot_x(x, k[config.net_width :])
                + b
            )
        else:
            h = _dot(h, k, dtype) + b
        h = jax.nn.relu(h)
        if act_dtype is not None:
            h = h.astype(act_dtype)
        # (the concat itself is virtual: we keep h and x separate)
    dk, db = nxt(), nxt()
    if out_fm:
        raw_density = _dot_ot(h, dk, dtype) + (db.T if db.ndim == 2 else db[:, None])
    else:
        raw_density = _dot(h, dk, dtype) + db
    g = h
    if has_condition:
        bk, bb = nxt(), nxt()
        g = _dot(h, bk, dtype) + bb
        for i in range(config.net_depth_condition):
            hk, hb = nxt(), nxt()
            if i == 0:
                g = (
                    _dot(g, hk[: config.net_width], dtype)
                    + (cond if cond_preapplied else _dot(cond, hk[config.net_width :], dtype))
                    + hb
                )
            else:
                g = _dot(g, hk, dtype) + hb
            g = jax.nn.relu(g)
            if act_dtype is not None:
                g = g.astype(act_dtype)
    rk, rb = nxt(), nxt()
    if out_fm:
        raw_rgb = _dot_ot(g, rk, dtype) + (rb.T if rb.ndim == 2 else rb[:, None])
    else:
        raw_rgb = _dot(g, rk, dtype) + rb
    return raw_rgb, raw_density


def mlp_reference_forward(config, x, cond, weights, has_condition: bool = True, dtype=jnp.float32, x_fm: bool = False, out_fm: bool = False):
    """The XLA (non-Pallas) execution path: same split-matmul math on the
    full [N, F] batch, with a configurable compute dtype. x_fm: x is
    feature-major [F, N] (consumed via transposed-lhs dots, no transpose);
    out_fm: outputs feature-major [C, N]."""
    in_dim = x.shape[0] if x_fm else x.shape[-1]
    return _forward_tile(config, in_dim, x, cond, weights, has_condition, dtype, x_fm=x_fm, out_fm=out_fm)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_nerf_mlp(x, cond, weights, config, tile: int = 512, interpret: bool = False, x_fm: bool = False, out_fm: bool = False):
    """Fused MLP forward: (raw_rgb [N, 3], raw_density [N, 1]).

    Args:
      x: [N, F_in] encoded samples (N = rays * samples, any N) — or
        FEATURE-MAJOR [F_in, N] with x_fm=True (the coordinate-major
        encode's native layout; consumed via transposed-lhs dots, so the
        row-major features are never assembled).
      cond: [N, F_c] per-sample encoded view directions.
      weights: flat operand list from mlp_params_from_flax.
      config: MLPConfig (static).
      tile: samples per grid step (static; multiple of 8).
      interpret: run in interpreter mode (CPU testing).
      x_fm: x is feature-major (static).
      out_fm: outputs feature-major ([3, N], [1, N]) — the compositing side
        consumes dense channel planes (static).
    """
    return _fused_forward(x, cond, list(weights), config, tile, interpret, x_fm=x_fm, out_fm=out_fm)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_nerf_mlp_gated(x, gate, fill, cond, weights, config, tile: int = 512, interpret: bool = False):
    """Fused MLP whose input is gated IN-TILE: x_eff = gate*x + (1-gate)*fill.

    The dynamic scene graph evaluates each object MLP on masked samples
    (mipnerf.py object branch): for a 0/1 hit mask the masked encode equals
    `gate * enc + (1 - gate) * c0` with a constant zero-sample row c0.
    Blending inside the kernel means the [N_obj, N, F] blended features are
    NEVER materialized in HBM — the (vmapped) kernel reads the SHARED [N, F]
    features plus a [N, 1] gate column per object.

    Args:
      x: [N, F_in] shared encoded samples.
      gate: [N, 1] 0/1 mask column.
      fill: [1, F_in] constant row used where gate == 0.
      cond, weights, config, tile, interpret: as fused_nerf_mlp.
    """
    return _fused_forward(
        x, cond, list(weights), config, tile, interpret, gate=gate, fill=fill
    )


def _as_2d(weights):
    """Biases as [1, W]: keeps every kernel operand 2-D so blocks stay legal
    under vmap's extra leading axis (Mosaic requires the last two block dims
    divisible by (8, 128) or equal to the array dims)."""
    return [w if w.ndim == 2 else w[None] for w in weights]


def _fused_forward(x, cond, weights, config, tile, interpret, gate=None, fill=None, x_fm=False, out_fm=False):
    weights = _as_2d(weights)
    in_dim, n = x.shape if x_fm else x.shape[::-1]
    n_pad = _round_up(max(n, tile), tile)
    gated = gate is not None
    assert not (gated and x_fm), "gated kernel is row-major only"
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n)) if x_fm else ((0, n_pad - n), (0, 0)))
        cond = jnp.pad(cond, ((0, n_pad - n), (0, 0)))
        if gated:
            gate = jnp.pad(gate, ((0, n_pad - n), (0, 0)))
    grid = n_pad // tile

    def kernel(x_ref, *refs):
        if gated:
            gate_ref, fill_ref, cond_ref = refs[0], refs[1], refs[2]
            refs = refs[3:]
        else:
            cond_ref = refs[0]
            refs = refs[1:]
        w_refs, (rgb_ref, den_ref) = refs[:-2], refs[-2:]
        x_t = x_ref[:]
        if gated:
            g = gate_ref[:]
            x_t = (g * x_t + (1.0 - g) * fill_ref[:]).astype(x_t.dtype)
        rgb, den = _forward_tile(
            config, in_dim, x_t, cond_ref[:], [w[:] for w in w_refs], x_fm=x_fm, out_fm=out_fm
        )
        rgb_ref[:] = rgb
        den_ref[:] = den

    # Weights use constant index maps: fetched into VMEM once, reused by every
    # grid step (small enough: ~1.2 MB in bf16 for the 8x256 trunk).
    w_specs = [pl.BlockSpec(w.shape, lambda i: (0, 0)) for w in weights]
    gate_specs = (
        [
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec(fill.shape, lambda i: (0, 0)),
        ]
        if gated
        else []
    )
    gate_args = (gate, fill) if gated else ()

    rgb, density = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((in_dim, tile), lambda i: (0, i))
            if x_fm
            else pl.BlockSpec((tile, in_dim), lambda i: (i, 0)),
            *gate_specs,
            pl.BlockSpec((tile, cond.shape[-1]), lambda i: (i, 0)),
            *w_specs,
        ],
        out_specs=[
            pl.BlockSpec((config.num_rgb_channels, tile), lambda i: (0, i))
            if out_fm
            else pl.BlockSpec((tile, config.num_rgb_channels), lambda i: (i, 0)),
            pl.BlockSpec((config.num_density_channels, tile), lambda i: (0, i))
            if out_fm
            else pl.BlockSpec((tile, config.num_density_channels), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(
                (config.num_rgb_channels, n_pad) if out_fm else (n_pad, config.num_rgb_channels),
                jnp.float32,
            ),
            jax.ShapeDtypeStruct(
                (config.num_density_channels, n_pad)
                if out_fm
                else (n_pad, config.num_density_channels),
                jnp.float32,
            ),
        ],
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(x, *gate_args, cond, *weights)
    if out_fm:
        return rgb[:, :n], density[:, :n]
    return rgb[:n], density[:n]


def _fused_fwd(x, cond, weights, config, tile, interpret, x_fm=False, out_fm=False):
    out = _fused_forward(x, cond, list(weights), config, tile, interpret, x_fm=x_fm, out_fm=out_fm)
    return out, (x, cond, list(weights))


def _fused_bwd(config, tile, interpret, x_fm, out_fm, residuals, grads):
    """Recompute-in-tile backward kernel.

    Per grid step: re-run the tile's forward on VMEM values, jax.vjp it in
    place (the transposed matmuls stay on the MXU, activations never leave
    VMEM), write the [T, F] input/condition grads, and ACCUMULATE the fp32
    weight grads into output blocks with constant index maps — the block
    stays VMEM-resident across the sequential grid and flushes once.
    """
    x, cond, weights = residuals
    return _fused_bwd_impl(
        config, tile, interpret, x, cond, weights, grads, x_fm=x_fm, out_fm=out_fm
    )


def _fused_bwd_impl(config, tile, interpret, x, cond, weights, grads, gate=None, fill=None, x_fm=False, out_fm=False):
    gated = gate is not None
    assert not (gated and x_fm), "gated kernel is row-major only"
    weights_2d = _as_2d(weights)
    g_rgb, g_den = grads
    in_dim, n = x.shape if x_fm else x.shape[::-1]
    # The backward tile holds the recomputed activations AND the vjp
    # residuals in VMEM. Residuals are stashed in bf16 (act_dtype below —
    # numerically free: every consumer matmul casts to bf16 anyway): fp32
    # tile 1024 measured 22.7 MB, bf16 18.1 MB. That still exceeds the
    # DEFAULT 16 MB scoped-vmem budget, so the pallas_call raises
    # vmem_limit_bytes (v5e has 128 MB of VMEM; the default budget just
    # reserves headroom for double-buffering, which this kernel barely
    # needs — its streamed blocks are the small [T, F] edges).
    tile = min(max(tile // 2, 256), 1024)
    n_pad = _round_up(max(n, tile), tile)
    if n_pad != n:
        pad = ((0, n_pad - n), (0, 0))
        pad_fm = ((0, 0), (0, n_pad - n))
        x = jnp.pad(x, pad_fm if x_fm else pad)
        cond = jnp.pad(cond, pad)
        g_rgb = jnp.pad(g_rgb, pad_fm if out_fm else pad)
        g_den = jnp.pad(g_den, pad_fm if out_fm else pad)
        if gated:
            gate = jnp.pad(gate, pad)
    grid = n_pad // tile
    n_w = len(weights)

    def kernel(x_ref, *refs):
        if gated:
            gate_ref, fill_ref = refs[0], refs[1]
            refs = refs[2:]
        cond_ref, grgb_ref, gden_ref = refs[0], refs[1], refs[2]
        refs = refs[3:]
        w_refs = refs[:n_w]
        refs = refs[n_w:]
        dx_ref = refs[0]
        if gated:
            dgate_ref, dfill_ref = refs[1], refs[2]
            refs = refs[3:]
        else:
            refs = refs[1:]
        dcond_ref = refs[0]
        dw_refs = refs[1:]

        if gated:

            def fwd(x_, g_, fill_, c_, ws):
                xe = (g_ * x_ + (1.0 - g_) * fill_).astype(x_.dtype)
                return _forward_tile(
                    config, in_dim, xe, c_, ws, act_dtype=jnp.bfloat16
                )

            _, vjp = jax.vjp(
                fwd, x_ref[:], gate_ref[:], fill_ref[:], cond_ref[:], [w[:] for w in w_refs]
            )
            dx, dgate, dfill, dcond, dws = vjp((grgb_ref[:], gden_ref[:]))
            dgate_ref[:] = dgate
        else:

            def fwd(x_, c_, ws):
                return _forward_tile(
                    config, in_dim, x_, c_, ws, act_dtype=jnp.bfloat16, x_fm=x_fm, out_fm=out_fm
                )

            _, vjp = jax.vjp(fwd, x_ref[:], cond_ref[:], [w[:] for w in w_refs])
            dx, dcond, dws = vjp((grgb_ref[:], gden_ref[:]))
        dx_ref[:] = dx
        dcond_ref[:] = dcond

        @pl.when(pl.program_id(0) == 0)
        def _():
            if gated:
                dfill_ref[:] = jnp.zeros_like(dfill_ref)
            for r in dw_refs:
                r[:] = jnp.zeros_like(r)

        if gated:
            dfill_ref[:] += dfill.astype(jnp.float32)
        for r, dw in zip(dw_refs, dws):
            r[:] += dw.astype(jnp.float32)

    # Biases are 1-D; give their grad blocks a leading unit dim? No — Mosaic
    # handles 1-D lane-aligned blocks; keep native shapes.
    w_specs = [pl.BlockSpec(w.shape, lambda i: (0, 0)) for w in weights_2d]
    dw_specs = list(w_specs)
    gate_in_specs = (
        [
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec(fill.shape, lambda i: (0, 0)),
        ]
        if gated
        else []
    )
    gate_out_specs = (
        [
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec(fill.shape, lambda i: (0, 0)),
        ]
        if gated
        else []
    )
    gate_args = (gate, fill) if gated else ()
    gate_out_shapes = (
        [
            jax.ShapeDtypeStruct((n_pad, 1), gate.dtype),
            jax.ShapeDtypeStruct(fill.shape, jnp.float32),
        ]
        if gated
        else []
    )

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((in_dim, tile), lambda i: (0, i))
            if x_fm
            else pl.BlockSpec((tile, in_dim), lambda i: (i, 0)),
            *gate_in_specs,
            pl.BlockSpec((tile, cond.shape[-1]), lambda i: (i, 0)),
            pl.BlockSpec((g_rgb.shape[0], tile), lambda i: (0, i))
            if out_fm
            else pl.BlockSpec((tile, g_rgb.shape[-1]), lambda i: (i, 0)),
            pl.BlockSpec((g_den.shape[0], tile), lambda i: (0, i))
            if out_fm
            else pl.BlockSpec((tile, g_den.shape[-1]), lambda i: (i, 0)),
            *w_specs,
        ],
        out_specs=[
            pl.BlockSpec((in_dim, tile), lambda i: (0, i))
            if x_fm
            else pl.BlockSpec((tile, in_dim), lambda i: (i, 0)),
            *gate_out_specs,
            pl.BlockSpec((tile, cond.shape[-1]), lambda i: (i, 0)),
            *dw_specs,
        ],
        out_shape=[
            # Input cotangents carry the input dtypes (custom_vjp contract;
            # x/cond may arrive in bf16 from the encode fusion).
            jax.ShapeDtypeStruct((in_dim, n_pad) if x_fm else (n_pad, in_dim), x.dtype),
            *gate_out_shapes,
            jax.ShapeDtypeStruct((n_pad, cond.shape[-1]), cond.dtype),
            *[jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights_2d],
        ],
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(x, *gate_args, cond, g_rgb, g_den, *weights_2d)
    if gated:
        dx, dgate, dfill, dcond, *dweights = outs
    else:
        dx, dcond, *dweights = outs
    # Bias grads come back [1, W]; match the original [W] structure.
    dweights = [
        dw if w.ndim == 2 else dw[0] for dw, w in zip(dweights, weights)
    ]
    dx = dx[:, :n] if x_fm else dx[:n]
    if gated:
        return dx, dgate[:n], dfill.astype(fill.dtype), dcond[:n], dweights
    return dx, dcond[:n], dweights


fused_nerf_mlp.defvjp(_fused_fwd, _fused_bwd)


def _fused_gated_fwd(x, gate, fill, cond, weights, config, tile, interpret):
    out = _fused_forward(
        x, cond, list(weights), config, tile, interpret, gate=gate, fill=fill
    )
    return out, (x, gate, fill, cond, list(weights))


def _fused_gated_bwd(config, tile, interpret, residuals, grads):
    x, gate, fill, cond, weights = residuals
    return _fused_bwd_impl(
        config, tile, interpret, x, cond, weights, grads, gate=gate, fill=fill
    )


fused_nerf_mlp_gated.defvjp(_fused_gated_fwd, _fused_gated_bwd)


def _forward_tile_ref_semantics(config, in_dim, x, cond, weights):
    """Same math with REAL concats — ground truth for the kernel's split-
    matmul trick (used only by tests)."""
    it = iter(weights)
    nxt = lambda: next(it)
    h = x
    inputs = x
    for i in range(config.net_depth):
        k, b = nxt(), nxt()
        h = jax.nn.relu(_dot(h, k) + b)
        if i % config.skip_layer == 0 and i > 0:
            h = jnp.concatenate([h, inputs], axis=-1)
    dk, db = nxt(), nxt()
    raw_density = _dot(h, dk) + db
    bk, bb = nxt(), nxt()
    g = jnp.concatenate([_dot(h, bk) + bb, cond], axis=-1)
    for i in range(config.net_depth_condition):
        hk, hb = nxt(), nxt()
        g = jax.nn.relu(_dot(g, hk) + hb)
    rk, rb = nxt(), nxt()
    raw_rgb = _dot(g, rk) + rb
    return raw_rgb, raw_density
