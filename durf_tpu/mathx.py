"""Numerics kernel: precision-safe primitives, image metrics, schedules, PDF sampling.

Behavioral parity targets (reference: /root/reference/internal/math.py):
  - high-precision matmul (math.py:22-24)
  - differentiable-safe norm (math.py:27-32)
  - TPU-safe trig via range reduction mod 100*pi (math.py:35-46)
  - PSNR/MSE conversions (math.py:49-56)
  - SSIM modeled after tf.image.ssim (math.py:66-137)
  - sRGB conversions (math.py:140-153)
  - log-lerp LR decay with sine warmup (math.py:156-190)
  - BARF frequency-annealing alpha schedule (math.py:193-219)
  - inverse-CDF piecewise-constant PDF sampling (math.py:222-284)

All functions here are pure and shape-polymorphic; everything else in the
framework builds on them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy as jsp


def matmul_hp(a: jax.Array, b: jax.Array) -> jax.Array:
    """Matmul pinned to HIGHEST precision.

    On TPU, plain jnp.matmul may run the MXU in bf16; encoding/covariance math
    needs full fp32 (reference math.py:22-24).
    """
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def safe_norm(x: jax.Array, axis: int = -1, keepdims: bool = True) -> jax.Array:
    """L2 norm that is differentiable at 0 (clamps the squared norm at 1e-12).

    Reference math.py:27-32. Intended for the mip360 contraction where inputs
    near zero are possible but uninteresting.
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, 1e-12))


_TRIG_PERIOD = 100.0 * jnp.pi


def _safe_trig(x: jax.Array, fn) -> jax.Array:
    # Range-reduce very large arguments; TPU transcendentals NaN out for
    # |x| >~ 1e8 (reference math.py:35-46).
    return fn(jnp.where(jnp.abs(x) < _TRIG_PERIOD, x, x % _TRIG_PERIOD))


def safe_sin(x: jax.Array) -> jax.Array:
    """sin() with TPU-safe range reduction."""
    return _safe_trig(x, jnp.sin)


def safe_cos(x: jax.Array) -> jax.Array:
    """cos() with TPU-safe range reduction."""
    return _safe_trig(x, jnp.cos)


def mse_to_psnr(mse: jax.Array) -> jax.Array:
    """PSNR assuming max pixel value 1 (reference math.py:49-51)."""
    return -10.0 / jnp.log(10.0) * jnp.log(mse)


def psnr_to_mse(psnr: jax.Array) -> jax.Array:
    """Inverse of mse_to_psnr (reference math.py:54-56)."""
    return jnp.exp(-0.1 * jnp.log(10.0) * psnr)


def compute_avg_error(psnr: jax.Array, ssim: jax.Array, lpips: jax.Array) -> jax.Array:
    """Geometric mean of MSE, sqrt(1-SSIM) and LPIPS (reference math.py:59-63)."""
    mse = psnr_to_mse(psnr)
    dssim = jnp.sqrt(1 - ssim)
    return jnp.exp(jnp.mean(jnp.log(jnp.array([mse, dssim, lpips]))))


def linear_to_srgb(linear: jax.Array) -> jax.Array:
    """Linear -> sRGB for inputs in [0, 1] (reference math.py:140-145)."""
    eps = jnp.finfo(jnp.float32).eps
    lo = 323 / 25 * linear
    hi = (211 * jnp.maximum(eps, linear) ** (5 / 12) - 11) / 200
    return jnp.where(linear <= 0.0031308, lo, hi)


def srgb_to_linear(srgb: jax.Array) -> jax.Array:
    """sRGB -> linear for inputs in [0, 1] (reference math.py:148-153)."""
    eps = jnp.finfo(jnp.float32).eps
    lo = 25 / 323 * srgb
    hi = jnp.maximum(eps, (200 * srgb + 11) / 211) ** (12 / 5)
    return jnp.where(srgb <= 0.04045, lo, hi)


def compute_ssim(
    img0: jax.Array,
    img1: jax.Array,
    max_val: float,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    return_map: bool = False,
) -> jax.Array:
    """SSIM between two [..., H, W, C] images; matches tf.image.ssim.

    Uses two 1-D Gaussian blurs (separable) vmapped over batch/channel axes,
    exactly the strategy of reference math.py:66-137, whose unit test holds it
    to tf.image.ssim goldens.

    Provenance: the reference vendored this function from Google's Apache-2.0
    mip-NeRF release (`internal/math.py`); the algorithm (Gaussian-windowed
    mean/variance/covariance + the standard SSIM formula) is the tf.image.ssim
    specification, so any implementation pinned to those goldens shares its
    structure. Recorded per the project's provenance rule (docs/PARITY.md).
    """
    hw = filter_size // 2
    shift = (2 * hw - filter_size + 1) / 2
    t = ((jnp.arange(filter_size) - hw + shift) / filter_sigma) ** 2
    filt = jnp.exp(-0.5 * t)
    filt = filt / jnp.sum(filt)

    def conv_valid(z, f):
        return jsp.signal.convolve2d(z, f, mode="valid", precision=jax.lax.Precision.HIGHEST)

    blur_rows = lambda z: conv_valid(z, filt[:, None])
    blur_cols = lambda z: conv_valid(z, filt[None, :])

    ndim = img0.ndim
    # vmap the 2-D blurs over every axis except (H, W): leading batch dims and
    # the trailing channel dim.
    for ax in tuple(range(ndim - 3)) + (ndim - 1,):
        blur_rows = jax.vmap(blur_rows, in_axes=ax, out_axes=ax)
        blur_cols = jax.vmap(blur_cols, in_axes=ax, out_axes=ax)
    blur = lambda z: blur_rows(blur_cols(z))

    mu0 = blur(img0)
    mu1 = blur(img1)
    mu00 = mu0 * mu0
    mu11 = mu1 * mu1
    mu01 = mu0 * mu1
    sigma00 = blur(img0**2) - mu00
    sigma11 = blur(img1**2) - mu11
    sigma01 = blur(img0 * img1) - mu01

    # Clamp (co)variances to physically valid values.
    sigma00 = jnp.maximum(0.0, sigma00)
    sigma11 = jnp.maximum(0.0, sigma11)
    sigma01 = jnp.sign(sigma01) * jnp.minimum(jnp.sqrt(sigma00 * sigma11), jnp.abs(sigma01))

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    numer = (2 * mu01 + c1) * (2 * sigma01 + c2)
    denom = (mu00 + mu11 + c1) * (sigma00 + sigma11 + c2)
    ssim_map = numer / denom
    if return_map:
        return ssim_map
    return jnp.mean(ssim_map, axis=tuple(range(ndim - 3, ndim)))


def log_lerp_decay(
    step,
    v_init: float,
    v_final: float,
    max_steps: int,
    delay_steps: int = 0,
    delay_mult: float = 1.0,
):
    """Log-linearly interpolated decay with optional sine-eased warmup.

    Returns v_init at step 0 and v_final at max_steps; if delay_steps > 0 the
    value is scaled by a reverse-cosine ramp starting at delay_mult
    (reference math.py:156-190). Works on python scalars and traced values.
    """
    step = jnp.asarray(step, jnp.float32)
    if delay_steps > 0:
        delay_rate = delay_mult + (1 - delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(jnp.log(v_init) * (1 - t) + jnp.log(v_final) * t)
    return delay_rate * log_lerp


def freq_alpha_schedule(
    step,
    alpha_init: float,
    alpha_final: float,
    delay_steps: int,
    max_steps: int,
):
    """BARF coarse-to-fine frequency window schedule.

    alpha_init until delay_steps, then a linear ramp hitting alpha_final at
    max_steps (reference math.py:193-219 — note the ramp starts from 0, not
    from alpha_init, matching the reference exactly). jit-traceable.
    """
    step = jnp.asarray(step, jnp.float32)
    ramp = (step - delay_steps) / (max_steps - delay_steps) * alpha_final
    return jnp.where(
        step < delay_steps,
        jnp.asarray(alpha_init, jnp.float32),
        jnp.where(step < max_steps, ramp, jnp.asarray(alpha_final, jnp.float32)),
    )


def sorted_piecewise_constant_pdf(
    key: jax.Array,
    bins: jax.Array,
    weights: jax.Array,
    num_samples: int,
    randomized: bool,
) -> jax.Array:
    """Inverse-CDF sampling from a piecewise-constant PDF over sorted bins.

    Args:
      key: PRNG key (used when randomized).
      bins: [..., num_bins + 1] sorted fenceposts.
      weights: [..., num_bins] non-negative histogram weights.
      num_samples: number of samples to draw per batch element.
      randomized: stratified-jittered samples if True, else a linspace.

    Returns:
      [..., num_samples] sorted sample positions.

    Behavior matches reference math.py:222-284 (itself vendored from Google's
    Apache-2.0 mip-NeRF `internal/math.py`) to float tolerance: eps-padding so
    all-zero weights are valid, CDF pinned to exactly 0/1 at the ends, and u
    drawn in [0, 1). The interval lookup here is an independent formulation:
    instead of the reference's four masked max/min reductions over a
    [bins, samples] comparison matrix, we detect the bracketing interval as
    the 0→1 boundary of that (sorted) mask down the fencepost axis — giving a
    one-hot [fenceposts, samples] selector for the left edge (shift it one row
    for the right edge) — and contract it with bins/cdf as a matmul. For
    sorted cdf with cdf[0] = 0 <= u < 1 = cdf[-1] the boundary row is
    exactly the LAST fencepost with cdf_i <= u (even when zero-weight bins
    duplicate CDF values), matching the reference's masked max. Everything
    stays dense (comparisons + two batched matmuls on the MXU): an earlier
    take_along_axis form lowered to gather/scatter on TPU and cost ~15% of
    the whole train step (docs/DESIGN.md).
    """
    eps = 1e-5
    weight_sum = jnp.sum(weights, axis=-1, keepdims=True)
    padding = jnp.maximum(0, eps - weight_sum)
    weights = weights + padding / weights.shape[-1]
    weight_sum = weight_sum + padding

    pdf = weights / weight_sum
    cdf = jnp.minimum(1, jnp.cumsum(pdf[..., :-1], axis=-1))
    cdf = jnp.concatenate(
        [jnp.zeros_like(cdf[..., :1]), cdf, jnp.ones_like(cdf[..., :1])], axis=-1
    )

    if randomized:
        s = 1 / num_samples
        u = jnp.arange(num_samples) * s
        u = u + jax.random.uniform(
            key,
            cdf.shape[:-1] + (num_samples,),
            maxval=s - jnp.finfo("float32").eps,
        )
        # u lives in [0, 1): zero is possible, one is not.
        u = jnp.minimum(u, 1.0 - jnp.finfo("float32").eps)
    else:
        u = jnp.linspace(0.0, 1.0 - jnp.finfo("float32").eps, num_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (num_samples,))

    # mask[..., i, j] = (cdf_i <= u_j) is a prefix-of-ones down the fencepost
    # axis; the left bracket is its last 1 (the 1→0 boundary row), the right
    # bracket the row after. cdf[0] = 0 <= u < 1 = cdf[-1] guarantees the
    # boundary exists strictly inside the axis.
    mask = cdf[..., :, None] <= u[..., None, :]
    below = jnp.concatenate(
        [mask[..., 1:, :], jnp.zeros_like(mask[..., :1, :])], axis=-2
    )
    lo_1h = (mask & ~below).astype(cdf.dtype)  # one-hot [..., fenceposts, samples]
    hi_1h = jnp.concatenate(
        [jnp.zeros_like(lo_1h[..., :1, :]), lo_1h[..., :-1, :]], axis=-2
    )

    def bracket(x):
        # HIGHEST precision: one-hot selection is exact at fp32, but TPU
        # DEFAULT matmul rounds operands to bf16 — adjacent CDF fenceposts can
        # collapse to the same bf16 value and zero out cdf_g1 - cdf_g0.
        hi = jax.lax.Precision.HIGHEST
        return (
            jnp.einsum("...i,...ij->...j", x, lo_1h, precision=hi),
            jnp.einsum("...i,...ij->...j", x, hi_1h, precision=hi),
        )

    bins_g0, bins_g1 = bracket(bins)
    cdf_g0, cdf_g1 = bracket(cdf)

    t = jnp.clip(jnp.nan_to_num((u - cdf_g0) / (cdf_g1 - cdf_g0), 0), 0, 1)
    return bins_g0 + t * (bins_g1 - bins_g0)
