"""Positional encodings: NeRF PE, integrated PE (IPE), and BARF-windowed variants.

Behavioral parity with reference internal/mip.py:25-73 and 182-282, with two
deliberate fixes (documented in docs/DEFECTS.md):
  * the BARF window is aligned per-frequency with the encoding layout — the
    reference broadcasts the per-degree weights as [max_deg, 6] which does not
    match its own [sin(deg,dim); cos(deg,dim)] feature layout (mip.py:58,220).
    Irrelevant for the published configs (alpha == max_deg => all-ones window).
  * windowed_pos_enc honors append_identity=False by returning the *windowed*
    features (the reference returns the unwindowed ones, mip.py:64).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from durf_tpu import mathx


def expected_sin(x: jax.Array, x_var: jax.Array, safe: bool = True):
    """Mean and variance of sin(z) for z ~ N(x, x_var) (reference mip.py:67-73).

    safe=False uses plain sin/cos — exact whenever |x| stays far below the
    TPU transcendental blow-up range (~1e8), e.g. after scene contraction
    (|x| <= 2 * 2^max_deg), and skips the mod/where range reduction.
    """
    sin = mathx.safe_sin if safe else jnp.sin
    cos = mathx.safe_cos if safe else jnp.cos
    y = jnp.exp(-0.5 * x_var) * sin(x)
    y_var = jnp.maximum(0, 0.5 * (1 - jnp.exp(-2 * x_var) * cos(2 * x)) - y**2)
    return y, y_var


def gaussian_fourier_enc(
    x: jax.Array, scale: float, key: jax.Array, num_features: int = 3, append_identity: bool = False
) -> jax.Array:
    """Random Gaussian Fourier features (Tancik et al.): sin/cos of
    2*pi*x @ B^T with B ~ N(0, scale^2).

    Reference mip.py:25-33 (gaus_enc — present in the reference's encoding
    inventory, unused by its configs).
    """
    bvals = jax.random.normal(key, (num_features, x.shape[-1]), x.dtype) * scale
    proj = (2.0 * jnp.pi * x) @ bvals.T
    feat = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
    if append_identity:
        return jnp.concatenate([x, feat], axis=-1)
    return feat


def pos_enc(x: jax.Array, min_deg: int, max_deg: int, append_identity: bool = True) -> jax.Array:
    """Classic NeRF positional encoding: sin/cos of x * 2^[min_deg, max_deg).

    Feature layout is [sin(deg0 dims.., deg1 dims.., ...), cos(...)], matching
    reference mip.py:36-45 (cos realized as sin(x + pi/2)).
    """
    scales = jnp.asarray([2.0**i for i in range(min_deg, max_deg)], x.dtype)
    xb = jnp.reshape(x[..., None, :] * scales[:, None], x.shape[:-1] + (-1,))
    four_feat = jnp.sin(jnp.concatenate([xb, xb + 0.5 * jnp.pi], axis=-1))
    if append_identity:
        return jnp.concatenate([x, four_feat], axis=-1)
    return four_feat


def _barf_window(alpha, min_deg: int, max_deg: int, dims: int, dtype) -> jax.Array:
    """Per-feature BARF cosine easing window, aligned with the PE layout.

    w_k = (1 - cos(pi * clip(alpha - k, 0, 1))) / 2 for absolute frequency
    degree k (reference mip.py:55-58); repeated over the `dims` coordinates and
    tiled over the (sin, cos) halves.
    """
    k = jnp.arange(min_deg, max_deg, dtype=dtype)
    w = (1 - jnp.cos(jnp.clip(alpha - k, 0, 1) * jnp.pi)) / 2
    w = jnp.repeat(w, dims)  # [deg*dims], layout matches xb flattening
    return jnp.concatenate([w, w], axis=-1)  # sin half + cos half


def windowed_pos_enc(
    x: jax.Array, min_deg: int, max_deg: int, alpha, append_identity: bool = True
) -> jax.Array:
    """BARF coarse-to-fine windowed positional encoding (reference mip.py:48-64)."""
    feat = pos_enc(x, min_deg, max_deg, append_identity=False)
    w = _barf_window(alpha, min_deg, max_deg, x.shape[-1], feat.dtype)
    feat = w * feat
    if append_identity:
        return jnp.concatenate([x, feat], axis=-1)
    return feat


def _ipe_features_recurrent(x, x_cov_diag, min_deg: int, max_deg: int):
    """Recurrence IPE: one exp/sin/cos per coordinate instead of per feature.

    The IPE features at degree k are exp(-4^k v / 2) * {sin, cos}(2^k x).
    Walking degrees low->high:
      attenuation: e_{k+1} = ((e_k)^2)^2          (exp(-4^{k+1} v/2) = e_k^4)
      angle:       s_{k+1} = 2 s_k c_k,  c_{k+1} = c_k^2 - s_k^2   (double angle)
    so the whole band costs 1 exp + 1 sin + 1 cos + O(max_deg) multiplies per
    coordinate — ~10x fewer VPU transcendentals than the direct form at
    max_deg = 10, which profiling shows dominates the non-MLP step time
    (docs/DESIGN.md step profile). Error grows ~2^k ulps along the recurrence
    (~5e-5 absolute at degree 9 in fp32), far below bf16 resolution — this is
    the intended companion of compute_dtype='bfloat16'.

    Both chains amplify their seed's rounding (the 4th-power chain by 4 PER
    DEGREE relative — 4^9 * 1 ulp ~ 2e-2 at the top of a 10-degree band), so
    the recurrences RESTART from fresh transcendentals every `_RESTART`
    degrees: error stays ~1e-5 while still cutting transcendentals ~5x.

    Matches _ipe_features(..., diag=True, safe=False) feature-for-feature:
    output layout [sin(deg, dim)..., cos(deg, dim)...].
    """
    x_cov_diag = jnp.maximum(x_cov_diag, 0.0)
    _RESTART = 5
    e = s = c = None
    sin_feats, cos_feats = [], []
    for i, deg in enumerate(range(min_deg, max_deg)):
        if i % _RESTART == 0:
            scale = 2.0**deg
            e = jnp.exp((-0.5 * scale * scale) * x_cov_diag)
            s = jnp.sin(scale * x)
            c = jnp.cos(scale * x)
        sin_feats.append(e * s)
        cos_feats.append(e * c)
        e2 = e * e
        e = e2 * e2
        s, c = 2.0 * s * c, c * c - s * s
    shape = x.shape[:-1] + (-1,)
    return jnp.concatenate(
        [
            jnp.reshape(jnp.stack(sin_feats, axis=-2), shape),
            jnp.reshape(jnp.stack(cos_feats, axis=-2), shape),
        ],
        axis=-1,
    )


def _ipe_features(x_coord, min_deg: int, max_deg: int, diag: bool, safe: bool = True):
    """Shared IPE core: lifted means/variances -> expected sin features."""
    if diag:
        x, x_cov_diag = x_coord
        scales = jnp.asarray([2.0**i for i in range(min_deg, max_deg)], x.dtype)
        shape = x.shape[:-1] + (-1,)
        y = jnp.reshape(x[..., None, :] * scales[:, None], shape)
        y_var = jnp.reshape(x_cov_diag[..., None, :] * scales[:, None] ** 2, shape)
    else:
        x, x_cov = x_coord
        num_dims = x.shape[-1]
        basis = jnp.concatenate(
            [2.0**i * jnp.eye(num_dims, dtype=x.dtype) for i in range(min_deg, max_deg)], axis=1
        )
        y = mathx.matmul_hp(x, basis)
        # diag(basis^T @ cov @ basis) without materializing the full product.
        y_var = jnp.sum(mathx.matmul_hp(x_cov, basis) * basis, axis=-2)
    # Variances are non-negative for any PSD covariance; clamp so that a
    # numerically indefinite cov cannot reach exp(+|y_var|) = inf downstream.
    y_var = jnp.maximum(y_var, 0.0)
    return expected_sin(
        jnp.concatenate([y, y + 0.5 * jnp.pi], axis=-1),
        jnp.concatenate([y_var] * 2, axis=-1),
        safe=safe,
    )[0]


def _ipe_pieces_cm(x, x_var, min_deg: int, max_deg: int, safe: bool, recurrent: bool):
    """Coordinate-major IPE core: x, x_var [3, ...] -> (sin, cos) piece lists.

    Each piece is one [...]-shaped feature plane, ordered (degree, dim) to
    match the row-major layout [sin(deg, dim)..., cos(deg, dim)...]. The
    arithmetic per element is identical to _ipe_features /
    _ipe_features_recurrent — only the memory layout differs (full-lane
    [B, S] planes instead of 3-of-128-lane [N, 3] tiles; see
    ops/frustum.py lift_gaussian_cm for why this matters on TPU).
    """
    x_var = jnp.maximum(x_var, 0.0)
    sin_p, cos_p = [], []
    if recurrent:
        _RESTART = 5
        e = s = c = None
        for i, deg in enumerate(range(min_deg, max_deg)):
            if i % _RESTART == 0:
                scale = 2.0**deg
                e = jnp.exp((-0.5 * scale * scale) * x_var)
                s = jnp.sin(scale * x)
                c = jnp.cos(scale * x)
            es, ec = e * s, e * c
            for k in range(x.shape[0]):
                sin_p.append(es[k])
                cos_p.append(ec[k])
            e2 = e * e
            e = e2 * e2
            s, c = 2.0 * s * c, c * c - s * s
        return sin_p, cos_p
    sinf = mathx.safe_sin if safe else jnp.sin
    for deg in range(min_deg, max_deg):
        scale = 2.0**deg
        y = scale * x
        att = jnp.exp(-0.5 * (scale * scale) * x_var)
        fs, fc = att * sinf(y), att * sinf(y + 0.5 * jnp.pi)
        for k in range(x.shape[0]):
            sin_p.append(fs[k])
            cos_p.append(fc[k])
    return sin_p, cos_p


def integrated_pos_enc_cm(
    x, x_var, min_deg: int, max_deg: int, safe: bool = True, recurrent: bool = False
) -> jax.Array:
    """Coordinate-major IPE: ([3, ...] mean, [3, ...] var diag) -> [F, ...].

    Same feature VALUES as integrated_pos_enc(diag=True) but FEATURE-MAJOR:
    the feature axis leads. Stacking along axis 0 is a major-dim concat of
    dense [B, S] planes (free); assembling [..., F] row-major instead was
    measured at ~11 ms PER LEVEL at the flagship point (a 60-operand concat
    of 3-of-128-lane columns — docs/DESIGN.md). The fused MLP consumes the
    feature-major layout directly with a transposed-lhs dot."""
    sin_p, cos_p = _ipe_pieces_cm(x, x_var, min_deg, max_deg, safe, recurrent)
    return jnp.stack(sin_p + cos_p, axis=0)


def windowed_ipe_cm(
    x, x_var, min_deg: int, max_deg: int, alpha, safe: bool = True, recurrent: bool = False
) -> jax.Array:
    """Coordinate-major BARF-windowed IPE with the identity (mean) prepended:
    the FEATURE-MAJOR [F, ...] counterpart of windowed_ipe(diag=True)."""
    sin_p, cos_p = _ipe_pieces_cm(x, x_var, min_deg, max_deg, safe, recurrent)
    dims = x.shape[0]
    w = [
        (1 - jnp.cos(jnp.clip(alpha - k, 0, 1) * jnp.pi)) / 2
        for k in range(min_deg, max_deg)
    ]
    sin_p = [w[i // dims] * p for i, p in enumerate(sin_p)]
    cos_p = [w[i // dims] * p for i, p in enumerate(cos_p)]
    ident = [x[k] for k in range(dims)]
    return jnp.stack(ident + sin_p + cos_p, axis=0)


def integrated_pos_enc(
    x_coord, min_deg: int, max_deg: int, diag: bool = False, safe: bool = True,
    recurrent: bool = False,
) -> jax.Array:
    """Integrated positional encoding of a Gaussian (mean, cov).

    Args:
      x_coord: (means [..., 3], covs [..., 3, 3] or diag [..., 3]).
      min_deg/max_deg: frequency band.
      diag: whether covs are diagonal.
      recurrent: use the double-angle/repeated-squaring form (diag only;
        ~10x fewer transcendentals, fp-rounding-equivalent — see
        _ipe_features_recurrent).

    NOTE: the recurrent path ignores `safe` — its restart seeds call raw
    sin/cos, so it assumes range-bounded inputs (contracted scenes keep
    2^deg * x within the TPU transcendental range). For contraction=False
    scenes keep recurrent_encode off or pre-wrap coordinates; the config
    check lives in ModelConfig validation.

    Reference mip.py:226-282 (matmuls at HIGHEST precision, mip.py:275-278).
    """
    if recurrent and diag:
        return _ipe_features_recurrent(x_coord[0], x_coord[1], min_deg, max_deg)
    return _ipe_features(x_coord, min_deg, max_deg, diag, safe)


def windowed_ipe(
    x_coord, min_deg: int, max_deg: int, alpha, diag: bool = False, safe: bool = True,
    recurrent: bool = False,
) -> jax.Array:
    """BARF-windowed IPE with the identity (mean) prepended.

    Used for the per-object MLP inputs so noisy box poses can be optimized
    coarse-to-fine (reference mip.py:182-223; identity prepend at 222).
    """
    if recurrent and diag:
        feat = _ipe_features_recurrent(x_coord[0], x_coord[1], min_deg, max_deg)
    else:
        feat = _ipe_features(x_coord, min_deg, max_deg, diag, safe)
    w = _barf_window(alpha, min_deg, max_deg, x_coord[0].shape[-1], feat.dtype)
    return jnp.concatenate([x_coord[0], w * feat], axis=-1)
