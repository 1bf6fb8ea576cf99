"""Pure-JAX LPIPS (AlexNet backbone) loading LOCAL weights.

The reference's eval notebook treats LPIPS as an optional metric through the
`lpips` pip package (notebooks/render_eval_durf.ipynb cell 5), which needs
downloaded torchvision weights — unavailable in a zero-egress environment.
This module re-implements the metric in JAX and loads weights from a file
the user provides:

  * a torch checkpoint of `lpips.LPIPS(net='alex').state_dict()` (the
    natural artifact of the reference's own dependency): keys
    `net.slice{k}.{i}.weight/bias` for the AlexNet convs and
    `lin{k}.model.1.weight` for the learned per-channel calibration; or
  * an .npz with keys `conv{k}_weight` [out,in,kh,kw], `conv{k}_bias`,
    `lin{k}` [C] (k = 0..4).

Metric definition (Zhang et al. 2018, "The Unreasonable Effectiveness of
Deep Features"): images in [0, 1] are affinely normalized, pushed through
AlexNet's five ReLU stages, each stage's features unit-normalized over
channels; LPIPS = sum over stages of the spatial mean of the calibrated
squared differences.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# torchvision alexnet.features conv specs feeding the five ReLU taps:
# (out_ch, in_ch, kernel, stride, padding), with 3x2-stride maxpools after
# taps 1, 2 and (never used by LPIPS) 5.
_CONVS = [
    (64, 3, 11, 4, 2),
    (192, 64, 5, 1, 2),
    (384, 192, 3, 1, 1),
    (256, 384, 3, 1, 1),
    (256, 256, 3, 1, 1),
]
_POOL_BEFORE = {1: True, 2: True}  # maxpool before convs 1 and 2
# original torchvision `features` indices of the five convs, as preserved in
# the lpips package's slice modules.
_SLICE_KEYS = ["slice1.0", "slice2.3", "slice3.6", "slice4.8", "slice5.10"]

# lpips ScalingLayer constants (inputs are first mapped [0,1] -> [-1,1]).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _load_state(path: str) -> Tuple[List[Tuple[np.ndarray, np.ndarray]], List[np.ndarray]]:
    """-> ([(conv_w [o,i,kh,kw], conv_b [o])], [lin [C]])."""
    if path.endswith(".npz"):
        z = np.load(path)
        convs = [
            (np.asarray(z[f"conv{k}_weight"], np.float32), np.asarray(z[f"conv{k}_bias"], np.float32))
            for k in range(5)
        ]
        lins = [np.asarray(z[f"lin{k}"], np.float32).reshape(-1) for k in range(5)]
        return convs, lins
    import torch  # CPU build is baked into this image

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    def get(key):
        return np.asarray(sd[key].detach().cpu().numpy(), np.float32)

    convs = [(get(f"net.{k}.weight"), get(f"net.{k}.bias")) for k in _SLICE_KEYS]
    lins = [get(f"lin{k}.model.1.weight").reshape(-1) for k in range(5)]
    return convs, lins


def _features(x: jnp.ndarray, convs) -> List[jnp.ndarray]:
    """[N, 3, H, W] in lpips-normalized space -> the five ReLU taps."""
    taps = []
    for k, (w, b) in enumerate(convs):
        if _POOL_BEFORE.get(k):
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
            )
        _, _, kern, stride, pad = _CONVS[k]
        x = jax.lax.conv_general_dilated(
            x,
            jnp.asarray(w),
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + jnp.asarray(b)[None, :, None, None]
        x = jax.nn.relu(x)
        taps.append(x)
    return taps


def _unit_normalize(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    return x / jnp.sqrt(jnp.sum(x**2, axis=1, keepdims=True) + eps)


def load_lpips(path: str):
    """Build `lpips(img0, img1) -> float` from a local weights file.

    img0/img1: [H, W, 3] (or [N, H, W, 3]) in [0, 1]. Returns the batch-mean
    LPIPS distance. Raises FileNotFoundError / KeyError on a missing or
    foreign-format file — callers gate on that (durf_tpu.eval).
    """
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    convs, lins = _load_state(path)
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]

    @jax.jit
    def distance(img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
        def prep(im):
            im = jnp.asarray(im, jnp.float32)
            if im.ndim == 3:
                im = im[None]
            im = jnp.transpose(im, (0, 3, 1, 2))  # NHWC -> NCHW
            return (im * 2.0 - 1.0 - shift) / scale

        f0 = _features(prep(img0), convs)
        f1 = _features(prep(img1), convs)
        total = 0.0
        for t0, t1, lin in zip(f0, f1, lins):
            d = (_unit_normalize(t0) - _unit_normalize(t1)) ** 2
            total = total + jnp.mean(
                jnp.sum(jnp.asarray(lin)[None, :, None, None] * d, axis=1)
            )
        return total

    return lambda a, b: float(distance(a, b))


def save_random_weights(path: str, seed: int = 0) -> None:
    """Write a VALID-format random .npz (test fixture: the loader/topology
    contract without the real calibration)."""
    rng = np.random.default_rng(seed)
    out: Dict[str, np.ndarray] = {}
    for k, (o, i, kern, _, _) in enumerate(_CONVS):
        out[f"conv{k}_weight"] = rng.normal(0, 0.05, (o, i, kern, kern)).astype(np.float32)
        out[f"conv{k}_bias"] = np.zeros(o, np.float32)
        out[f"lin{k}"] = rng.uniform(0, 1, (o,)).astype(np.float32)
    np.savez(path, **out)
