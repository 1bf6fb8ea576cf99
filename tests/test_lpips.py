"""Pure-JAX AlexNet-LPIPS (durf_tpu/lpips.py): loader + metric properties.

Real calibration weights cannot exist in this zero-egress environment, so
these tests pin the architecture/loader contract with random weights: the
metric must be 0 on identical images, positive and symmetric on different
ones, and the torch-state-dict loader must accept the exact key layout of
`lpips.LPIPS(net='alex').state_dict()` (the reference notebook's dependency,
notebooks/render_eval_durf.ipynb cell 5).
"""

import numpy as np
import pytest

from durf_tpu.lpips import _CONVS, _SLICE_KEYS, load_lpips, save_random_weights


@pytest.fixture(scope="module")
def npz_metric(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lpips") / "w.npz")
    save_random_weights(path)
    return load_lpips(path)


def _imgs():
    rng = np.random.default_rng(0)
    a = rng.uniform(size=(33, 47, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.2, a.shape).astype(np.float32), 0, 1)
    return a, b


def test_identical_images_zero(npz_metric):
    a, _ = _imgs()
    assert npz_metric(a, a) == 0.0


def test_different_images_positive_and_symmetric(npz_metric):
    a, b = _imgs()
    d_ab = npz_metric(a, b)
    d_ba = npz_metric(b, a)
    assert d_ab > 0.0
    np.testing.assert_allclose(d_ab, d_ba, rtol=1e-5)


def test_more_distortion_scores_higher(npz_metric):
    a, _ = _imgs()
    rng = np.random.default_rng(7)
    noise = rng.normal(0, 1, a.shape).astype(np.float32)
    near = np.clip(a + 0.02 * noise, 0, 1)
    far = np.clip(a + 0.4 * noise, 0, 1)
    assert npz_metric(a, far) > npz_metric(a, near)


def test_torch_state_dict_layout_loads(tmp_path):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    sd = {}
    for key, (o, i, k, _, _) in zip(_SLICE_KEYS, _CONVS):
        sd[f"net.{key}.weight"] = torch.from_numpy(
            rng.normal(0, 0.05, (o, i, k, k)).astype(np.float32)
        )
        sd[f"net.{key}.bias"] = torch.zeros(o)
    for idx, (o, *_rest) in enumerate(_CONVS):
        sd[f"lin{idx}.model.1.weight"] = torch.from_numpy(
            rng.uniform(0, 1, (1, o, 1, 1)).astype(np.float32)
        )
    path = str(tmp_path / "lpips_alex.pth")
    torch.save(sd, path)
    metric = load_lpips(path)
    a, b = _imgs()
    assert metric(a, a) == 0.0
    assert metric(a, b) > 0.0


def test_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        load_lpips("/nonexistent/weights.pth")


def test_eval_gate_uses_local_weights(tmp_path, monkeypatch):
    """_lpips_fn falls back to the pure-JAX path via $DURF_LPIPS_WEIGHTS
    when the lpips package is absent (it is, in this image)."""
    from durf_tpu.eval import _lpips_fn

    assert _lpips_fn() is None  # no package, no weights
    path = str(tmp_path / "w.npz")
    save_random_weights(path)
    monkeypatch.setenv("DURF_LPIPS_WEIGHTS", path)
    fn = _lpips_fn()
    assert fn is not None
    a, b = _imgs()
    assert fn(a, b) > 0.0
