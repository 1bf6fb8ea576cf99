"""Checkpoint manager unit tests (Orbax wrapper)."""

import jax.numpy as jnp
import numpy as np

from durf_tpu.checkpoints import CheckpointManager


def _state(v: float):
    return {"params": {"w": jnp.full((4, 4), v)}, "step": jnp.asarray(int(v))}


def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep=3, async_save=False)
    assert mgr.latest_step is None
    mgr.save(10, _state(1.0))
    mgr.wait()
    assert mgr.latest_step == 10
    restored = mgr.restore(_state(0.0))
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 1.0)
    assert int(restored["step"]) == 1
    mgr.close()


def test_restore_without_checkpoint_returns_template(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep=3, async_save=False)
    template = _state(7.0)
    out = mgr.restore(template)
    assert out is template
    mgr.close()


def test_keep_policy_prunes_old_steps(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep=2, async_save=False)
    for s in (1, 2, 3, 4):
        mgr.save(s, _state(float(s)))
    mgr.wait()
    assert mgr.latest_step == 4
    steps = sorted(int(p.name) for p in tmp_path.iterdir() if p.name.isdigit())
    assert len(steps) <= 2 and 4 in steps
    mgr.close()


def test_restore_raw_slices(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep=2, async_save=False)
    mgr.save(5, _state(3.0))
    mgr.wait()
    raw = mgr.restore_raw()
    np.testing.assert_allclose(np.asarray(raw["params"]["w"]), 3.0)
    mgr.close()
