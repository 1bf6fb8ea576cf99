"""Checkpoint / resume via Orbax (async-capable), replacing flax.training.checkpoints.

The reference restores-before-replicate and saves the unreplicated pytree on
host 0 every save_every steps with keep=100 (train_boxpose.py:404-407,
529-532, 578-581). Same semantics here, through an Orbax CheckpointManager;
with jit+NamedSharding there is no replicate/unreplicate dance — the state is
already a global pytree.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper: save(state, step), restore latest into a like-shaped state."""

    def __init__(self, directory: str, keep: int = 100, async_save: bool = True):
        os.makedirs(directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(os.path.abspath(directory), options=options)

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def save(self, step: int, state: Any, force: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        """Restore `step` (default latest) into the structure of state_like.

        Returns state_like unchanged when no checkpoint exists (fresh run) —
        the reference's restore_checkpoint behaves the same.
        """
        step = self.latest_step if step is None else step
        if step is None:
            return state_like
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_like))

    def restore_raw(self, step: Optional[int] = None) -> Any:
        """Restore the full checkpoint as plain nested dicts/arrays (no
        template) — for apps that only need a slice of the state, e.g. the
        pose table (pose_eval)."""
        step = self.latest_step if step is None else step
        if step is None:
            raise FileNotFoundError("no checkpoint available")
        return self._mgr.restore(step, args=ocp.args.StandardRestore())

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
