"""Checkpoint save/restore via orbax.

Behavioral reference: twke18/SPML saves torch state dicts every
snapshot_step (pyscripts/train/train.py:295-304) and loads with
name-remapping (spml/models/embeddings/base_model.py:26-52). Here the
entire TrainState pytree (params, BN stats, optimizer state, memory
bank, step, rng) checkpoints atomically, so resume is exact — unlike the
reference, whose shipped resume path is broken (train.py:114 'fromat'
typo noted in SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save(directory: str, step: int, state: Any) -> None:
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    with ocp.CheckpointManager(directory) as mgr:
        # overwrite semantics — the reference's torch.save behavior
        # (train.py:295-304). Orbax refuses to save over an existing
        # step even under force=True ("will not overwrite"), so a rerun
        # into the same snapshot dir would otherwise fail (or, if the
        # error were swallowed, silently keep serving the previous
        # run's weights); delete the stale step first.
        if step in (mgr.all_steps() or []):
            mgr.delete(step)
        mgr.save(step, args=ocp.args.StandardSave(
            jax.device_get(state)), force=True)
        mgr.wait_until_finished()


def latest_step(directory: str) -> int | None:
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    with ocp.CheckpointManager(directory) as mgr:
        return mgr.latest_step()


def restore(directory: str, state_template: Any,
            step: int | None = None) -> Any:
    """Restore into the structure of `state_template` (shapes must
    match)."""
    directory = os.path.abspath(directory)
    with ocp.CheckpointManager(directory) as mgr:
        if step is None:
            step = mgr.latest_step()
        return mgr.restore(step, args=ocp.args.StandardRestore(
            jax.device_get(state_template)))
