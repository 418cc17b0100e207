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
import shutil
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save(directory: str, step: int, state: Any) -> None:
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    with ocp.CheckpointManager(directory) as mgr:
        exists = step in (mgr.all_steps() or [])
        if not exists:
            mgr.save(step, args=ocp.args.StandardSave(
                jax.device_get(state)), force=True)
            mgr.wait_until_finished()
            return
    # Overwrite semantics — the reference's torch.save behavior
    # (train.py:295-304). Orbax refuses to save over an existing step
    # even under force=True, so the stale step must be deleted first —
    # but deleting BEFORE the new save completes would leave a crash/OOM
    # window where the only copy of this step is gone (advisor round-3).
    # Stage the new save in a sibling tmp root on the same filesystem,
    # and only swap it in once fully written; the unprotected window
    # shrinks to the delete+rename pair, and even a crash inside it
    # leaves the complete new checkpoint at <tmp_root>/<step>.
    tmp_root = directory + ".resave_tmp"
    shutil.rmtree(tmp_root, ignore_errors=True)
    with ocp.CheckpointManager(tmp_root) as tmp_mgr:
        tmp_mgr.save(step, args=ocp.args.StandardSave(
            jax.device_get(state)), force=True)
        tmp_mgr.wait_until_finished()
    with ocp.CheckpointManager(directory) as mgr:
        mgr.delete(step)
    os.rename(os.path.join(tmp_root, str(step)),
              os.path.join(directory, str(step)))
    shutil.rmtree(tmp_root, ignore_errors=True)


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
