"""Orbax-backed checkpointing with correct resume semantics.

Checkpoint layout (vs reference utils/trainer.py:267-324, whose resume is
broken — restored history is wiped and epoch numbering restarts,
SURVEY.md §3.5):

  <log_dir>/checkpoints/checkpoint_epoch_<N>/   full train state
  <log_dir>/checkpoints/best_checkpoint/        full train state at best
  <log_dir>/best_model/                         weights-only (params+batch_stats)

Restoring a full state resumes at epoch N+1 with history, optimizer
momentum and best-metric tracking intact — preemption-safe on TPU VMs.
"""

import os
import shutil
from typing import Any, Mapping, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abspath(p: str) -> str:
    return os.path.abspath(p.replace("\\", "/"))


def save_pytree(path: str, tree: Mapping[str, Any]):
    path = _abspath(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.tree.map(np.asarray, tree))


def restore_pytree(path: str, template: Optional[Mapping[str, Any]] = None):
    path = _abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(path, item=jax.tree.map(np.asarray, template))
        return ckptr.restore(path)


def latest_epoch_checkpoint(checkpoint_dir: str) -> Optional[str]:
    """Path of the newest checkpoint_epoch_<N> dir, or None."""
    checkpoint_dir = _abspath(checkpoint_dir)
    if not os.path.isdir(checkpoint_dir):
        return None
    best, best_n = None, -1
    for name in os.listdir(checkpoint_dir):
        if name.startswith("checkpoint_epoch_"):
            try:
                n = int(name.rsplit("_", 1)[1])
            except ValueError:
                continue
            if n > best_n:
                best, best_n = os.path.join(checkpoint_dir, name), n
    return best
