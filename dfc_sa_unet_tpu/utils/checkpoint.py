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

import json
import os
import shutil
from typing import Any, Mapping, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

# Orbax refuses to serialize zero-size arrays ("Cannot save arrays with
# zero size").  The model zoo legitimately produces them: LightSelfAttention
# puts Q/K at C//8 channels, so features[0] < 8 yields 0-channel QK convs
# (valid math in flax — uniform attention; the torch reference crashes on
# such configs, so there is no parity constraint).  save_pytree swaps each
# zero-size leaf for a 1-element placeholder and records the true
# shape/dtype in a sidecar manifest inside the checkpoint dir;
# restore_pytree swaps them back (from the template when given, else from
# the manifest).
_ZERO_MANIFEST = "zero_size_leaves.json"


def _abspath(p: str) -> str:
    return os.path.abspath(p.replace("\\", "/"))


def _local_checkpointer():
    """PyTree checkpointer that never coordinates across processes.

    Orbax's default save/restore runs GLOBAL barriers (every process must
    call it together), but the trainer checkpoints from process 0 only
    while the other processes may already be inside the next training
    collective — a deadlock (observed: a 2-process CPU cluster hangs at
    the first best-checkpoint save).  Trees here are plain numpy
    (replicated state pulled to host first), so cross-process
    coordination buys nothing: make THIS process the primary and the
    only active one, with per-process barrier keys so disjoint barriers
    cannot collide at the coordinator.
    """
    if jax.process_count() == 1:
        return ocp.PyTreeCheckpointer()
    pid = jax.process_index()
    mp = ocp.options.MultiprocessingOptions(
        primary_host=pid, active_processes={pid},
        barrier_sync_key_prefix=f"proc{pid}")
    return ocp.Checkpointer(
        ocp.PyTreeCheckpointHandler(multiprocessing_options=mp),
        multiprocessing_options=mp,
    )


def save_pytree(path: str, tree: Mapping[str, Any]):
    path = _abspath(path)
    tree = jax.tree.map(np.asarray, tree)
    zero_leaves = {}

    def _placeholder(key_path, a):
        if a.size == 0:
            zero_leaves[jax.tree_util.keystr(key_path)] = [list(a.shape), str(a.dtype)]
            return np.zeros((1,), a.dtype)
        return a

    tree = jax.tree_util.tree_map_with_path(_placeholder, tree)
    # Stage the Orbax save AND the manifest in a hidden temp dir, then
    # rename into place: writing the manifest after ckptr.save() finalizes
    # would leave a one-line preemption window in which a complete-looking
    # checkpoint restores its zero-size leaves as shape-(1,) placeholders.
    # The leading dot keeps crashed leftovers out of
    # latest_epoch_checkpoint's scan; rename within one parent dir is
    # atomic on POSIX.
    parent, base = os.path.split(path)
    tmp = os.path.join(parent or ".", f".tmp.{base}.{os.getpid()}")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    try:
        with _local_checkpointer() as ckptr:
            ckptr.save(tmp, tree)
        if zero_leaves:
            with open(os.path.join(tmp, _ZERO_MANIFEST), "w") as f:
                json.dump(zero_leaves, f)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
    finally:
        if os.path.exists(tmp):
            shutil.rmtree(tmp, ignore_errors=True)


def restore_pytree(path: str, template: Optional[Mapping[str, Any]] = None):
    path = _abspath(path)
    # The MANIFEST (not the template) says which saved leaves were
    # zero-size placeholders: a zero-size *template* leaf routinely pairs
    # with non-empty saved data — e.g. a fresh Trainer's empty history
    # lists templating a resume — and must restore the saved values.
    manifest = os.path.join(path, _ZERO_MANIFEST)
    zero_leaves = {}
    if os.path.exists(manifest):
        with open(manifest) as f:
            zero_leaves = json.load(f)

    def _unswap(key_path, a):
        entry = zero_leaves.get(jax.tree_util.keystr(key_path))
        if entry is not None:
            shape, dtype = entry
            return np.zeros(shape, dtype)
        return a

    with _local_checkpointer() as ckptr:
        if template is not None:
            template = jax.tree.map(np.asarray, template)
            if zero_leaves:
                template = jax.tree_util.tree_map_with_path(
                    lambda p, a: (np.zeros((1,), zero_leaves[jax.tree_util.keystr(p)][1])
                                  if jax.tree_util.keystr(p) in zero_leaves else a),
                    template,
                )
            out = ckptr.restore(path, item=template)
        else:
            out = ckptr.restore(path)
    if zero_leaves:
        out = jax.tree_util.tree_map_with_path(_unswap, out)
    return out


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
