"""Multi-host (pod-scale) runtime: jax.distributed + per-process data.

The reference is strictly single-process (SURVEY.md §2.4 — no
distributed support of any kind); this module extends the framework's
GSPMD data parallelism from one host's chips to a TPU pod.  The design
is the standard JAX multi-controller recipe, not an MPI/NCCL port:

  * every process runs the SAME program; ``jax.distributed.initialize``
    wires the processes into one cluster and ``jax.devices()`` becomes
    the GLOBAL device list, so the existing ``Mesh``/``NamedSharding``
    training step is unchanged — XLA's collectives simply span hosts
    (ICI within a slice, DCN across slices),
  * each process loads a disjoint contiguous shard of every global
    batch (``BatchLoader(shard=...)``) and the shards are assembled
    into one global ``jax.Array`` with
    ``jax.make_array_from_process_local_data`` — no host ever
    materializes the full batch,
  * scalars coming back from jitted steps are fully replicated, so
    every process sees identical losses/metrics and takes identical
    control-flow decisions (best-model selection, NaN skips) without
    any extra communication,
  * host-side artifacts (plots, CSVs, checkpoints) are written by
    process 0 only; per-sample dumps are per-host over that host's
    validation shard.

Testability without a pod: N CPU processes x M virtual devices each
form a real multi-controller cluster (Gloo collectives) — see
tests/test_multihost.py, which asserts a 2-process x 4-device run
matches the single-process 8-device run.
"""

import os
from typing import Optional

import jax
import numpy as np

__all__ = [
    "initialize",
    "is_primary",
    "process_index",
    "process_count",
    "local_device_count",
    "global_batch",
    "host_local",
    "gather_rows",
    "gather_rows_many",
    "any_flag",
    "broadcast_tree",
    "sync",
    "shard_for_this_process",
]


def initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join (or form) the multi-process cluster.

    On Cloud TPU pods every argument is auto-detected from the metadata
    server — call with no arguments.  For explicit clusters (CPU tests,
    bare-metal) pass ``coordinator`` ("host:port"), ``num_processes``
    and ``process_id``.  Safe to call when already initialized (no-op)
    or for a single-process run (num_processes=1 skips the dance).
    """
    # NB: jax.process_count()/jax.devices() would INITIALIZE the backend,
    # after which distributed init is rejected — probe the client directly
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    if num_processes == 1 and coordinator is None:
        return
    # cross-process collectives on the CPU backend need Gloo (TPU's ICI
    # collectives are native); harmless no-op where the knob is absent
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def local_device_count() -> int:
    return jax.local_device_count()


def is_primary() -> bool:
    """True on the process that should write artifacts/checkpoints."""
    return jax.process_index() == 0


def global_batch(local_tree, sharding):
    """Assemble per-process local batch arrays into global jax.Arrays.

    ``local_tree`` holds this process's contiguous rows of the global
    batch (``BatchLoader(shard=(pid, nproc))`` yields exactly that);
    the result is one global array per leaf whose addressable shards
    are this host's rows — byte-identical layout to a single-process
    ``device_put`` of the concatenated batch.
    """
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_tree,
    )


def _local_rows(arr, batch_axis: int = 0):
    """(values, global row offsets) of this process's DISTINCT shards.

    On a 2-D ('data','spatial') mesh a [B] vector is sharded over 'data'
    but REPLICATED along 'spatial' — every spatial device holds the same
    slice; keeping one shard per distinct index avoids duplicating rows.
    """
    shards = {}
    for s in arr.addressable_shards:
        key = tuple((sl.start, sl.stop) for sl in s.index)
        shards.setdefault(key, s)
    ordered = sorted(shards.values(),
                     key=lambda s: s.index[batch_axis].start or 0)
    vals = np.concatenate([np.asarray(s.data) for s in ordered],
                          axis=batch_axis)
    offs = np.concatenate([
        np.arange(s.index[batch_axis].start or 0,
                  (s.index[batch_axis].start or 0) + s.data.shape[batch_axis])
        for s in ordered
    ]) if ordered else np.zeros((0,), np.int64)
    return vals, offs


def host_local(arr, batch_axis: int = 0):
    """This process's distinct rows of a batch-sharded global array.

    Rows come back in global-row order, deduplicated across replica
    devices.  NB: for a FULLY-replicated array this returns every host's
    rows (the whole array) — there is no per-host slice to select; use
    :func:`gather_rows` when you need globally-ordered real rows
    regardless of layout.
    """
    if not isinstance(arr, jax.Array) or arr.is_fully_replicated:
        return np.asarray(arr)
    return _local_rows(arr, batch_axis)[0]


def broadcast_tree(tree):
    """Process 0's values for every leaf, on every process, as host numpy.

    Bit-exact insurance for checkpoint restores: all processes restore the
    same shared-filesystem files, but this guarantees identical bits even
    if storage replicas diverge.  Leaves travel as raw bytes (uint8 views)
    so float64 history / int64 counters survive the x64-disabled device
    transport exactly; zero-size leaves pass through locally (they are
    zeros by construction — utils/checkpoint.py placeholders them).
    Every process must call this with an identically-structured tree.
    """
    if jax.process_count() == 1:
        return jax.tree.map(np.asarray, tree)
    from jax.experimental import multihost_utils

    leaves, treedef = jax.tree.flatten(tree)
    meta, payload, idx = [], [], []
    for i, l in enumerate(leaves):
        a = np.asarray(l)
        meta.append((a.shape, a.dtype))  # BEFORE ascontiguousarray: it
        leaves[i] = a                    # promotes 0-d arrays to (1,)
        if a.size:
            idx.append(i)
            payload.append(np.ascontiguousarray(a).reshape(-1).view(np.uint8))
    sent = multihost_utils.broadcast_one_to_all(payload)
    for i, b in zip(idx, sent):
        shape, dtype = meta[i]
        leaves[i] = np.asarray(b, np.uint8).view(dtype).reshape(shape)
    return jax.tree.unflatten(treedef, leaves)


def sync(name: str = "sync") -> None:
    """Barrier across every process (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def shard_for_this_process() -> Optional[tuple]:
    """(process_id, process_count) for BatchLoader, or None single-process."""
    n = jax.process_count()
    return (jax.process_index(), n) if n > 1 else None


# allgathered row offsets depend only on (length, sharding) — identical
# for every batch of the same shape, so gather them once per layout
_OFFSETS_MEMO: dict = {}


def gather_rows_many(arrs, n_real: int):
    """Global per-sample values in the original (unpadded) batch order,
    for several identically-sharded [L] arrays in ONE allgather.

    Works for every layout the trainer produces: the loader's per-process
    chunk layout (real rows sit at their global index, padding occupies
    indices >= n_real), a full batch sharded over any data-axis size
    (identity mapping, possibly with overlapping replica shards across
    processes), and fully-replicated vectors.  Each process contributes
    its distinct rows WITH their global offsets; a scatter by offset
    reconstructs the [L] vector exactly (replicas write equal values),
    and ``[:n_real]`` drops the padding.
    """
    if jax.process_count() == 1:
        return [np.asarray(a)[:n_real] for a in arrs]
    a0 = arrs[0]
    if not isinstance(a0, jax.Array) or a0.is_fully_replicated:
        return [np.asarray(a)[:n_real] for a in arrs]
    from jax.experimental import multihost_utils

    cols, offs = [], None
    for a in arrs:
        v, offs = _local_rows(a)
        cols.append(v)
    vals = np.stack(cols, axis=-1)  # [m, k]
    key = (a0.shape[0], a0.sharding)
    goffs = _OFFSETS_MEMO.get(key)
    if goffs is None:
        goffs = np.asarray(multihost_utils.process_allgather(offs))
        _OFFSETS_MEMO[key] = goffs
    gvals = np.asarray(multihost_utils.process_allgather(vals))  # [nproc, m, k]
    out = np.zeros((a0.shape[0], len(arrs)), vals.dtype)
    out[goffs.reshape(-1)] = gvals.reshape(-1, len(arrs))
    return [out[:n_real, j] for j in range(len(arrs))]


def gather_rows(arr, n_real: int):
    """Global per-sample values in the original batch order (see
    :func:`gather_rows_many`)."""
    return gather_rows_many([arr], n_real)[0]


def any_flag(flag: bool) -> bool:
    """True iff ANY process passes True.

    A tiny collective so every process takes the same control-flow
    decision — e.g. the preemption stop: SIGTERM reaches each process at
    a different moment, and a process breaking out of the step loop
    alone would desynchronize the training collectives (the others would
    block forever in the next all-reduce).  Must be called by every
    process the same number of times.
    """
    if jax.process_count() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(np.asarray(flag, np.int32))
    return bool(np.asarray(flags).any())
