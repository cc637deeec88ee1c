"""Device-mesh utilities for data-parallel training over ICI.

The reference has no distributed support of any kind (SURVEY.md §2.4);
this module is the TPU-native replacement.  Strategy: GSPMD data
parallelism — batches carry a NamedSharding over a 1-D 'data' mesh and
params are replicated; XLA inserts the psum for gradients and the
cross-replica reductions for BatchNorm statistics automatically (both
ride ICI within a slice).  No NCCL/MPI analog is needed; the same jitted
step runs unchanged on 1 chip or N.

Models at this scale (<=105M params) never need TP/PP/SP — attention is
over at most 32^2 = 1024 pooled tokens (SURVEY.md §5 long-context) — so
a single 'data' axis is the whole parallelism story, by design.
"""

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(num_devices: Optional[int] = None, axis: str = "data",
                       devices=None) -> Mesh:
    """1-D mesh over the first ``num_devices`` visible devices (all by
    default), or over an explicit ``devices`` list — e.g.
    ``jax.local_devices()`` for per-process serving in a multi-host
    runtime, where each process drives its own chips independently."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis,))


def serving_mesh(spatial: int = 1, num_devices: Optional[int] = None,
                 devices=None) -> Mesh:
    """2-D ``('data', 'spatial')`` mesh for inference.

    ``spatial=1`` degenerates to pure data parallelism (every device holds
    whole images).  ``spatial>1`` additionally shards image ROWS across
    devices: XLA's SPMD partitioner inserts the halo ``collective-permute``s
    for the 3x3/stride convs and the ``all-reduce``s for the pooled
    attention's global average pooling automatically (measured on the
    flagship: sharded forward == single-device to f32 noise, 3e-8).  This
    serves ONE large image exactly — no sliding-window overlap seams
    (reference inference.py:104-153's tiling is an approximation) — across
    chips whose individual HBM the activation footprint would exceed.
    Image height must be divisible by ``spatial`` (the Predictor falls back
    to data-only sharding per offending shape otherwise).
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if spatial < 1 or n % spatial:
        raise ValueError(f"spatial={spatial} must divide the device count {n}")
    return Mesh(np.array(devices).reshape(n // spatial, spatial), ("data", "spatial"))


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Shard every array's leading (batch) dimension over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
