from dfc_sa_unet_tpu.parallel.mesh import (
    data_parallel_mesh,
    replicate,
    serving_mesh,
    shard_batch,
)
from dfc_sa_unet_tpu.parallel import multihost

__all__ = ["data_parallel_mesh", "replicate", "serving_mesh", "shard_batch",
           "multihost"]
