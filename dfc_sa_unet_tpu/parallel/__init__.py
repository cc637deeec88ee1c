from dfc_sa_unet_tpu.parallel.mesh import (
    data_parallel_mesh,
    replicate,
    serving_mesh,
    shard_batch,
)

__all__ = ["data_parallel_mesh", "replicate", "serving_mesh", "shard_batch"]
