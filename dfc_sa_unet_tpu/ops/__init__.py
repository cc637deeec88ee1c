"""TPU-native core ops with exact PyTorch-parity semantics.

Every op here is expressed as static-shape XLA-friendly math (mostly
matmuls that ride the MXU) rather than gather/scatter, and is verified
against the corresponding torch functional op in tests/test_ops_*.py.
"""

from dfc_sa_unet_tpu.ops.resize import resize_bilinear, bilinear_matrix
from dfc_sa_unet_tpu.ops.pooling import adaptive_avg_pool, max_pool, adaptive_pool_matrix
from dfc_sa_unet_tpu.ops.convt import conv_transpose_2x2
from dfc_sa_unet_tpu.ops.attention import pooled_self_attention, full_res_self_attention

__all__ = [
    "resize_bilinear",
    "bilinear_matrix",
    "adaptive_avg_pool",
    "adaptive_pool_matrix",
    "max_pool",
    "conv_transpose_2x2",
    "pooled_self_attention",
    "full_res_self_attention",
]
