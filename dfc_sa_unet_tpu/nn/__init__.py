"""Flax layer library with PyTorch-parity numerics and naming discipline.

Layer/param naming mirrors the reference's module tree (dots replaced by
underscores, Sequential indices folded into the name, e.g. torch
``conv_branch.0.weight`` -> flax ``conv_branch_0 / kernel``) so that the
generic checkpoint converter (utils/torch_convert.py) is mechanical.
"""

from dfc_sa_unet_tpu.nn.layers import (
    Conv,
    ConvTranspose2x2,
    WSConv,
    BatchNorm,
    GroupNorm,
    LayerNorm,
    Dense,
    conv_kernel_init,
    torch_bias_init,
)

__all__ = [
    "Conv",
    "ConvTranspose2x2",
    "WSConv",
    "BatchNorm",
    "GroupNorm",
    "LayerNorm",
    "Dense",
    "conv_kernel_init",
    "torch_bias_init",
]
