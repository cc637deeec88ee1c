"""Vanilla U-Net (reference models/unet.py:6-101).

DoubleConv / Down(ceil-mode MaxPool) / Up(bilinear align_corners=True or
ConvTranspose2d) / OutConv, channels 64..1024 (halved by factor=2 in the
decoder when bilinear).  Submodule names fold the reference's Sequential
indices (conv.0 -> conv_0, mpconv.1 -> mpconv_1) for the converter.
"""

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from dfc_sa_unet_tpu.nn.layers import BatchNorm, Conv, ConvTranspose2x2
from dfc_sa_unet_tpu.ops.pooling import max_pool
from dfc_sa_unet_tpu.ops.resize import resize_bilinear

Dtype = Any


class DoubleConv(nn.Module):
    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.features, 3, padding=1, name="conv_0", dtype=self.dtype)(x)
        y = BatchNorm(name="conv_1")(y, train)
        y = nn.relu(y)
        y = Conv(self.features, 3, padding=1, name="conv_3", dtype=self.dtype)(y)
        y = BatchNorm(name="conv_4")(y, train)
        return nn.relu(y)


class Down(nn.Module):
    """MaxPool2d(2, ceil_mode=True) + DoubleConv (reference models/unet.py:21-30)."""

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = max_pool(x, 2, 2, ceil_mode=True)
        return DoubleConv(self.features, name="mpconv_1", dtype=self.dtype)(y, train)


class Up(nn.Module):
    """Upsample + crop-to-match + skip concat + DoubleConv
    (reference models/unet.py:33-58).  Crop logic is resolved statically
    under jit (shapes are trace-time constants)."""

    features: int
    bilinear: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        if self.bilinear:
            h, w = x1.shape[1], x1.shape[2]
            x1 = resize_bilinear(x1, (2 * h, 2 * w), align_corners=True)
        else:
            x1 = ConvTranspose2x2(x1.shape[-1] // 2, name="up", dtype=self.dtype)(x1)
        dy = x2.shape[1] - x1.shape[1]
        dx = x2.shape[2] - x1.shape[2]
        if dy < 0 or dx < 0:
            x1 = x1[:, : x2.shape[1], : x2.shape[2], :]
        else:
            x2 = x2[:, dy // 2 : dy // 2 + x1.shape[1], dx // 2 : dx // 2 + x1.shape[2], :]
        x = jnp.concatenate([x2, x1], axis=-1)
        return DoubleConv(self.features, name="conv", dtype=self.dtype)(x, train)


class UNet(nn.Module):
    """Classic 4-level U-Net (factory name 'UNet')."""

    in_channels: int = 3
    out_channels: int = 1
    bilinear: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        factor = 2 if self.bilinear else 1
        x1 = DoubleConv(64, name="inc", dtype=self.dtype)(x, train)
        x2 = Down(128, name="down1", dtype=self.dtype)(x1, train)
        x3 = Down(256, name="down2", dtype=self.dtype)(x2, train)
        x4 = Down(512, name="down3", dtype=self.dtype)(x3, train)
        x5 = Down(1024 // factor, name="down4", dtype=self.dtype)(x4, train)
        y = Up(512 // factor, self.bilinear, name="up1", dtype=self.dtype)(x5, x4, train)
        y = Up(256 // factor, self.bilinear, name="up2", dtype=self.dtype)(y, x3, train)
        y = Up(128 // factor, self.bilinear, name="up3", dtype=self.dtype)(y, x2, train)
        y = Up(64, self.bilinear, name="up4", dtype=self.dtype)(y, x1, train)
        # reference OutConv wraps the 1x1 conv in a module named 'outc.conv'
        return _OutConv(self.out_channels, name="outc", dtype=self.dtype)(y)


class _OutConv(nn.Module):
    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return Conv(self.features, 1, name="conv", dtype=self.dtype)(x)
