"""UNetDFCSA / UNetDFCSARes — the flagship model family.

Reference: models/unet_dfc_sa_res.py:118-220.  UNetDFCSARes is an empty
subclass of UNetDFCSA in the reference (inherits everything); we expose
both names for checkpoint/API parity.
"""

import functools
from typing import Any, Optional, Sequence

from flax import linen as nn

from dfc_sa_unet_tpu.models.blocks import DFCBlock, unet_forward


class UNetDFCSA(nn.Module):
    """4-level U-Net of DFC-SA blocks (encoder, bottleneck and decoder)."""

    in_channels: int = 3
    out_channels: int = 1
    features: Sequence[int] = (64, 128, 256, 512)
    pool_size: int = 8
    qk_div: int = 8  # reference 'ablation_on_qk_channels'
    use_pallas: bool = False
    remat: Any = False  # False | True/'all' | 'l12' (see blocks.unet_forward)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        block = functools.partial(
            DFCBlock,
            pool_size=self.pool_size,
            qk_div=self.qk_div,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
        )
        return unet_forward(
            x,
            train,
            features=self.features,
            out_channels=self.out_channels,
            enc_factory=lambda f, name: block(features=f, name=name),
            dec_factory=lambda f, name: block(features=f, name=name),
            dtype=self.dtype,
            remat=self.remat,
        )


class UNetDFCSARes(UNetDFCSA):
    """Alias of UNetDFCSA (reference models/unet_dfc_sa_res.py:207-220)."""
