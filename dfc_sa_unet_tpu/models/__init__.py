"""Model zoo: all 12 factory names of the reference, TPU-native.

Families (reference models/model_factory.py:94-186):
  * 'UNet'                          — vanilla U-Net (models/unet.py)
  * 'DFC-SA-Res-Block'              — flagship UNetDFCSA(Res) (dfc_sa.py)
  * 'TransformerUNet' / 'TransUNet' — R50-ViT-B/16 TransUNet (transunet.py)
  * 'VisionTransformerSegmentation' — plain ViT segmenter (vit_seg.py)
  * ablations 1-4                   — 8 variants sharing the U-Net skeleton
"""

from dfc_sa_unet_tpu.models.factory import ModelFactory, create_model
from dfc_sa_unet_tpu.models.blocks import (
    DFCBlock,
    LightSelfAttention,
    LocalOnlyBlock,
    AttentionOnlyBlock,
    AdditionFusionBlock,
    ConcatFusionBlock,
)
from dfc_sa_unet_tpu.models.dfc_sa import UNetDFCSA, UNetDFCSARes
from dfc_sa_unet_tpu.models.unet import UNet

__all__ = [
    "ModelFactory",
    "create_model",
    "DFCBlock",
    "LightSelfAttention",
    "LocalOnlyBlock",
    "AttentionOnlyBlock",
    "AdditionFusionBlock",
    "ConcatFusionBlock",
    "UNetDFCSA",
    "UNetDFCSARes",
    "UNet",
]
