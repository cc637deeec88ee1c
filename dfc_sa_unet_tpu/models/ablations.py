"""The four ablation families (8 model names), all over the shared skeleton.

Reference files:
  1. branches   — models/unet_dfc_sa_ablation_branches.py  (UNet_Baseline,
     UNet_AttentionOnly)
  2. fusion     — models/unet_dfc_sa_ablation_fusion.py    (UNet_AdditionFusion,
     UNet_ConcatFusion)
  3. attention  — models/unet_dfc_sa_ablation_attention.py (UNet_FullResAttention)
  4. placement  — models/unet_dfc_sa_ablation_placement.py (UNet_EncoderOnlyDFC,
     UNet_DecoderOnlyDFC, UNet_BothStandardConv)

The reference hand-rolls the same 4-level U-Net wiring in each file; here
every family is ~10 lines over ``unet_forward`` with the right block
factories (the bottleneck always follows the encoder factory, matching
all reference variants).
"""

from typing import Any, Optional, Sequence

from flax import linen as nn

from dfc_sa_unet_tpu.models.blocks import (
    AdditionFusionBlock,
    AttentionOnlyBlock,
    ConcatFusionBlock,
    DFCBlock,
    LocalOnlyBlock,
    unet_forward,
)


class _AblationUNet(nn.Module):
    """Base: a U-Net with independently chosen encoder/decoder block kinds."""

    in_channels: int = 3
    out_channels: int = 1
    features: Sequence[int] = (64, 128, 256, 512)
    pool_size: int = 8
    use_pallas: bool = False
    dtype: Optional[Any] = None

    enc_kind: str = "local"
    dec_kind: str = "local"

    def _factory(self, kind: str):
        def make(f, name):
            if kind == "local":
                return LocalOnlyBlock(features=f, name=name, dtype=self.dtype)
            if kind == "attention":
                return AttentionOnlyBlock(
                    features=f, pool_size=self.pool_size, use_pallas=self.use_pallas,
                    name=name, dtype=self.dtype,
                )
            if kind == "addition":
                return AdditionFusionBlock(
                    features=f, pool_size=self.pool_size, use_pallas=self.use_pallas,
                    name=name, dtype=self.dtype,
                )
            if kind == "concat":
                return ConcatFusionBlock(
                    features=f, pool_size=self.pool_size, use_pallas=self.use_pallas,
                    name=name, dtype=self.dtype,
                )
            if kind == "dfc":
                return DFCBlock(
                    features=f, pool_size=self.pool_size, qk_div=8,
                    use_pallas=self.use_pallas, name=name, dtype=self.dtype,
                )
            if kind == "dfc_fullres":
                return DFCBlock(
                    features=f, full_res=True, qk_div=8,
                    name=name, dtype=self.dtype,
                )
            raise ValueError(f"unknown block kind: {kind}")

        return make

    @nn.compact
    def __call__(self, x, train: bool = False):
        return unet_forward(
            x,
            train,
            features=self.features,
            out_channels=self.out_channels,
            enc_factory=self._factory(self.enc_kind),
            dec_factory=self._factory(self.dec_kind),
            dtype=self.dtype,
        )


class UNetBaseline(_AblationUNet):
    """Ablation 1(b): local-only blocks everywhere."""
    enc_kind: str = "local"
    dec_kind: str = "local"


class UNetAttentionOnly(_AblationUNet):
    """Ablation 1(a): attention-only blocks everywhere."""
    enc_kind: str = "attention"
    dec_kind: str = "attention"


class UNetAdditionFusion(_AblationUNet):
    """Ablation 2(a): local+attn addition fusion everywhere."""
    enc_kind: str = "addition"
    dec_kind: str = "addition"


class UNetConcatFusion(_AblationUNet):
    """Ablation 2(b): concat + 1x1 fusion everywhere."""
    enc_kind: str = "concat"
    dec_kind: str = "concat"


class UNetFullResAttention(_AblationUNet):
    """Ablation 3: DFC blocks with full-resolution attention everywhere."""
    enc_kind: str = "dfc_fullres"
    dec_kind: str = "dfc_fullres"


class UNetEncoderOnlyDFC(_AblationUNet):
    """Ablation 4(a): DFC encoder+bottleneck, local-only decoder."""
    enc_kind: str = "dfc"
    dec_kind: str = "local"


class UNetDecoderOnlyDFC(_AblationUNet):
    """Ablation 4(b): local-only encoder+bottleneck, DFC decoder."""
    enc_kind: str = "local"
    dec_kind: str = "dfc"


class UNetBothStandardConv(_AblationUNet):
    """Ablation 4(c): local-only everywhere (same as baseline; kept as a
    distinct factory name for config parity)."""
    enc_kind: str = "local"
    dec_kind: str = "local"
