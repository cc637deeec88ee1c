"""Plain ViT segmenter (reference models/vision_transformer.py:5-174).

PatchEmbedding (strided conv) + learned pos-emb + a stack of torch-style
*post-norm* TransformerEncoder layers (batch_first, exact GELU) + a
segmentation head of log2(patch_dim) ConvTranspose(k=2s, s, p=s/2)+BN+ReLU
stages and a final 1x1 conv, with a safety bilinear resize if the output
size mismatches.

The attention here IS scaled by 1/sqrt(head_dim) (torch MHA), unlike the
DFC pooled attention which is unscaled — both match their references.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dfc_sa_unet_tpu.nn.layers import (
    BatchNorm,
    Conv,
    ConvTranspose,
    Dense,
    LayerNorm,
)
from dfc_sa_unet_tpu.ops.resize import resize_bilinear

Dtype = Any


class PatchEmbedding(nn.Module):
    patch_dim: int
    embed_dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        y = Conv(
            self.embed_dim, self.patch_dim, stride=self.patch_dim, name="proj", dtype=self.dtype
        )(x)
        b, h, w, e = y.shape
        return y.reshape(b, h * w, e)


class TorchMultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention (batch_first self-attention) with the
    packed in_proj parameterization, so reference checkpoints map 1:1.

    Note torch initializes in_proj_weight with xavier_uniform and
    in_proj_bias with zeros; we match that for training-from-scratch parity.
    """

    num_heads: int
    dropout: float = 0.0
    dtype: Optional[Dtype] = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, e = x.shape
        nh = self.num_heads
        hd = e // nh

        def xavier_packed(key, shape, dtype=jnp.float32):
            # torch xavier_uniform on the (3E, E) tensor: bound sqrt(6/(3E+E)),
            # identical for our transposed (E, 3E) layout.
            bound = float(np.sqrt(6.0 / (shape[0] + shape[1])))
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        in_w = self.param("in_proj_weight", xavier_packed, (e, 3 * e), jnp.float32)
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,), jnp.float32)
        dtype = self.dtype or x.dtype
        qkv = (
            jnp.einsum(
                "bne,ef->bnf", x.astype(dtype), in_w.astype(dtype),
                # bf16 emits bf16 from the MXU (f32 output doubles the HBM
                # write + epilogue read — round-4 census); f32 stays exact
                preferred_element_type=jnp.float32 if dtype == jnp.float32 else None,
                precision=None if dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST,
            )
            + in_b
        )
        if self.use_pallas and not (train and self.dropout > 0.0):
            # fused VMEM-resident MHA: scores/softmax never reach HBM and
            # the head split/merge transposes disappear (PERF.md round 3).
            # Attention dropout is identity in eval mode, so the fused path
            # is exact there; training with dropout falls through to lax.
            from dfc_sa_unet_tpu.ops.pallas_attention import fused_mha

            out = fused_mha(qkv.astype(dtype), nh)
            return Dense(e, name="out_proj", dtype=self.dtype)(out)

        q, k, v = jnp.split(qkv.astype(dtype), 3, axis=-1)

        def heads(t):
            return t.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        scores = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k,
            preferred_element_type=jnp.float32, precision=None if dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST,
        ) / np.sqrt(hd)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dtype)
        attn = nn.Dropout(self.dropout)(attn, deterministic=not train)
        out = jnp.einsum(
            "bhnm,bhmd->bhnd", attn, v,
            preferred_element_type=jnp.float32, precision=None if dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST,
        ).astype(dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, e)
        return Dense(e, name="out_proj", dtype=self.dtype)(out)


class TorchEncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer, post-norm (norm_first=False):
    x = norm1(x + dropout(SA(x))); x = norm2(x + dropout(FF(x)))."""

    num_heads: int
    mlp_dim: int
    dropout: float = 0.1
    dtype: Optional[Dtype] = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        sa = TorchMultiheadAttention(
            self.num_heads, dropout=self.dropout, name="self_attn", dtype=self.dtype,
            use_pallas=self.use_pallas,
        )(x, train)
        sa = nn.Dropout(self.dropout)(sa, deterministic=not train)
        x = LayerNorm(name="norm1")(x + sa)
        h = Dense(self.mlp_dim, name="linear1", dtype=self.dtype)(x)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(h.dtype)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        h = Dense(x.shape[-1], name="linear2", dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return LayerNorm(name="norm2")(x + h)


class _TransformerEncoder(nn.Module):
    num_layers: int
    num_heads: int
    mlp_dim: int
    dropout: float
    dtype: Optional[Dtype] = None
    use_pallas: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        def call_plain(mdl, h):
            return mdl(h, train)

        # prevent_cse=False: with the flax default (True), the backward's
        # recomputed dropout-mask RNG cannot CSE with the forward's, and
        # every recomputed u32 uniform stays live — measured +8 GB HBM at
        # ViT-B B=128 (24.2G vs 16.2G, i.e. remat made memory WORSE).
        # Outside lax.scan the marker is unnecessary (jax.checkpoint docs).
        call = nn.remat(call_plain, prevent_cse=False) if self.remat else call_plain
        for i in range(self.num_layers):
            x = call(TorchEncoderLayer(
                self.num_heads, self.mlp_dim, self.dropout, name=f"layers_{i}",
                dtype=self.dtype, use_pallas=self.use_pallas,
            ), x)
        return x


class VisionTransformerForSegmentation(nn.Module):
    """Factory name 'VisionTransformerSegmentation'."""

    img_dim: int = 224
    patch_dim: int = 16
    in_channels: int = 3
    num_classes: int = 1
    embed_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    dropout: float = 0.1
    upsample_layers: int = 4
    dtype: Optional[Dtype] = None
    use_pallas: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        assert h == self.img_dim and w == self.img_dim, (
            f"Input image size ({h}x{w}) doesn't match model ({self.img_dim}x{self.img_dim})."
        )
        feat = self.img_dim // self.patch_dim
        n = feat * feat

        y = PatchEmbedding(self.patch_dim, self.embed_dim, name="patch_embed", dtype=self.dtype)(x)
        pos = self.param(
            "pos_embed", nn.initializers.normal(1.0), (1, n, self.embed_dim), jnp.float32
        )
        y = y + pos
        y = nn.Dropout(self.dropout)(y, deterministic=not train)
        y = _TransformerEncoder(
            self.num_layers, self.num_heads, self.mlp_dim, self.dropout,
            name="transformer_encoder", dtype=self.dtype, use_pallas=self.use_pallas,
            remat=self.remat,
        )(y, train)

        y = y.reshape(b, feat, feat, self.embed_dim)

        # Segmentation head: ConvTranspose(k=4,s=2,p=1)+BN+ReLU stages, then 1x1.
        # Channel schedule mirrors reference models/vision_transformer.py:107-123.
        current = self.embed_dim
        for i in range(self.upsample_layers):
            out_ch = current // 2
            if out_ch < self.num_classes * 4 and i < self.upsample_layers - 1:
                out_ch = self.num_classes * 4 if self.num_classes * 4 < current else current // 2
            y = ConvTranspose(
                out_ch, kernel_size=4, stride=2, padding=1,
                name=f"segmentation_head_{3 * i}", dtype=self.dtype,
            )(y)
            y = BatchNorm(name=f"segmentation_head_{3 * i + 1}")(y, train)
            y = nn.relu(y)
            current = out_ch
        logits = Conv(
            self.num_classes, 1, name=f"segmentation_head_{3 * self.upsample_layers}", dtype=self.dtype
        )(y)
        if logits.shape[1:3] != (h, w):
            logits = resize_bilinear(logits, (h, w), align_corners=False)
        return logits
