"""Official-style TransUNet R50-ViT-B/16 (reference models/transformer_unet.py).

ResNetV2 hybrid backbone (weight-standardized convs + GroupNorm,
pre-activation bottlenecks, blocks (3,4,9)) -> patch embeddings + learned
pos-emb -> 12 pre-norm transformer blocks -> DecoderCup (conv_more +
4 bilinear-x2 decoder blocks with 3 skips) -> 3x3 segmentation head.
Single-channel inputs are repeated to 3 channels like the reference
(models/transformer_unet.py:362-364).
"""

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dfc_sa_unet_tpu.nn.layers import (
    BatchNorm,
    Conv,
    Dense,
    GroupNorm,
    LayerNorm,
    WSConv,
)
from dfc_sa_unet_tpu.ops.pooling import max_pool
from dfc_sa_unet_tpu.ops.resize import resize_bilinear

Dtype = Any


def get_r50_b16_config() -> Dict[str, Any]:
    """R50+ViT-B/16 hyperparameters (reference models/transformer_unet.py:318-342)."""
    return {
        "patches_grid": (14, 14),
        "resnet_num_layers": (3, 4, 9),
        "resnet_width_factor": 1,
        "hidden_size": 768,
        "mlp_dim": 3072,
        "num_heads": 12,
        "num_layers": 12,
        "attention_dropout_rate": 0.0,
        "dropout_rate": 0.1,
        "decoder_channels": (256, 128, 64, 16),
        "skip_channels": [512, 256, 64, 16],
        "n_classes": 9,
        "n_skip": 3,
    }


class PreActBottleneck(nn.Module):
    """Pre-activation bottleneck (reference models/transformer_unet.py:40-68).

    Quirk preserved: gn1/gn2/gn3 use eps=1e-6; gn_proj uses GroupNorm(cout,
    cout) with the torch default eps=1e-5 (per-channel instance norm).
    """

    cout: int
    cmid: int
    stride: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        residual = x
        if self.stride != 1 or cin != self.cout:
            residual = WSConv(self.cout, 1, stride=self.stride, name="downsample", dtype=self.dtype)(x)
            residual = GroupNorm(self.cout, eps=1e-5, name="gn_proj")(residual)
        y = WSConv(self.cmid, 1, name="conv1", dtype=self.dtype)(x)
        y = nn.relu(GroupNorm(32, eps=1e-6, name="gn1")(y))
        y = WSConv(self.cmid, 3, stride=self.stride, padding=1, name="conv2", dtype=self.dtype)(y)
        y = nn.relu(GroupNorm(32, eps=1e-6, name="gn2")(y))
        y = WSConv(self.cout, 1, name="conv3", dtype=self.dtype)(y)
        y = GroupNorm(32, eps=1e-6, name="gn3")(y)
        return nn.relu(residual + y)


class _Root(nn.Module):
    width: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        y = WSConv(self.width, 7, stride=2, padding=3, name="conv", dtype=self.dtype)(x)
        y = GroupNorm(32, eps=1e-6, name="gn")(y)
        return nn.relu(y)


class _ResBlock(nn.Module):
    units: int
    cout: int
    cmid: int
    first_stride: int
    dtype: Optional[Dtype] = None
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        def call_plain(mdl, h):
            return mdl(h)

        # prevent_cse=False: the CSE-prevention markers are only needed
        # under lax.scan; here they inflate HBM (see _Encoder's note).
        call = nn.remat(call_plain, prevent_cse=False) if self.remat else call_plain
        x = call(PreActBottleneck(
            self.cout, self.cmid, stride=self.first_stride, name="unit1", dtype=self.dtype
        ), x)
        for i in range(2, self.units + 1):
            x = call(PreActBottleneck(self.cout, self.cmid, name=f"unit{i}", dtype=self.dtype), x)
        return x


class _Body(nn.Module):
    """The three bottleneck stages, named block1..block3 to mirror the
    reference's ``body.blockN.unitM`` state_dict keys."""

    block_units: Sequence[int]
    width: int
    dtype: Optional[Dtype] = None
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        w = self.width
        feats = []
        x = _ResBlock(self.block_units[0], w * 4, w, 1, name="block1", dtype=self.dtype,
                      remat=self.remat)(x)
        feats.append(x)
        x = _ResBlock(self.block_units[1], w * 8, w * 2, 2, name="block2", dtype=self.dtype,
                      remat=self.remat)(x)
        feats.append(x)
        x = _ResBlock(self.block_units[2], w * 16, w * 4, 2, name="block3", dtype=self.dtype,
                      remat=self.remat)(x)
        return x, feats


class ResNetV2(nn.Module):
    """Hybrid backbone (reference models/transformer_unet.py:70-106).
    Returns (x, [block2_out, block1_out, root_out]) — skips high-res last."""

    block_units: Sequence[int] = (3, 4, 9)
    width_factor: int = 1
    dtype: Optional[Dtype] = None
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        w = int(64 * self.width_factor)
        y = _Root(w, name="root", dtype=self.dtype)(x)
        root_out = y
        y = max_pool(y, 3, 2, padding=1)
        y, (b1_out, b2_out) = _Body(self.block_units, w, name="body", dtype=self.dtype,
                                    remat=self.remat)(y)
        return y, [b2_out, b1_out, root_out]


class _Attention(nn.Module):
    """TransUNet attention (reference models/transformer_unet.py:116-157):
    separate q/k/v/out Linears, 1/sqrt(head_dim) scaling."""

    num_heads: int
    attn_dropout: float = 0.0
    dtype: Optional[Dtype] = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, e = x.shape
        nh = self.num_heads
        hd = e // nh
        dtype = self.dtype or x.dtype

        if self.use_pallas and not (train and self.attn_dropout > 0.0):
            # VMEM-resident fused MHA: the [B,h,N,N] scores/softmax never
            # reach HBM and the head split/merge transposes disappear
            # (PERF.md round 3).  Attention-weights dropout is identity in
            # eval mode; training with dropout uses the lax path below.
            from dfc_sa_unet_tpu.ops.pallas_attention import fused_mha_sep

            q = Dense(e, name="query", dtype=self.dtype)(x).astype(dtype)
            k = Dense(e, name="key", dtype=self.dtype)(x).astype(dtype)
            v = Dense(e, name="value", dtype=self.dtype)(x).astype(dtype)
            out = fused_mha_sep(q, k, v, nh)
            out = Dense(e, name="out", dtype=self.dtype)(out)
            return nn.Dropout(self.attn_dropout)(out, deterministic=not train)

        def heads(t):
            return t.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)

        q = heads(Dense(e, name="query", dtype=self.dtype)(x))
        k = heads(Dense(e, name="key", dtype=self.dtype)(x))
        v = heads(Dense(e, name="value", dtype=self.dtype)(x))
        scores = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k,
            preferred_element_type=jnp.float32, precision=None if dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST,
        ) / np.sqrt(hd)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
        attn = nn.Dropout(self.attn_dropout)(attn, deterministic=not train)
        out = jnp.einsum(
            "bhnm,bhmd->bhnd", attn, v,
            preferred_element_type=jnp.float32, precision=None if dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST,
        ).astype(q.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, e)
        out = Dense(e, name="out", dtype=self.dtype)(out)
        return nn.Dropout(self.attn_dropout)(out, deterministic=not train)


class _Mlp(nn.Module):
    mlp_dim: int
    dropout: float
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        e = x.shape[-1]
        y = Dense(self.mlp_dim, name="fc1", dtype=self.dtype)(x)
        y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(y.dtype)
        y = nn.Dropout(self.dropout)(y, deterministic=not train)
        y = Dense(e, name="fc2", dtype=self.dtype)(y)
        return nn.Dropout(self.dropout)(y, deterministic=not train)


class _VitBlock(nn.Module):
    """Pre-norm transformer block (reference models/transformer_unet.py:202-220)."""

    num_heads: int
    mlp_dim: int
    dropout: float
    attn_dropout: float
    dtype: Optional[Dtype] = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        y = LayerNorm(eps=1e-6, name="attention_norm")(x)
        y = _Attention(
            self.num_heads, self.attn_dropout, name="attn", dtype=self.dtype,
            use_pallas=self.use_pallas,
        )(y, train)
        x = y + h
        h = x
        y = LayerNorm(eps=1e-6, name="ffn_norm")(x)
        y = _Mlp(self.mlp_dim, self.dropout, name="ffn", dtype=self.dtype)(y, train)
        return y + h


class _Encoder(nn.Module):
    cfg: Dict[str, Any]
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
        for i in range(self.cfg["num_layers"]):
            x = call(_VitBlock(
                self.cfg["num_heads"], self.cfg["mlp_dim"], self.cfg["dropout_rate"],
                self.cfg["attention_dropout_rate"], name=f"layer_{i}", dtype=self.dtype,
                use_pallas=self.use_pallas,
            ), x)
        return LayerNorm(eps=1e-6, name="encoder_norm")(x)


class _Embeddings(nn.Module):
    cfg: Dict[str, Any]
    img_size: int
    dtype: Optional[Dtype] = None
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        grid = self.cfg["patches_grid"]
        patch = (self.img_size // 16 // grid[0], self.img_size // 16 // grid[1])
        n_patches = (self.img_size // 16) * (self.img_size // 16)
        y, features = ResNetV2(
            self.cfg["resnet_num_layers"], self.cfg["resnet_width_factor"],
            name="hybrid_model", dtype=self.dtype, remat=self.remat,
        )(x)
        y = Conv(
            self.cfg["hidden_size"], patch, stride=patch, name="patch_embeddings", dtype=self.dtype
        )(y)
        b, h, w, e = y.shape
        y = y.reshape(b, h * w, e)
        pos = self.param(
            "position_embeddings", nn.initializers.zeros, (1, n_patches, self.cfg["hidden_size"]),
            jnp.float32,
        )
        y = y + pos
        y = nn.Dropout(self.cfg["dropout_rate"])(y, deterministic=not train)
        return y, features


class _Transformer(nn.Module):
    cfg: Dict[str, Any]
    img_size: int
    dtype: Optional[Dtype] = None
    use_pallas: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        y, features = _Embeddings(self.cfg, self.img_size, name="embeddings", dtype=self.dtype,
                                  remat=self.remat)(x, train)
        y = _Encoder(self.cfg, name="encoder", dtype=self.dtype, use_pallas=self.use_pallas,
                     remat=self.remat)(y, train)
        return y, features


def _conv2d_relu(prefix: str, features: int, kernel: int, padding: int, dtype):
    def apply(x, train):
        y = Conv(features, kernel, padding=padding, use_bias=False, name=f"{prefix}_0", dtype=dtype)(x)
        y = BatchNorm(name=f"{prefix}_1")(y, train)
        return nn.relu(y)

    return apply


class _DecoderBlock(nn.Module):
    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        x = resize_bilinear(x, (2 * h, 2 * w), align_corners=True)  # UpsamplingBilinear2d
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        x = _conv2d_relu("conv1", self.features, 3, 1, self.dtype)(x, train)
        x = _conv2d_relu("conv2", self.features, 3, 1, self.dtype)(x, train)
        return x


class _DecoderCup(nn.Module):
    cfg: Dict[str, Any]
    dtype: Optional[Dtype] = None
    remat: bool = False

    @nn.compact
    def __call__(self, hidden_states, features=None, train: bool = False):
        b, n_patch, hidden = hidden_states.shape
        h = w = int(np.sqrt(n_patch))
        x = hidden_states.reshape(b, h, w, hidden)
        x = _conv2d_relu("conv_more", 512, 3, 1, self.dtype)(x, train)
        n_skip = self.cfg["n_skip"]

        def call_plain(mdl, a, s):
            return mdl(a, s, train)

        # prevent_cse=False: the CSE-prevention markers are only needed
        # under lax.scan; here they inflate HBM (see _Encoder's note).
        call = nn.remat(call_plain, prevent_cse=False) if self.remat else call_plain
        for i, out_ch in enumerate(self.cfg["decoder_channels"]):
            skip = features[i] if (features is not None and i < n_skip) else None
            x = call(_DecoderBlock(out_ch, name=f"blocks_{i}", dtype=self.dtype), x, skip)
        return x


class TransUNet(nn.Module):
    """Factory names 'TransformerUNet' / 'TransUNet'."""

    config: Dict[str, Any]
    img_size: int = 224
    num_classes: int = 9
    dtype: Optional[Dtype] = None
    use_pallas: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        y, features = _Transformer(
            self.config, self.img_size, name="transformer", dtype=self.dtype,
            use_pallas=self.use_pallas, remat=self.remat,
        )(x, train)
        y = _DecoderCup(self.config, name="decoder", dtype=self.dtype,
                        remat=self.remat)(y, features, train)
        logits = Conv(
            self.config["n_classes"], 3, padding=1, name="segmentation_head_0", dtype=self.dtype
        )(y)
        return logits
