"""ModelFactory — config-dict dispatch over the 12 model names.

Mirrors reference models/model_factory.py:74-186 (same names, same config
keys, same defaults) with two fixes the reference needs:
  * the package imports cleanly (reference models/__init__.py imports a
    module whose source is missing),
  * pretrained weights (``config['model']['pretrained_path']``, loaded by
    ``load_pretrained_variables`` / ``get_model_and_variables``, mirroring
    reference models/model_factory.py:50-72) may be either a Flax/Orbax
    checkpoint directory or a torch ``.pth`` (raw state_dict or trainer
    checkpoint) — converted on load.
"""

import math
from typing import Any, Mapping, Optional, Tuple

from flax import linen as nn


def _model_cfg(config: Mapping[str, Any]) -> Mapping[str, Any]:
    return config.get("model", config)


def create_model(config: Mapping[str, Any], dtype: Optional[Any] = None, use_pallas: bool = False, remat: bool = False) -> nn.Module:
    """Instantiate the Flax module named by ``config['model']['name']``."""
    m = _model_cfg(config)
    name = m["name"]
    # model.use_pallas in the YAML works like model.remat: config-driven
    # workflows get the fused kernels without the CLI flag.
    use_pallas = bool(use_pallas or m.get("use_pallas", False))
    in_channels = m.get("in_channels", 3)
    out_channels = m.get("out_channels", 1)
    features = tuple(m.get("features", [64, 128, 256, 512]))
    pool_size = m.get("pool_size", 8)
    qk_div = m.get("ablation_on_qk_channels", 8)

    if name == "UNet":
        from dfc_sa_unet_tpu.models.unet import UNet

        return UNet(
            in_channels=in_channels,
            out_channels=out_channels,
            bilinear=m.get("bilinear", False),
            dtype=dtype,
        )

    if name == "DFC-SA-Res-Block":
        from dfc_sa_unet_tpu.models.dfc_sa import UNetDFCSARes

        return UNetDFCSARes(
            in_channels=in_channels,
            out_channels=out_channels,
            features=features,
            pool_size=pool_size,
            qk_div=qk_div,
            use_pallas=use_pallas,
            remat=remat or m.get("remat", False),
            dtype=dtype,
        )

    if name in ("TransformerUNet", "TransUNet"):
        from dfc_sa_unet_tpu.models.transunet import TransUNet, get_r50_b16_config

        img_size_cfg = config.get("dataset", {}).get("img_size", [224, 224])
        img_size = img_size_cfg[0] if isinstance(img_size_cfg, (list, tuple)) else img_size_cfg
        vit_config = get_r50_b16_config()
        vit_config["n_classes"] = out_channels
        vit_config["patches_grid"] = (img_size // 16, img_size // 16)
        return TransUNet(
            config=vit_config, img_size=img_size, num_classes=out_channels,
            dtype=dtype, use_pallas=use_pallas,
            # transformer families take remat as a bool: every encoder
            # block / ResNet unit / decoder block rematerializes ('l12'
            # has no meaning outside the DFC skeleton)
            remat=bool(remat or m.get("remat", False)),
        )

    if name == "VisionTransformerSegmentation":
        from dfc_sa_unet_tpu.models.vit_seg import VisionTransformerForSegmentation

        patch_dim = m.get("patch_dim", 16)
        default_layers = (
            int(math.log2(patch_dim)) if patch_dim > 0 and (patch_dim & (patch_dim - 1) == 0) else 4
        )
        return VisionTransformerForSegmentation(
            img_dim=m.get("img_dim", 224),
            patch_dim=patch_dim,
            in_channels=in_channels,
            num_classes=out_channels,
            embed_dim=m.get("embed_dim", 768),
            num_layers=m.get("num_layers", 12),
            num_heads=m.get("num_heads", 12),
            mlp_dim=m.get("mlp_dim", 3072),
            dropout=m.get("dropout", 0.1),
            upsample_layers=m.get("segmentation_head_upsample_layers", default_layers),
            dtype=dtype,
            use_pallas=use_pallas,
            remat=bool(remat or m.get("remat", False)),
        )

    from dfc_sa_unet_tpu.models import ablations as ab

    ablation_map = {
        "UNet_Baseline": ab.UNetBaseline,
        "UNet_AttentionOnly": ab.UNetAttentionOnly,
        "UNet_AdditionFusion": ab.UNetAdditionFusion,
        "UNet_ConcatFusion": ab.UNetConcatFusion,
        "UNet_FullResAttention": ab.UNetFullResAttention,
        "UNet_EncoderOnlyDFC": ab.UNetEncoderOnlyDFC,
        "UNet_DecoderOnlyDFC": ab.UNetDecoderOnlyDFC,
        "UNet_BothStandardConv": ab.UNetBothStandardConv,
    }
    if name in ablation_map:
        return ablation_map[name](
            in_channels=in_channels,
            out_channels=out_channels,
            features=features,
            pool_size=pool_size,
            use_pallas=use_pallas,
            dtype=dtype,
        )

    raise ValueError(f"unsupported model name: {name!r}")


def load_variables(model: nn.Module, path: str, img_size=(224, 224), in_channels: int = 3):
    """Load model variables from ``path`` — an Orbax checkpoint directory
    (full trainer state, best_model weights, or bare variables) or a torch
    ``.pth`` (raw state_dict or reference trainer checkpoint, converted via
    utils/torch_convert.py).  Returns ``{'params':.., 'batch_stats':..}``.
    """
    import jax
    import jax.numpy as jnp

    path = str(path).replace("\\", "/")
    x = jnp.zeros((1, img_size[0], img_size[1], in_channels), jnp.float32)
    template = model.init(jax.random.key(0), x, train=False)
    if path.endswith(".pth") or path.endswith(".pt"):
        from dfc_sa_unet_tpu.utils.torch_convert import load_torch_checkpoint

        variables = load_torch_checkpoint(path, template)
    else:
        from dfc_sa_unet_tpu.utils import checkpoint as ckpt_util

        tree = ckpt_util.restore_pytree(path)
        if "params" not in tree:
            raise ValueError(f"checkpoint at {path} has no 'params'")
        variables = {"params": tree["params"]}
        if tree.get("batch_stats") is not None:
            variables["batch_stats"] = tree["batch_stats"]
    return jax.tree.map(jnp.asarray, variables)


def load_pretrained_variables(model: nn.Module, config: Mapping[str, Any]):
    """Load ``config['model']['pretrained_path']`` if set, else None.

    Mirrors reference models/model_factory.py:50-72 (the reference loads
    pretrained weights inside get_model; here model and variables are
    separate values, so this is the companion call).
    """
    path = _model_cfg(config).get("pretrained_path")
    if not path:
        return None
    img = config.get("dataset", {}).get("img_size", [224, 224])
    img_size = tuple(img) if isinstance(img, (list, tuple)) else (img, img)
    return load_variables(
        model, path, img_size=img_size, in_channels=_model_cfg(config).get("in_channels", 3)
    )


def get_model_and_variables(
    config: Mapping[str, Any], dtype=None, use_pallas: bool = False, remat: bool = False
) -> Tuple[nn.Module, Optional[Mapping[str, Any]]]:
    """(model, variables) where variables come from ``pretrained_path``
    (None when the config doesn't set one) — the closest analog of the
    reference's weight-loading ``ModelFactory.get_model``."""
    model = create_model(config, dtype=dtype, use_pallas=use_pallas, remat=remat)
    return model, load_pretrained_variables(model, config)


class ModelFactory:
    """API-compatible facade over ``create_model``.

    Usage (both reference styles, models/model_factory.py:14-72):
      * ``ModelFactory.get_model(config)``
      * ``ModelFactory(config).create_model()``
      * ``ModelFactory.get_model_and_variables(config)`` — also loads
        ``config['model']['pretrained_path']`` when present.
    """

    def __init__(self, config: Optional[Mapping[str, Any]] = None):
        self.config = config

    def create_model(self, config=None, dtype=None, use_pallas=False, remat=False):
        cfg = config or self.config
        if cfg is None:
            raise ValueError("a config must be provided")
        return create_model(cfg, dtype=dtype, use_pallas=use_pallas, remat=remat)

    @staticmethod
    def get_model(config, dtype=None, use_pallas=False, remat=False):
        return create_model(config, dtype=dtype, use_pallas=use_pallas, remat=remat)

    @staticmethod
    def get_model_and_variables(config, dtype=None, use_pallas=False, remat=False):
        return get_model_and_variables(config, dtype=dtype, use_pallas=use_pallas, remat=remat)
