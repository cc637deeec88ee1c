#!/usr/bin/env python
"""Capture golden parity fixtures for every factory model.

Runs with torch + the reference mounted (/root/reference); writes
tests/goldens/<name>.npz holding:
    params::<path>/<leaf>, batch_stats::<path>/<leaf>  (converted weights,
        stored float16 — the torch model is loaded with the SAME
        f16-rounded values, so parity against the stored output is exact)
    __input__   NCHW float32
    __output__  NCHW float32 (reference torch output, eval mode)

The committed fixtures make the 12-model parity suite runnable with no
torch and no mounted reference (tests/test_goldens.py).

    python scripts/capture_goldens.py [--only name1,name2] [--force]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import torch

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from dfc_sa_unet_tpu.models.factory import create_model  # noqa: E402
from dfc_sa_unet_tpu.utils.torch_convert import torch_state_dict_to_variables  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from _reference import load_ref_module  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "goldens")
SMALL = dict(features=[8, 16, 24, 32], pool_size=4)


def _small_transunet_ml_config():
    import ml_collections

    c = ml_collections.ConfigDict()
    c.patches = ml_collections.ConfigDict()
    c.patches.grid = (4, 4)  # 64x64 input / 16
    c.resnet = ml_collections.ConfigDict()
    c.resnet.num_layers = (1, 1, 1)
    c.resnet.width_factor = 1
    c.hidden_size = 64
    c.transformer = ml_collections.ConfigDict()
    c.transformer.mlp_dim = 128
    c.transformer.num_heads = 2
    c.transformer.num_layers = 1
    c.transformer.attention_dropout_rate = 0.0
    c.transformer.dropout_rate = 0.0
    c.classifier = "seg"
    c.decoder_channels = (32, 16, 8, 8)
    c.skip_channels = [512, 256, 64, 16]
    c.n_classes = 1
    c.n_skip = 3
    c.activation = "softmax"
    return c


def _small_transunet_cfg():
    return {
        "patches_grid": (4, 4),
        "resnet_num_layers": (1, 1, 1),
        "resnet_width_factor": 1,
        "hidden_size": 64,
        "mlp_dim": 128,
        "num_heads": 2,
        "num_layers": 1,
        "attention_dropout_rate": 0.0,
        "dropout_rate": 0.0,
        "decoder_channels": (32, 16, 8, 8),
        "skip_channels": [512, 256, 64, 16],
        "n_classes": 1,
        "n_skip": 3,
    }


def build_transunet_small():
    ref = load_ref_module("transformer_unet")
    torch.manual_seed(20)
    model = ref.TransUNet(_small_transunet_ml_config(), img_size=64, num_classes=1)

    from dfc_sa_unet_tpu.models.transunet import TransUNet

    flax_model = TransUNet(config=_small_transunet_cfg(), img_size=64, num_classes=1)
    return model, flax_model, (1, 3, 64, 64)


def build_vit_seg_small():
    ref = load_ref_module("vision_transformer")
    torch.manual_seed(21)
    model = ref.VisionTransformerForSegmentation(
        img_dim=32, patch_dim=8, in_channels=3, num_classes=1,
        embed_dim=32, num_layers=1, num_heads=2, mlp_dim=64, dropout=0.0,
        segmentation_head_upsample_layers=3,  # 2^3 == patch_dim
    )
    cfg = {"model": {"name": "VisionTransformerSegmentation", "img_dim": 32, "patch_dim": 8,
                     "in_channels": 3, "out_channels": 1, "embed_dim": 32, "num_layers": 1,
                     "num_heads": 2, "mlp_dim": 64, "dropout": 0.0,
                     "segmentation_head_upsample_layers": 3}}
    return model, create_model(cfg), (1, 3, 32, 32)


def _ablation(ref_file, cls, name, seed):
    def build():
        ref = load_ref_module(ref_file)
        torch.manual_seed(seed)
        model = getattr(ref, cls)(in_channels=3, out_channels=1, features=SMALL["features"])
        cfg = {"model": {"name": name, **SMALL, "in_channels": 3, "out_channels": 1}}
        return model, create_model(cfg), (1, 3, 48, 48)

    return build


def build_dfc_sa_res():
    ref = load_ref_module("unet_dfc_sa_res")
    torch.manual_seed(0)
    model = ref.UNetDFCSARes(in_channels=3, out_channels=1, **SMALL)
    cfg = {"model": {"name": "DFC-SA-Res-Block", **SMALL}}
    return model, create_model(cfg), (2, 3, 48, 48)


def build_unet():
    ref = load_ref_module("unet")
    torch.manual_seed(22)
    model = ref.UNet(n_channels=3, n_classes=1, bilinear=False)
    cfg = {"model": {"name": "UNet", "bilinear": False}}
    return model, create_model(cfg), (1, 3, 64, 64)


CASES = {
    "dfc_sa_res_small": build_dfc_sa_res,
    "concat_fusion_small": _ablation("unet_dfc_sa_ablation_fusion", "UNet_ConcatFusion",
                                     "UNet_ConcatFusion", 4),
    "addition_fusion_small": _ablation("unet_dfc_sa_ablation_fusion", "UNet_AdditionFusion",
                                       "UNet_AdditionFusion", 5),
    "baseline_small": _ablation("unet_dfc_sa_ablation_branches", "UNet_Baseline",
                                "UNet_Baseline", 6),
    "attention_only_small": _ablation("unet_dfc_sa_ablation_branches", "UNet_AttentionOnly",
                                      "UNet_AttentionOnly", 7),
    "full_res_attention_small": _ablation("unet_dfc_sa_ablation_attention", "UNet_FullResAttention",
                                          "UNet_FullResAttention", 8),
    "encoder_only_small": _ablation("unet_dfc_sa_ablation_placement", "UNet_EncoderOnlyDFC",
                                    "UNet_EncoderOnlyDFC", 9),
    "decoder_only_small": _ablation("unet_dfc_sa_ablation_placement", "UNet_DecoderOnlyDFC",
                                    "UNet_DecoderOnlyDFC", 10),
    "both_standard_small": _ablation("unet_dfc_sa_ablation_placement", "UNet_BothStandardConv",
                                     "UNet_BothStandardConv", 11),
    "unet": build_unet,
    "vit_seg_small": build_vit_seg_small,
    "transunet_small": build_transunet_small,
}


def _flatten(tree, coll, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, coll, prefix + (k,)))
        else:
            out[f"{coll}::{'/'.join(prefix + (k,))}"] = np.asarray(v)
    return out


def capture(name, build, force=False):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if os.path.exists(path) and not force:
        print(f"{name}: exists, skipping (--force to redo)")
        return
    ref_model, flax_model, in_shape = build()
    # quantize weights to f16 and load them BACK so the stored f16 weights
    # and the recorded output are exactly consistent
    sd = {k: v.detach().to(torch.float16).to(torch.float32) if v.is_floating_point() else v
          for k, v in ref_model.state_dict().items()}
    ref_model.load_state_dict(sd)
    ref_model.eval()
    import zlib

    x = np.random.default_rng(zlib.crc32(name.encode())).standard_normal(in_shape).astype(np.float32)
    with torch.no_grad():
        y = ref_model(torch.from_numpy(x)).numpy()

    template = flax_model.init(
        jax.random.key(0), jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False
    )
    variables = torch_state_dict_to_variables(ref_model.state_dict(), template)
    flat = _flatten(variables.get("params", {}), "params")
    flat.update(_flatten(variables.get("batch_stats", {}), "batch_stats"))
    flat = {k: v.astype(np.float16) for k, v in flat.items()}

    # self-check: flax on the stored (f16) weights reproduces the output
    vb = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32),
                      {"params": variables.get("params", {}),
                       "batch_stats": variables.get("batch_stats", {})})
    got = flax_model.apply(
        {k: v for k, v in vb.items() if v}, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False
    )
    err = float(np.max(np.abs(np.transpose(np.asarray(got), (0, 3, 1, 2)) - y)))
    size_mb = sum(a.nbytes for a in flat.values()) / 2**20

    np.savez_compressed(path, __input__=x, __output__=y, **flat)
    print(f"{name}: {in_shape} -> {y.shape}  maxerr={err:.2e}  weights={size_mb:.1f}MB  "
          f"file={os.path.getsize(path) / 2**20:.1f}MB")
    assert err < 5e-3, f"{name}: parity self-check failed ({err})"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default=None)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()
    names = args.only.split(",") if args.only else list(CASES)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in names:
        capture(name, CASES[name], force=args.force)


if __name__ == "__main__":
    main()
