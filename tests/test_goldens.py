"""Golden regression: committed torch-reference outputs, no torch or
mounted reference needed at test time.

tests/goldens/*.npz hold converted weights + input + the PyTorch
reference's output, captured by scripts/capture_goldens.py while the
reference was mounted.  This pins the numerics of every factory model
forever, independent of the environment.  (Weights are stored float16;
the reference output was computed from the SAME f16-rounded values, so
the comparison is exact-precision f32 on both sides.)
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from dfc_sa_unet_tpu.models.factory import create_model

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
SMALL = {"features": [8, 16, 24, 32], "pool_size": 4}

# golden file -> model config (transunet_small builds the module directly)
CONFIGS = {
    "dfc_sa_res_small": {"name": "DFC-SA-Res-Block", **SMALL},
    "concat_fusion_small": {"name": "UNet_ConcatFusion", **SMALL},
    "addition_fusion_small": {"name": "UNet_AdditionFusion", **SMALL},
    "baseline_small": {"name": "UNet_Baseline", **SMALL},
    "attention_only_small": {"name": "UNet_AttentionOnly", **SMALL},
    "full_res_attention_small": {"name": "UNet_FullResAttention", **SMALL},
    "encoder_only_small": {"name": "UNet_EncoderOnlyDFC", **SMALL},
    "decoder_only_small": {"name": "UNet_DecoderOnlyDFC", **SMALL},
    "both_standard_small": {"name": "UNet_BothStandardConv", **SMALL},
    "unet": {"name": "UNet", "bilinear": False},
    "vit_seg_small": {"name": "VisionTransformerSegmentation", "img_dim": 32, "patch_dim": 8,
                      "in_channels": 3, "out_channels": 1, "embed_dim": 32, "num_layers": 1,
                      "num_heads": 2, "mlp_dim": 64, "dropout": 0.0},
}


def _build(name):
    if name == "transunet_small":
        from dfc_sa_unet_tpu.models.transunet import TransUNet

        return TransUNet(
            config={
                "patches_grid": (4, 4), "resnet_num_layers": (1, 1, 1),
                "resnet_width_factor": 1, "hidden_size": 64, "mlp_dim": 128,
                "num_heads": 2, "num_layers": 1, "attention_dropout_rate": 0.0,
                "dropout_rate": 0.0, "decoder_channels": (32, 16, 8, 8),
                "skip_channels": [512, 256, 64, 16], "n_classes": 1, "n_skip": 3,
            },
            img_size=64, num_classes=1,
        )
    return create_model({"model": CONFIGS[name]})


def _unflatten(flat):
    params, stats = {}, {}
    for key, val in flat.items():
        if key.startswith("__"):
            continue
        coll, path = key.split("::", 1)
        node = params if coll == "params" else stats
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val, jnp.float32)
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    return variables


ALL_GOLDENS = sorted(CONFIGS) + ["transunet_small"]


@pytest.mark.parametrize("name", ALL_GOLDENS)
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.fail(f"missing golden fixture {path} — run scripts/capture_goldens.py")
    g = np.load(path)
    flat = {k: g[k] for k in g.files}
    variables = _unflatten(flat)
    x = jnp.asarray(np.transpose(flat["__input__"], (0, 2, 3, 1)), jnp.float32)
    want = flat["__output__"]
    got = _build(name).apply(variables, x, train=False)
    got_nchw = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got_nchw, want, atol=5e-4, rtol=1e-3)
