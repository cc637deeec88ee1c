"""Flax -> PyTorch export (the reverse converter).

A checkpoint trained on TPU must flow back into the reference's torch
tooling: reference inference.py:222-229 loads raw state_dicts, and
models/model_factory.py:65-71 loads ``pretrained_path`` weights.  The
gold test is the round trip — reference state_dict -> Flax variables
(forward converter) -> state_dict again — which must reproduce every key
and tensor bit-exactly, plus a strict ``load_state_dict`` + forward
parity check for exports that originate from a Flax init (proving the
name-unfolding works from the Flax side alone, not just as an inverse).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.models.factory import create_model
from dfc_sa_unet_tpu.utils.torch_convert import (
    save_torch_checkpoint,
    torch_state_dict_to_variables,
    variables_to_torch_state_dict,
)

from tests._reference import load_ref_module, require_reference


def _round_trip_check(ref_model, mdl, x_nchw):
    """state_dict -> flax -> state_dict must be exact; the export must
    strict-load into a fresh reference model and reproduce the logits."""
    sd = ref_model.state_dict()

    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    template = mdl.init(jax.random.key(0), x, train=False)
    variables = torch_state_dict_to_variables(sd, template)
    back = variables_to_torch_state_dict(variables)

    assert set(back) == set(sd.keys()), (
        sorted(set(sd.keys()) ^ set(back)))
    for k, want in sd.items():
        if k.endswith("num_batches_tracked"):
            continue  # we emit 0; torch only needs the key present
        np.testing.assert_array_equal(
            back[k], want.detach().numpy().astype(np.float32), err_msg=k)

    missing, unexpected = ref_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in back.items()},
        strict=True,
    )
    assert not missing and not unexpected


def test_square_2d_custom_param_round_trips_untransposed():
    """The forward converter transposes a 2-D custom (non-kernel) leaf
    ONLY when the template shape demands it — a square matrix never
    trips that test and is stored in torch orientation.  The reverse
    must apply exactly the inverse rule (transpose non-square only): an
    unconditional a.T would silently export a square table transposed
    (shapes still match, strict load succeeds, values wrong)."""
    rng = np.random.default_rng(3)
    square = rng.standard_normal((4, 4)).astype(np.float32)   # e.g. a rel-pos table
    nonsq = rng.standard_normal((12, 4)).astype(np.float32)   # e.g. in_proj_weight
    sd = {"blk.table": torch.from_numpy(square),
          "blk.in_proj_weight": torch.from_numpy(nonsq)}
    template = {"params": {"blk": {"table": np.zeros((4, 4), np.float32),
                                   "in_proj_weight": np.zeros((4, 12), np.float32)}}}
    variables = torch_state_dict_to_variables(sd, template)
    np.testing.assert_array_equal(variables["params"]["blk"]["table"], square)
    np.testing.assert_array_equal(variables["params"]["blk"]["in_proj_weight"], nonsq.T)
    back = variables_to_torch_state_dict(variables)
    np.testing.assert_array_equal(back["blk.table"], square)
    np.testing.assert_array_equal(back["blk.in_proj_weight"], nonsq)


def test_round_trip_dfc_flagship_small():
    require_reference()
    ref = load_ref_module("unet_dfc_sa_res")
    torch.manual_seed(0)
    model = ref.UNetDFCSARes(features=[8, 16, 24, 32], pool_size=4)
    x = np.random.default_rng(0).standard_normal((1, 3, 32, 32)).astype(np.float32)
    cfg = {"model": {"name": "DFC-SA-Res-Block", "features": [8, 16, 24, 32], "pool_size": 4}}
    _round_trip_check(model, create_model(cfg), x)


@pytest.mark.parametrize(
    "ref_file,ref_cls,name",
    [
        ("unet", "UNet", "UNet"),
        ("unet_dfc_sa_ablation_branches", "UNet_Baseline", "UNet_Baseline"),
        ("unet_dfc_sa_ablation_branches", "UNet_AttentionOnly", "UNet_AttentionOnly"),
        ("unet_dfc_sa_ablation_fusion", "UNet_AdditionFusion", "UNet_AdditionFusion"),
        ("unet_dfc_sa_ablation_fusion", "UNet_ConcatFusion", "UNet_ConcatFusion"),
        ("unet_dfc_sa_ablation_attention", "UNet_FullResAttention", "UNet_FullResAttention"),
        ("unet_dfc_sa_ablation_placement", "UNet_EncoderOnlyDFC", "UNet_EncoderOnlyDFC"),
        ("unet_dfc_sa_ablation_placement", "UNet_DecoderOnlyDFC", "UNet_DecoderOnlyDFC"),
        ("unet_dfc_sa_ablation_placement", "UNet_BothStandardConv", "UNet_BothStandardConv"),
    ],
)
def test_round_trip_all_conv_families(ref_file, ref_cls, name):
    require_reference()
    ref = load_ref_module(ref_file)
    torch.manual_seed(1)
    if ref_cls == "UNet":
        model = ref.UNet(n_channels=3, n_classes=1, bilinear=False)
        cfg = {"model": {"name": name, "bilinear": False}}
    else:
        model = getattr(ref, ref_cls)(in_channels=3, out_channels=1, features=[8, 16, 24, 32])
        cfg = {"model": {"name": name, "features": [8, 16, 24, 32], "pool_size": 8}}
    x = np.random.default_rng(1).standard_normal((1, 3, 32, 32)).astype(np.float32)
    _round_trip_check(model, create_model(cfg), x)


def test_round_trip_vit_seg():
    require_reference()
    ref = load_ref_module("vision_transformer")
    torch.manual_seed(2)
    model = ref.VisionTransformerForSegmentation(
        img_dim=32, patch_dim=8, in_channels=3, num_classes=1,
        embed_dim=32, num_layers=2, num_heads=4, mlp_dim=64, dropout=0.1,
        segmentation_head_upsample_layers=3,
    )
    model.eval()
    cfg = {"model": {
        "name": "VisionTransformerSegmentation", "in_channels": 3, "out_channels": 1,
        "img_dim": 32, "patch_dim": 8, "embed_dim": 32, "num_layers": 2,
        "num_heads": 4, "mlp_dim": 64, "dropout": 0.1,
    }}
    x = np.random.default_rng(2).standard_normal((1, 3, 32, 32)).astype(np.float32)
    _round_trip_check(model, create_model(cfg), x)


def test_export_from_flax_init_strict_loads_and_matches(tmp_path):
    """Export a Flax-initialized model (no torch ancestry): the key
    unfolding must stand on its own, load strict into the reference
    module, and the torch forward must reproduce the Flax logits."""
    require_reference()
    ref = load_ref_module("unet_dfc_sa_res")
    cfg = {"model": {"name": "DFC-SA-Res-Block", "features": [8, 16, 24, 32], "pool_size": 4}}
    mdl = create_model(cfg)
    x_nchw = np.random.default_rng(3).standard_normal((1, 3, 32, 32)).astype(np.float32)
    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    variables = mdl.init(jax.random.key(7), x, train=False)
    want = np.transpose(np.asarray(mdl.apply(variables, x, train=False)), (0, 3, 1, 2))

    path = tmp_path / "exported.pth"
    save_torch_checkpoint(str(path), variables)
    sd = torch.load(str(path), map_location="cpu", weights_only=False)

    tm = ref.UNetDFCSARes(features=[8, 16, 24, 32], pool_size=4)
    missing, unexpected = tm.load_state_dict(sd, strict=True)
    assert not missing and not unexpected
    tm.eval()
    with torch.no_grad():
        got = tm(torch.from_numpy(x_nchw)).numpy()
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


@pytest.mark.slow
def test_round_trip_transunet_small():
    from dfc_sa_unet_tpu.models.transunet import TransUNet, get_r50_b16_config

    require_reference()
    ref = load_ref_module("transformer_unet")
    torch.manual_seed(4)
    img_size = 112
    tcfg = ref.get_r50_b16_config()
    tcfg.patches.grid = (img_size // 16, img_size // 16)
    tcfg.resnet.num_layers = (1, 1, 1)
    tcfg.hidden_size = 96
    tcfg.transformer.mlp_dim = 128
    tcfg.transformer.num_heads = 12
    tcfg.transformer.num_layers = 2
    tcfg.n_classes = 1
    model = ref.TransUNet(config=tcfg, img_size=img_size, num_classes=1)
    model.eval()

    jcfg = get_r50_b16_config()
    jcfg.update(
        patches_grid=(img_size // 16, img_size // 16), resnet_num_layers=(1, 1, 1),
        hidden_size=96, mlp_dim=128, num_heads=12, num_layers=2, n_classes=1,
    )
    mdl = TransUNet(config=jcfg, img_size=img_size, num_classes=1)
    x = np.random.default_rng(4).standard_normal((1, 3, img_size, img_size)).astype(np.float32)
    _round_trip_check(model, mdl, x)
