"""Numerical parity for the transformer families (ViT-Seg, TransUNet)."""

import pytest

import numpy as np
import torch

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.models.factory import create_model
from dfc_sa_unet_tpu.models.transunet import TransUNet, get_r50_b16_config
from dfc_sa_unet_tpu.utils.torch_convert import torch_state_dict_to_variables

from tests._reference import load_ref_module, require_reference

pytestmark = pytest.mark.slow  # >60s on the CPU conftest; run with -m 'slow or not slow'

TOL = dict(atol=1e-3, rtol=1e-3)


def _run_flax(mdl, variables, x_nchw):
    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    got = mdl.apply(variables, x, train=False)
    return np.transpose(np.asarray(got), (0, 3, 1, 2))


def test_vit_seg_parity():
    require_reference()
    ref = load_ref_module("vision_transformer")
    torch.manual_seed(0)
    kwargs = dict(
        img_dim=64, patch_dim=16, in_channels=3, num_classes=1,
        embed_dim=32, num_layers=2, num_heads=4, mlp_dim=64, dropout=0.1,
        segmentation_head_upsample_layers=4,
    )
    tm = ref.VisionTransformerForSegmentation(**kwargs)
    tm.eval()
    x_nchw = np.random.default_rng(0).standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x_nchw)).numpy()

    cfg = {"model": {
        "name": "VisionTransformerSegmentation", "in_channels": 3, "out_channels": 1,
        "img_dim": 64, "patch_dim": 16, "embed_dim": 32, "num_layers": 2,
        "num_heads": 4, "mlp_dim": 64, "dropout": 0.1,
    }}
    mdl = create_model(cfg)
    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    template = mdl.init(jax.random.key(0), x, train=False)
    variables = torch_state_dict_to_variables(tm.state_dict(), template)
    got = _run_flax(mdl, jax.tree.map(jnp.asarray, variables), x_nchw)
    np.testing.assert_allclose(got, want, **TOL)


def test_transunet_parity_small():
    require_reference()
    ref = load_ref_module("transformer_unet")
    torch.manual_seed(1)
    img_size = 112
    tcfg = ref.get_r50_b16_config()
    tcfg.patches.grid = (img_size // 16, img_size // 16)
    tcfg.resnet.num_layers = (1, 1, 1)
    tcfg.hidden_size = 96
    tcfg.transformer.mlp_dim = 128
    tcfg.transformer.num_heads = 12
    tcfg.transformer.num_layers = 2
    tcfg.n_classes = 1
    tm = ref.TransUNet(config=tcfg, img_size=img_size, num_classes=1)
    tm.eval()
    x_nchw = np.random.default_rng(1).standard_normal((1, 3, img_size, img_size)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x_nchw)).numpy()

    jcfg = get_r50_b16_config()
    jcfg.update(
        patches_grid=(img_size // 16, img_size // 16),
        resnet_num_layers=(1, 1, 1),
        hidden_size=96,
        mlp_dim=128,
        num_heads=12,
        num_layers=2,
        n_classes=1,
    )
    mdl = TransUNet(config=jcfg, img_size=img_size, num_classes=1)
    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    template = mdl.init(jax.random.key(0), x, train=False)
    variables = torch_state_dict_to_variables(tm.state_dict(), template)
    got = _run_flax(mdl, jax.tree.map(jnp.asarray, variables), x_nchw)
    np.testing.assert_allclose(got, want, **TOL)


def test_transunet_single_channel_repeat():
    """1-channel input is repeated to 3 (reference transformer_unet.py:362-364)."""
    require_reference()
    jcfg = get_r50_b16_config()
    jcfg.update(
        patches_grid=(4, 4), resnet_num_layers=(1, 1, 1), hidden_size=96,
        mlp_dim=64, num_heads=4, num_layers=1, n_classes=1,
    )
    mdl = TransUNet(config=jcfg, img_size=64, num_classes=1)
    x = jnp.ones((1, 64, 64, 1), jnp.float32)
    variables = mdl.init(jax.random.key(0), x, train=False)
    y = mdl.apply(variables, x, train=False)
    assert y.shape == (1, 64, 64, 1)
