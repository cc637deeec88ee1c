"""Full-model numerical parity vs the PyTorch reference.

For each factory name we build the reference torch model (imported from
the read-only reference checkout), convert its random-initialized
state_dict with the generic converter, and require the Flax model to
reproduce the torch logits on the same input.  This is the Dice/IoU
parity gate of BASELINE.md reduced to its root cause: identical forward
math.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.models.factory import create_model
from dfc_sa_unet_tpu.utils.torch_convert import torch_state_dict_to_variables

from tests._reference import load_ref_module, require_reference

TOL = dict(atol=5e-4, rtol=1e-3)  # f32 end-to-end through 9 blocks


def _parity_check(ref_model, config, x_nchw, train=False, tol=TOL):
    ref_model.eval()
    with torch.no_grad():
        want = ref_model(torch.from_numpy(x_nchw)).numpy()

    mdl = create_model(config)
    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    template = mdl.init(jax.random.key(0), x, train=False)
    variables = torch_state_dict_to_variables(ref_model.state_dict(), template)
    variables = jax.tree.map(jnp.asarray, variables)
    got = mdl.apply(variables, x, train=train)
    got_nchw = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got_nchw, want, **tol)


def test_unet_dfc_sa_res_parity():
    require_reference()
    ref = load_ref_module("unet_dfc_sa_res")
    torch.manual_seed(0)
    model = ref.UNetDFCSARes(in_channels=3, out_channels=1, features=[64, 128, 256, 512], pool_size=8)
    x = np.random.default_rng(0).standard_normal((2, 3, 64, 64)).astype(np.float32)
    cfg = {"model": {"name": "DFC-SA-Res-Block", "in_channels": 3, "out_channels": 1,
                     "features": [64, 128, 256, 512], "pool_size": 8}}
    _parity_check(model, cfg, x)


def test_unet_dfc_sa_res_parity_odd_size():
    """Exercises the shape-fix bilinear path (reference
    models/unet_dfc_sa_res.py:180-199) with a non-multiple-of-16 input."""
    require_reference()
    ref = load_ref_module("unet_dfc_sa_res")
    torch.manual_seed(1)
    model = ref.UNetDFCSARes(features=[8, 16, 24, 32], pool_size=4)
    x = np.random.default_rng(1).standard_normal((1, 3, 50, 44)).astype(np.float32)
    cfg = {"model": {"name": "DFC-SA-Res-Block", "features": [8, 16, 24, 32], "pool_size": 4}}
    _parity_check(model, cfg, x)


def test_unet_parity():
    require_reference()
    ref = load_ref_module("unet")
    torch.manual_seed(2)
    model = ref.UNet(n_channels=3, n_classes=1, bilinear=False)
    x = np.random.default_rng(2).standard_normal((1, 3, 64, 64)).astype(np.float32)
    cfg = {"model": {"name": "UNet", "bilinear": False}}
    _parity_check(model, cfg, x)


def test_unet_bilinear_parity_odd_size():
    require_reference()
    ref = load_ref_module("unet")
    torch.manual_seed(3)
    model = ref.UNet(n_channels=3, n_classes=1, bilinear=True)
    x = np.random.default_rng(3).standard_normal((1, 3, 75, 75)).astype(np.float32)
    cfg = {"model": {"name": "UNet", "bilinear": True}}
    _parity_check(model, cfg, x)


@pytest.mark.parametrize(
    "ref_file,ref_cls,name",
    [
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
def test_ablation_parity(ref_file, ref_cls, name):
    require_reference()
    ref = load_ref_module(ref_file)
    torch.manual_seed(4)
    kwargs = dict(in_channels=3, out_channels=1, features=[8, 16, 24, 32])
    model = getattr(ref, ref_cls)(**kwargs)
    x = np.random.default_rng(4).standard_normal((1, 3, 48, 48)).astype(np.float32)
    cfg = {"model": {"name": name, "features": [8, 16, 24, 32], "pool_size": 8}}
    _parity_check(model, cfg, x)
