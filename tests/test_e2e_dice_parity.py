"""North-star gate (BASELINE.md): Dice/IoU parity <= 1e-3 vs the PyTorch
reference, end to end — torch checkpoint -> converter -> our Predictor ->
metrics, compared against the same checkpoint evaluated in torch with the
reference's own metric formulas."""

import pytest

import numpy as np
import torch

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.data.synthetic import generate
from dfc_sa_unet_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
from dfc_sa_unet_tpu.infer.predictor import Predictor
from dfc_sa_unet_tpu.metrics import metrics_from_counts
from dfc_sa_unet_tpu.models.factory import create_model
from dfc_sa_unet_tpu.utils.torch_convert import torch_state_dict_to_variables

from tests._reference import load_ref_module, require_reference

pytestmark = pytest.mark.slow  # >60s on the CPU conftest; run with -m 'slow or not slow'


def test_end_to_end_dice_iou_parity(tmp_path):
    require_reference()
    ref = load_ref_module("unet_dfc_sa_res")
    torch.manual_seed(11)
    tmodel = ref.UNetDFCSARes(features=[8, 16, 24, 32], pool_size=4)
    tmodel.eval()

    root = generate(str(tmp_path / "d"), n=6, size=64, seed=7)
    from dfc_sa_unet_tpu.data.dataset import SegmentationDataset
    from dfc_sa_unet_tpu.data.transforms import build_transforms

    ds = SegmentationDataset(root, build_transforms((64, 64), augment=False), (64, 64))

    cfg = {"model": {"name": "DFC-SA-Res-Block", "features": [8, 16, 24, 32], "pool_size": 4}}
    jmodel = create_model(cfg)
    template = jmodel.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
    variables = jax.tree.map(jnp.asarray, torch_state_dict_to_variables(tmodel.state_dict(), template))
    predictor = Predictor(jmodel, variables)

    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    totals_j = dict(tp=0, fp=0, fn=0, tn=0)
    totals_t = dict(tp=0, fp=0, fn=0, tn=0)
    for i in range(len(ds)):
        s = ds[i]
        gt = (s["mask"] >= 128).astype(np.uint8)
        # ours: uint8 -> device normalize -> forward -> sigmoid
        probs_j = predictor.predict_single(s["image"])
        # torch: same normalization, NCHW
        x = ((s["image"].astype(np.float32) / 255.0 - mean) / std).transpose(2, 0, 1)[None]
        with torch.no_grad():
            probs_t = torch.sigmoid(tmodel(torch.from_numpy(x)))[0, 0].numpy()
        pb_j = (probs_j > 0.5).astype(np.uint8)
        pb_t = (probs_t > 0.5).astype(np.uint8)
        for tot, pb in ((totals_j, pb_j), (totals_t, pb_t)):
            tp = int(np.sum(pb * gt)); fp = int(pb.sum()) - tp; fn = int(gt.sum()) - tp
            tot["tp"] += tp; tot["fp"] += fp; tot["fn"] += fn
            tot["tn"] += pb.size - tp - fp - fn
        # probability maps themselves must agree tightly
        np.testing.assert_allclose(probs_j, probs_t, atol=1e-4)

    mj = metrics_from_counts(**totals_j)
    mt = metrics_from_counts(**totals_t)
    assert abs(mj["dice_f1"] - mt["dice_f1"]) <= 1e-3, (mj, mt)
    assert abs(mj["iou"] - mt["iou"]) <= 1e-3, (mj, mt)
