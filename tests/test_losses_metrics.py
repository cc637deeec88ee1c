"""Parity tests: losses and metrics vs reference utils/metrics.py."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from dfc_sa_unet_tpu import losses as L
from dfc_sa_unet_tpu import metrics as M

from tests._reference import load_ref_utils, require_reference


@pytest.fixture(scope="module")
def ref_metrics():
    require_reference()
    return load_ref_utils("metrics")


def _probs(shape, seed):
    rng = np.random.default_rng(seed)
    return rng.uniform(0.01, 0.99, size=shape).astype(np.float32)


def _mask(shape, seed):
    rng = np.random.default_rng(seed)
    return (rng.uniform(size=shape) > 0.6).astype(np.float32)


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def test_dice_loss(ref_metrics):
    p, t = _probs((2, 9, 9, 1), 0), _mask((2, 9, 9, 1), 1)
    want = ref_metrics.dice_loss(_nchw(p), _nchw(t)).item()
    got = float(L.dice_loss(jnp.asarray(p), jnp.asarray(t)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_tversky_loss(ref_metrics):
    p, t = _probs((2, 9, 9, 1), 2), _mask((2, 9, 9, 1), 3)
    want = ref_metrics.tversky_loss(_nchw(p), _nchw(t), alpha=0.7, beta=0.3).item()
    got = float(L.tversky_loss(jnp.asarray(p), jnp.asarray(t), alpha=0.7, beta=0.3))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_bce_dice_loss(ref_metrics):
    p, t = _probs((2, 17, 13, 1), 4), _mask((2, 17, 13, 1), 5)
    want = ref_metrics.BCEDiceLoss(0.5, 0.5)(_nchw(p), _nchw(t)).item()
    got = float(L.bce_dice_loss(jnp.asarray(p), jnp.asarray(t), 0.5, 0.5))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_joint_loss(ref_metrics):
    p, t = _probs((2, 16, 16, 1), 6), _mask((2, 16, 16, 1), 7)
    want = ref_metrics.JointLoss(0.4, 0.4, 0.2)(_nchw(p), _nchw(t)).item()
    got = float(L.joint_loss(jnp.asarray(p), jnp.asarray(t), 0.4, 0.4, 0.2))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_soft_dice_iou(ref_metrics):
    p, t = _probs((3, 11, 11, 1), 8), _mask((3, 11, 11, 1), 9)
    np.testing.assert_allclose(
        float(M.dice_coefficient(jnp.asarray(p), jnp.asarray(t))),
        ref_metrics.dice_coefficient(_nchw(p), _nchw(t)).item(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        float(M.iou_score(jnp.asarray(p), jnp.asarray(t))),
        ref_metrics.iou_score(_nchw(p), _nchw(t)).item(),
        atol=1e-6,
    )


@pytest.mark.parametrize("loss_type,params", [
    ("dice", {}),
    ("tversky", {"alpha": 0.7, "beta": 0.3}),
    ("bce_dice", {"weight_bce": 0.5, "weight_dice": 0.5}),
    ("joint", {"bce_weight": 1.0, "dice_weight": 1.0, "contour_weight": 0.5}),
])
def test_calculate_metrics(ref_metrics, loss_type, params):
    p, t = _probs((2, 14, 14, 1), 10), _mask((2, 14, 14, 1), 11)
    want = ref_metrics.calculate_metrics(_nchw(p), _nchw(t), loss_type, params)
    got = M.calculate_metrics(jnp.asarray(p), jnp.asarray(t), loss_type, params)
    np.testing.assert_allclose(float(got["loss"]), want["loss"].item(), atol=1e-5)
    np.testing.assert_allclose(float(got["iou"]), want["iou"], atol=1e-6)
    np.testing.assert_allclose(float(got["dice"]), want["dice"], atol=1e-6)


def test_bce_dice_accepts_config_spelling():
    """Reference defect #4: configs ship bce_weight/dice_weight under type
    'bce_dice' but the code reads weight_bce/weight_dice.  We honor both."""
    p, t = _probs((1, 8, 8, 1), 12), _mask((1, 8, 8, 1), 13)
    a = float(L.compute_loss(jnp.asarray(p), jnp.asarray(t), "bce_dice", {"bce_weight": 0.5, "dice_weight": 0.5}))
    b = float(L.compute_loss(jnp.asarray(p), jnp.asarray(t), "bce_dice", {"weight_bce": 0.5, "weight_dice": 0.5}))
    np.testing.assert_allclose(a, b, atol=0)


def test_confusion_counts_match_reference_inference():
    """vs reference inference.py:73-91 formula (computed with numpy)."""
    pred = (np.random.default_rng(14).uniform(size=(64, 64)) > 0.5).astype(np.uint8)
    gt = (np.random.default_rng(15).uniform(size=(64, 64)) > 0.4).astype(np.uint8)
    got = {k: int(v) for k, v in M.confusion_counts(jnp.asarray(pred), jnp.asarray(gt)).items()}
    tp = int(np.sum(pred * gt)); fp = int(pred.sum() - tp); fn = int(gt.sum() - tp)
    tn = pred.size - tp - fp - fn
    assert got == {"tp": tp, "fp": fp, "fn": fn, "tn": tn}


def test_per_sample_matches_global_on_batch_of_one():
    p, t = _probs((4, 10, 10, 1), 16), _mask((4, 10, 10, 1), 17)
    iou_v, dice_v = M.per_sample_hard_dice_iou(jnp.asarray(p), jnp.asarray(t))
    for i in range(4):
        iou_i, dice_i = M.hard_dice_iou(jnp.asarray(p[i : i + 1]), jnp.asarray(t[i : i + 1]))
        np.testing.assert_allclose(float(iou_v[i]), float(iou_i), atol=1e-6)
        np.testing.assert_allclose(float(dice_v[i]), float(dice_i), atol=1e-6)
