"""Evaluation metrics — exact ports of reference utils/metrics.py:178-264
and inference.py:73-91, all jittable and device-resident.

Unlike the reference (which re-instantiates loss modules per call and
recomputes per-sample metrics on the host, utils/trainer.py:229-245),
everything here is vectorized: per-sample Dice/IoU come from one batched
reduction, so best/worst-K selection needs no per-sample host syncs.
"""

from typing import Any, Mapping, Optional

import jax.numpy as jnp

from dfc_sa_unet_tpu.losses import compute_loss


def dice_coefficient(pred: jnp.ndarray, target: jnp.ndarray, smooth: float = 1.0) -> jnp.ndarray:
    """Soft Dice, mean over (batch, channel) of per-image scores
    (reference utils/metrics.py:178-192).  NHWC input."""
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    inter = jnp.sum(p * t, axis=(1, 2))
    denom = jnp.sum(p, axis=(1, 2)) + jnp.sum(t, axis=(1, 2))
    return jnp.mean((2.0 * inter + smooth) / (denom + smooth))


def iou_score(pred: jnp.ndarray, target: jnp.ndarray, smooth: float = 1.0) -> jnp.ndarray:
    """Soft IoU, mean over per-image scores (reference utils/metrics.py:194-209)."""
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    inter = jnp.sum(p * t, axis=(1, 2))
    union = jnp.sum(p, axis=(1, 2)) + jnp.sum(t, axis=(1, 2)) - inter
    return jnp.mean((inter + smooth) / (union + smooth))


def hard_dice_iou(pred: jnp.ndarray, target: jnp.ndarray, threshold: float = 0.5):
    """Hard (binarized) IoU and Dice from summed scalar counts
    (reference utils/metrics.py:227-236).  Returns (iou, dice)."""
    pb = (pred > threshold).astype(jnp.float32)
    t = target.astype(jnp.float32)
    inter = jnp.sum(pb * t)
    union = jnp.sum(pb + t) - inter
    iou = inter / (union + 1e-7)
    dice = 2.0 * inter / (jnp.sum(pb) + jnp.sum(t) + 1e-7)
    return iou, dice


def per_sample_hard_dice_iou(pred: jnp.ndarray, target: jnp.ndarray, threshold: float = 0.5):
    """Vectorized per-sample hard IoU/Dice — replaces the reference's
    per-sample recompute loop (utils/trainer.py:229-245).  NHWC input;
    returns two [B] arrays."""
    pb = (pred > threshold).astype(jnp.float32)
    t = target.astype(jnp.float32)
    axes = tuple(range(1, pred.ndim))
    inter = jnp.sum(pb * t, axis=axes)
    psum = jnp.sum(pb, axis=axes)
    tsum = jnp.sum(t, axis=axes)
    iou = inter / (psum + tsum - inter + 1e-7)
    dice = 2.0 * inter / (psum + tsum + 1e-7)
    return iou, dice


def calculate_metrics(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    loss_type: str = "dice",
    loss_params: Optional[Mapping[str, Any]] = None,
):
    """Loss + hard IoU + hard Dice dict (reference utils/metrics.py:211-264)."""
    iou, dice = hard_dice_iou(pred, target)
    loss = compute_loss(pred, target, loss_type, loss_params)
    return {"loss": loss, "iou": iou, "dice": dice}


def confusion_counts(pred_binary: jnp.ndarray, gt_binary: jnp.ndarray):
    """Raw TP/FP/FN/TN counts (reference inference.py:73-91).

    Integer counts, so data-parallel psum-reduced totals match the
    single-device numbers exactly.
    """
    p = (pred_binary > 0).astype(jnp.int32)
    g = (gt_binary > 0).astype(jnp.int32)
    tp = jnp.sum(p * g)
    fp = jnp.sum(p) - tp
    fn = jnp.sum(g) - tp
    tn = p.size - (tp + fp + fn)
    return {"tp": tp, "fp": fp, "fn": fn, "tn": tn}


def metrics_from_counts(tp, fp, fn, tn, eps: float = 1e-7):
    """IoU/Dice/Accuracy/Recall/Precision from raw counts
    (reference inference.py:317-321, 349-353)."""
    tp = float(tp); fp = float(fp); fn = float(fn); tn = float(tn)
    return {
        "iou": tp / (tp + fp + fn + eps),
        "dice_f1": (2.0 * tp) / (2.0 * tp + fp + fn + eps),
        "accuracy": (tp + tn) / (tp + tn + fp + fn + eps),
        "recall": tp / (tp + fn + eps),
        "precision": tp / (tp + fp + eps),
    }
