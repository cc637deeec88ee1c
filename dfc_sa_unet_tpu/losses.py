"""Segmentation losses — exact ports of reference utils/metrics.py:6-176.

All functions are pure, jittable, and branch-free (the reference's
NaN-guard ``if`` statements become ``jnp.where`` selects so they compile
to one XLA graph).  Losses take **probabilities** (post-sigmoid), exactly
like the reference trainer applies sigmoid before computing the loss
(reference utils/trainer.py:124).

The ``bce_dice`` parameter-name trap of the reference (configs ship
``bce_weight/dice_weight`` but the code reads ``weight_bce/weight_dice``
and silently falls back to 1.0 — reference utils/metrics.py:246-248 vs
configs/config_dfc-sa-res-block.yaml:12-14) is fixed here: both spellings
are accepted.
"""

from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

_EPS_LOG = -100.0  # torch BCELoss clamps log terms at -100


def _mask_bt(x: jnp.ndarray, sample_mask) -> jnp.ndarray:
    """Zero out the padded samples of a [B, ...] tensor (mask is [B])."""
    if sample_mask is None:
        return x
    return x * sample_mask.astype(x.dtype).reshape(-1, *([1] * (x.ndim - 1)))


def _bce(p: jnp.ndarray, t: jnp.ndarray, sample_mask=None) -> jnp.ndarray:
    """torch.nn.BCELoss (mean reduction) on probabilities.

    With ``sample_mask`` ([B] of 0/1) the mean runs over the valid
    samples' pixels only — exactly the value an unpadded batch of just
    the valid samples would produce (used for sharded partial eval
    batches, train/trainer.py)."""
    p = p.astype(jnp.float32)
    t = t.astype(jnp.float32)
    # Endpoint-safe logs (double-where): at p == 0.0 / 1.0 exactly,
    # clip(log(p)) has the torch-clamped FORWARD value (-100) but a
    # 0 * (-inf) = NaN GRADIENT — one fully-confident pixel then NaNs the
    # whole gradient while the loss stays finite, permanently corrupting
    # params past the trainer's loss-finiteness skip guard (observed at
    # epoch 13 of the round-5 soak).  torch.nn.BCELoss clamps its
    # backward too (grad <-> (p-t)/max(p(1-p), eps)); matching robustness
    # here means zeroing the gradient at the exact endpoints.  Forward
    # values are bit-identical: the substituted branch only applies where
    # the clip already returned -100.
    at0 = p <= 0.0
    at1 = p >= 1.0
    log_p = jnp.where(at0, _EPS_LOG, jnp.clip(jnp.log(jnp.where(at0, 0.5, p)), _EPS_LOG))
    log_1p = jnp.where(at1, _EPS_LOG,
                       jnp.clip(jnp.log1p(-jnp.where(at1, 0.5, p)), _EPS_LOG))
    terms = t * log_p + (1.0 - t) * log_1p
    if sample_mask is None:
        return -jnp.mean(terms)
    w = jnp.broadcast_to(
        sample_mask.astype(jnp.float32).reshape(-1, *([1] * (terms.ndim - 1))), terms.shape
    )
    return -jnp.sum(terms * w) / jnp.maximum(jnp.sum(w), 1.0)


def dice_loss(
    pred: jnp.ndarray, target: jnp.ndarray, smooth: float = 1.0, sample_mask=None
) -> jnp.ndarray:
    """Soft Dice loss over the flattened batch (reference utils/metrics.py:6-24).

    Sum-based, so masked (zeroed) padding samples contribute nothing:
    the masked value equals the loss of the valid samples alone."""
    p = _mask_bt(pred.astype(jnp.float32), sample_mask).reshape(-1)
    t = _mask_bt(target.astype(jnp.float32), sample_mask).reshape(-1)
    inter = jnp.sum(p * t)
    return 1.0 - (2.0 * inter + smooth) / (jnp.sum(p) + jnp.sum(t) + smooth)


def tversky_loss(
    pred: jnp.ndarray, target: jnp.ndarray, alpha: float = 0.5, beta: float = 0.5,
    smooth: float = 1.0, sample_mask=None,
) -> jnp.ndarray:
    """Tversky loss (reference utils/metrics.py:26-50).  Sum-based: masked
    padding contributes 0 to tp/fp/fn (p=0 and t=0 zero every term)."""
    p = _mask_bt(pred.astype(jnp.float32), sample_mask).reshape(-1)
    t = _mask_bt(target.astype(jnp.float32), sample_mask).reshape(-1)
    tp = jnp.sum(p * t)
    fp = jnp.sum((1.0 - t) * p)
    fn = jnp.sum(t * (1.0 - p))
    return 1.0 - (tp + smooth) / (tp + alpha * fp + beta * fn + smooth)


def bce_dice_loss(
    pred: jnp.ndarray, target: jnp.ndarray, weight_bce: float = 1.0, weight_dice: float = 1.0,
    sample_mask=None,
) -> jnp.ndarray:
    """Weighted BCE(prob) + Dice (reference utils/metrics.py:52-78)."""
    return (weight_bce * _bce(pred, target, sample_mask)
            + weight_dice * dice_loss(pred, target, 1.0, sample_mask))


_LAPLACIAN = np.array(
    [[-1.0, -1.0, -1.0], [-1.0, 8.0, -1.0], [-1.0, -1.0, -1.0]], dtype=np.float32
).reshape(3, 3, 1, 1)


def _contour(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 Laplacian edge response, padding=1 (reference utils/metrics.py:109,151)."""
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        jnp.asarray(_LAPLACIAN),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )


def joint_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    bce_weight: float = 1.0,
    dice_weight: float = 1.0,
    contour_weight: float = 1.0,
    sample_mask=None,
) -> jnp.ndarray:
    """BCE + Dice + Laplacian contour penalty (reference utils/metrics.py:96-176).

    Faithful to the reference including its quirks: inputs are NaN-scrubbed
    and clamped to [1e-7, 1-1e-7]; the Dice term re-derives logits and
    re-applies sigmoid through a DiceLoss with smooth=1e-6; contours of both
    prediction and target are clamped to [0, 1] before a BCE on contours.
    NHWC input [B, H, W, 1].
    """
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    p = jnp.nan_to_num(p, nan=0.5, posinf=1.0, neginf=0.0)
    t = jnp.nan_to_num(t, nan=0.0)
    p = jnp.clip(p, 1e-7, 1.0 - 1e-7)
    # mask AFTER the clip: padded samples' probs would otherwise sit at
    # the clip floor (1e-7 per pixel) and leak into the dice sums below
    p = _mask_bt(p, sample_mask)
    t = _mask_bt(t, sample_mask)

    l_bce = _bce(p, t, sample_mask)
    # DiceLoss(smooth=1e-6) applied to re-derived logits == dice on p.
    pf, tf = p.reshape(-1), t.reshape(-1)
    inter = jnp.sum(pf * tf)
    l_dice = 1.0 - (2.0 * inter + 1e-6) / (jnp.sum(pf) + jnp.sum(tf) + 1e-6)
    l_bce = jnp.where(jnp.isnan(l_bce), 0.0, l_bce)
    l_dice = jnp.where(jnp.isnan(l_dice), 0.0, l_dice)
    l_seg = bce_weight * l_bce + dice_weight * l_dice

    pred_contour = jnp.clip(_contour(p), 0.0, 1.0)
    target_contour = jax.lax.stop_gradient(jnp.clip(_contour(t), 0.0, 1.0))
    l_cp = _bce(pred_contour, target_contour, sample_mask)
    l_cp = jnp.where(jnp.isnan(l_cp), 0.0, l_cp)

    total = l_seg + contour_weight * l_cp
    return jnp.where(jnp.isnan(total), l_bce + l_dice, total)


def compute_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    loss_type: str = "dice",
    loss_params: Optional[Mapping[str, Any]] = None,
    sample_mask=None,
) -> jnp.ndarray:
    """Loss dispatch matching reference utils/metrics.py:239-258.

    Accepts both the code's and the configs' bce_dice weight spellings.
    ``sample_mask`` ([B] of 0/1) makes the loss of a zero-padded batch
    equal that of the valid samples alone (sharded partial eval batches).
    """
    lp = dict(loss_params or {})
    if loss_type == "dice":
        return dice_loss(pred, target, sample_mask=sample_mask)
    if loss_type == "tversky":
        return tversky_loss(pred, target, lp.get("alpha", 0.5), lp.get("beta", 0.5),
                            sample_mask=sample_mask)
    if loss_type == "bce_dice":
        w_bce = lp.get("weight_bce", lp.get("bce_weight", 1.0))
        w_dice = lp.get("weight_dice", lp.get("dice_weight", 1.0))
        return bce_dice_loss(pred, target, w_bce, w_dice, sample_mask=sample_mask)
    if loss_type == "joint":
        return joint_loss(
            pred,
            target,
            lp.get("bce_weight", 1.0),
            lp.get("dice_weight", 1.0),
            lp.get("contour_weight", 1.0),
            sample_mask=sample_mask,
        )
    raise ValueError(f"unsupported loss type: {loss_type!r}")
