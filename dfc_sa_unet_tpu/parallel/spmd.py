"""Explicit shard_map SPMD training step with hand-placed collectives.

The framework's default data-parallel path is GSPMD (parallel/mesh.py):
shard the batch, let XLA insert the reductions.  This module provides the
*explicit* formulation over the same 1-D 'data' mesh — per-shard forward/
backward inside ``jax.shard_map`` with hand-written ``lax.psum`` /
``lax.pmean`` over ICI for:

  * the loss terms (Dice-style losses are ratios of global sums and are
    NOT shard-decomposable — psum the sums, then take the ratio),
  * gradients (pmean),
  * BatchNorm batch statistics (via nn.layers.bn_cross_replica_axis).

Both formulations produce identical updates (tested in
tests/test_parallel.py); the explicit one is the template to extend with
reduce_scatter/all_gather when a model ever needs sharded state.
"""

from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from dfc_sa_unet_tpu.data.loader import binarize_mask_on_device, normalize_on_device
from dfc_sa_unet_tpu.nn.layers import bn_cross_replica_axis

AXIS = "data"


def _bce_sums(p, t):
    """torch.nn.BCELoss sums: the LOG terms are clamped at -100 (exactly
    like losses._bce — clipping p instead changes saturated-contour terms
    from -100 to log(eps) and breaks joint-loss parity)."""
    p = p.astype(jnp.float32)
    t = t.astype(jnp.float32)
    log_p = jnp.clip(jnp.log(p), -100.0)
    log_1p = jnp.clip(jnp.log1p(-p), -100.0)
    return -jnp.sum(t * log_p + (1.0 - t) * log_1p), jnp.asarray(t.size, jnp.float32)


def _psum_mean(total, count):
    return jax.lax.psum(total, AXIS) / jax.lax.psum(count, AXIS)


def _global_loss(probs, targets, loss_type: str, loss_params: Mapping[str, Any]):
    """Loss over the *global* batch from shard-local tensors, via psum.

    Every loss in the family is either a mean (BCE terms) or a ratio of
    global sums (Dice/Tversky) — both psum-decomposable.  The Laplacian
    contour conv of ``joint`` is per-sample spatial work, so it stays
    shard-local; only its BCE mean is reduced.
    """
    lp = dict(loss_params or {})
    if loss_type == "joint":
        # reference utils/metrics.py:96-176 (mirrors losses.joint_loss)
        from dfc_sa_unet_tpu.losses import _contour

        p4 = jnp.nan_to_num(probs.astype(jnp.float32), nan=0.5, posinf=1.0, neginf=0.0)
        t4 = jnp.nan_to_num(targets.astype(jnp.float32), nan=0.0)
        p4 = jnp.clip(p4, 1e-7, 1.0 - 1e-7)
        l_bce = _psum_mean(*_bce_sums(p4, t4))
        inter = jax.lax.psum(jnp.sum(p4 * t4), AXIS)
        denom = jax.lax.psum(jnp.sum(p4), AXIS) + jax.lax.psum(jnp.sum(t4), AXIS)
        l_dice = 1.0 - (2.0 * inter + 1e-6) / (denom + 1e-6)
        l_bce = jnp.where(jnp.isnan(l_bce), 0.0, l_bce)
        l_dice = jnp.where(jnp.isnan(l_dice), 0.0, l_dice)
        l_seg = lp.get("bce_weight", 1.0) * l_bce + lp.get("dice_weight", 1.0) * l_dice
        pred_contour = jnp.clip(_contour(p4), 0.0, 1.0)
        target_contour = jax.lax.stop_gradient(jnp.clip(_contour(t4), 0.0, 1.0))
        l_cp = _psum_mean(*_bce_sums(pred_contour, target_contour))
        l_cp = jnp.where(jnp.isnan(l_cp), 0.0, l_cp)
        total = l_seg + lp.get("contour_weight", 1.0) * l_cp
        return jnp.where(jnp.isnan(total), l_bce + l_dice, total)

    p = probs.astype(jnp.float32).reshape(-1)
    t = targets.astype(jnp.float32).reshape(-1)
    inter = jax.lax.psum(jnp.sum(p * t), AXIS)
    p_sum = jax.lax.psum(jnp.sum(p), AXIS)
    t_sum = jax.lax.psum(jnp.sum(t), AXIS)
    if loss_type == "dice":
        return 1.0 - (2.0 * inter + 1.0) / (p_sum + t_sum + 1.0)
    if loss_type == "tversky":
        fp = jax.lax.psum(jnp.sum((1.0 - t) * p), AXIS)
        fn = jax.lax.psum(jnp.sum(t * (1.0 - p)), AXIS)
        a, b = lp.get("alpha", 0.5), lp.get("beta", 0.5)
        return 1.0 - (inter + 1.0) / (inter + a * fp + b * fn + 1.0)
    if loss_type == "bce_dice":
        bce = _psum_mean(*_bce_sums(p, t))
        dice_l = 1.0 - (2.0 * inter + 1.0) / (p_sum + t_sum + 1.0)
        w_bce = lp.get("weight_bce", lp.get("bce_weight", 1.0))
        w_dice = lp.get("weight_dice", lp.get("dice_weight", 1.0))
        return w_bce * bce + w_dice * dice_l
    raise ValueError(f"loss type {loss_type!r} not supported by the explicit SPMD step")


def make_spmd_train_step(
    model,
    tx,
    mesh: Mesh,
    loss_type: str = "bce_dice",
    loss_params: Optional[Mapping[str, Any]] = None,
    compute_dtype=None,
):
    """Returns step(state, images_u8, masks_u8) -> (state, metrics) where
    the batch arrives sharded over 'data' and all cross-chip communication
    is explicit."""
    cdtype = compute_dtype or jnp.float32

    def shard_body(params, batch_stats, opt_state, step, images_u8, masks_u8):
        x = normalize_on_device(images_u8, cdtype)
        t = binarize_mask_on_device(masks_u8)

        def loss_fn(params):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            # per-shard dropout rng: fold in the shard index so replicas
            # don't drop the same units (wrong for ViT/TransUNet otherwise)
            rng = jax.random.fold_in(
                jax.random.fold_in(jax.random.key(0), step), jax.lax.axis_index(AXIS)
            )
            with bn_cross_replica_axis(AXIS):
                out = model.apply(
                    variables, x, train=True,
                    mutable=["batch_stats"] if batch_stats else False,
                    rngs={"dropout": rng},
                )
            logits, mutated = out if batch_stats else (out, {})
            probs = jax.nn.sigmoid(logits.astype(jnp.float32))
            loss = _global_loss(probs, t, loss_type, loss_params or {})
            return loss, (probs, mutated.get("batch_stats", batch_stats))

        (loss, (probs, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # Each shard's grad holds only its local data's contribution to the
        # (already-global) loss; the global gradient is their sum over ICI.
        grads = jax.tree.map(lambda g: jax.lax.psum(g, AXIS), grads)
        finite = jnp.isfinite(loss)
        grads = jax.tree.map(lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = jax.tree.map(lambda p, u: p + jnp.where(finite, u, 0.0), params, updates)
        new_opt_state = jax.tree.map(lambda n, o: jnp.where(finite, n, o), new_opt_state, opt_state)

        # global hard Dice/IoU from psum'd counts (exact, integer-safe)
        pb = (probs > 0.5).astype(jnp.float32)
        inter = jax.lax.psum(jnp.sum(pb * t), AXIS)
        psum_ = jax.lax.psum(jnp.sum(pb), AXIS)
        tsum = jax.lax.psum(jnp.sum(t), AXIS)
        iou = inter / (psum_ + tsum - inter + 1e-7)
        dice = 2.0 * inter / (psum_ + tsum + 1e-7)
        metrics = {"loss": loss, "iou": iou, "dice": dice}
        return new_params, new_stats, new_opt_state, step + 1, metrics

    specs = dict(
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(AXIS), P(AXIS)),
        out_specs=(P(), P(), P(), P(), P()),
    )
    try:
        sharded = jax.shard_map(shard_body, check_vma=False, **specs)
    except TypeError:  # older jax spelling
        sharded = jax.shard_map(shard_body, check_rep=False, **specs)

    @jax.jit
    def step(state, images_u8, masks_u8):
        new_params, new_stats, new_opt, new_step, metrics = sharded(
            state.params, state.batch_stats, state.opt_state, state.step, images_u8, masks_u8
        )
        return (
            state.replace(params=new_params, batch_stats=new_stats, opt_state=new_opt, step=new_step),
            metrics,
        )

    return step
