"""Round-5 soak regression: finite-loss/NaN-gradient batches.

The round-5 long soak hit this exact sequence on chip at epoch 13: a
fully-confident pixel drove sigmoid probs to exactly 0.0, where the old
``clip(log(p))`` BCE had a finite (torch-clamped) forward value but a
0 * (-inf) = NaN gradient; the update was applied (the skip guard only
checked the LOSS), and params were NaN for the remaining 187 epochs.
Two independent fixes, both pinned here:

  1. losses._bce is endpoint-safe: gradients at p == 0.0 / 1.0 are
     finite (zero), forward values unchanged (torch clamp at -100);
  2. Trainer._step_impl gates the update on gradient finiteness (and
     rolls back the BN running-stat update on skipped batches).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.losses import bce_dice_loss, compute_loss


def test_bce_gradient_finite_at_exact_endpoints():
    t = jnp.asarray([[0.0, 1.0, 0.0, 1.0]])
    p = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])  # fully-confident pixels

    loss, grad = jax.value_and_grad(
        lambda p: bce_dice_loss(p, t, 0.5, 0.5))(p)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(grad)).all(), grad
    # forward unchanged vs the torch-clamp semantics: the two wrong
    # fully-confident pixels contribute -(-100) each to the BCE mean
    # BCE: two wrong fully-confident pixels at -100 each -> mean 50;
    # dice: inter=1 -> 1 - (2*1+1)/(2+2+1) = 0.4
    assert float(loss) == pytest.approx(0.5 * 50.0 + 0.5 * 0.4, rel=1e-6)

    # interior values keep their exact gradient (no accidental clamping)
    p2 = jnp.asarray([[0.3, 0.8]])
    t2 = jnp.asarray([[0.0, 1.0]])
    g = jax.grad(lambda p: bce_dice_loss(p, t2, 1.0, 0.0))(p2)
    want = np.asarray([1.0 / (1 - 0.3), -1.0 / 0.8]) / 2.0  # d(-mean)/dp
    np.testing.assert_allclose(np.asarray(g)[0], want, rtol=1e-5)


@pytest.mark.parametrize("loss_type", ["dice", "tversky", "bce_dice", "joint"])
def test_all_losses_gradient_finite_at_endpoints(loss_type):
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(size=(2, 8, 8, 1)).astype(np.float32))
    p = p.at[0, 0, 0, 0].set(0.0).at[0, 0, 1, 0].set(1.0)
    t = jnp.asarray((rng.uniform(size=(2, 8, 8, 1)) > 0.5).astype(np.float32))
    loss, grad = jax.value_and_grad(
        lambda p: compute_loss(p, t, loss_type, {}))(p)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(grad)).all()


def test_trainer_skips_update_on_nan_gradient(tmp_path, monkeypatch):
    """Finite loss + NaN gradient must leave params, momentum AND BN
    running stats untouched (finite=False path), and train() must keep
    going — the scenario that destroyed the round-5 soak."""
    from dfc_sa_unet_tpu.data.loader import DataLoaderFactory
    from dfc_sa_unet_tpu.data.synthetic import generate
    from dfc_sa_unet_tpu.models.factory import ModelFactory
    from dfc_sa_unet_tpu.train import trainer as trainer_mod

    root = generate(str(tmp_path / "d"), n=4, size=32, seed=0)
    cfg = {
        "training": {"num_epochs": 1, "batch_size": 4, "learning_rate": 0.05,
                     "momentum": 0.9, "weight_decay": 1e-4, "num_workers": 0,
                     "save_checkpoint_freq": 100, "device": "auto",
                     "loss": {"type": "bce_dice",
                              "params": {"bce_weight": 0.5, "dice_weight": 0.5}}},
        "model": {"name": "DFC-SA-Res-Block", "features": [4, 8, 8, 8], "pool_size": 2},
        "dataset": {"train_dir": root, "val_dir": root, "img_size": [32, 32],
                    "augmentation": False},
        "logging": {"log_dir": str(tmp_path / "logs"),
                    "images_dir": str(tmp_path / "img"),
                    "save_best_worst_samples": 0},
    }
    factory = DataLoaderFactory(cfg, seed=0)
    model = ModelFactory.get_model(cfg)

    real_compute_loss = trainer_mod.compute_loss

    def poisoned_loss(probs, t, loss_type, params, sample_mask=None):
        base = real_compute_loss(probs, t, loss_type, params, sample_mask=sample_mask)
        # finite value (-100, the torch clamp), NaN gradient: exactly the
        # clip(log(0)) trap the old _bce had
        trap = jnp.clip(jnp.log(jnp.sum(probs) * 0.0), -100.0)
        return base + 0.001 * trap

    monkeypatch.setattr(trainer_mod, "compute_loss", poisoned_loss)
    trainer = trainer_mod.Trainer(model, factory.get_train_loader(),
                                  factory.get_val_loader(), cfg, seed=0)
    batch = next(iter(factory.get_train_loader()))
    state = trainer.init_state(batch)
    params0 = jax.tree.map(np.array, state.params)
    stats0 = jax.tree.map(np.array, state.batch_stats)

    imgs, masks, _ = trainer._put_batch(batch)
    new_state, metrics = trainer._train_step_jit(state, imgs, masks)
    assert np.isfinite(float(metrics["loss"]))  # the loss itself was finite
    assert not bool(metrics["finite"])          # ...but the step was skipped
    for a, b in zip(jax.tree.leaves(params0), jax.tree.leaves(new_state.params)):
        np.testing.assert_array_equal(a, np.asarray(b))
    for a, b in zip(jax.tree.leaves(stats0), jax.tree.leaves(new_state.batch_stats)):
        np.testing.assert_array_equal(a, np.asarray(b))
    assert np.isfinite(np.concatenate(
        [np.asarray(l).ravel() for l in jax.tree.leaves(new_state.params)])).all()
