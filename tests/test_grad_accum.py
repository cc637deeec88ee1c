"""Gradient accumulation: the scan-over-microbatches train step must match
an explicit sequential replay (same grads, same BN stats threading)."""

import numpy as np

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.losses import compute_loss
from dfc_sa_unet_tpu.models.factory import create_model
from dfc_sa_unet_tpu.train.trainer import Trainer

CFG = {
    "training": {
        "num_epochs": 1,
        "batch_size": 4,
        "learning_rate": 0.05,
        "momentum": 0.9,
        "weight_decay": 1e-4,
        "grad_accum": 2,
        "loss": {"type": "bce_dice", "params": {}},
    },
    "model": {"name": "DFC-SA-Res-Block", "features": [8, 16, 24, 32], "pool_size": 4},
    "dataset": {"train_dir": ".", "val_dir": ".", "img_size": [48, 48]},
    "logging": {"log_dir": "/tmp/ga_log", "images_dir": "/tmp/ga_log/images",
                "save_best_worst_samples": 0},
}


def test_grad_accum_matches_sequential_replay(tmp_path):
    cfg = {**CFG, "logging": {"log_dir": str(tmp_path), "images_dir": str(tmp_path),
                              "save_best_worst_samples": 0}}
    model = create_model(cfg)
    trainer = Trainer(model, None, None, cfg, seed=0)
    assert trainer.grad_accum == 2

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (4, 48, 48, 3), dtype=np.uint8)
    masks = rng.integers(0, 2, (4, 48, 48)).astype(np.uint8) * 255

    state = trainer.init_state({"image": images})
    # _train_step donates its input state; keep a copy for the replay
    state0 = jax.tree.map(lambda a: jnp.array(a), state)
    new_state, metrics = trainer._train_step(state, jnp.asarray(images), jnp.asarray(masks))
    state = state0
    assert np.isfinite(float(metrics["loss"]))

    # explicit replay: two microbatches, grads averaged, BN stats threaded
    from dfc_sa_unet_tpu.data.loader import binarize_mask_on_device, normalize_on_device

    x = normalize_on_device(jnp.asarray(images), jnp.float32)
    t = binarize_mask_on_device(jnp.asarray(masks))
    base_rng = jax.random.fold_in(trainer.base_key, state.step)

    def loss_fn(params, stats, xi, ti, rng_i):
        out, mut = model.apply({"params": params, "batch_stats": stats}, xi, train=True,
                               mutable=["batch_stats"], rngs={"dropout": rng_i})
        probs = jax.nn.sigmoid(out.astype(jnp.float32))
        return compute_loss(probs, ti, "bce_dice", {}), mut["batch_stats"]

    stats = state.batch_stats
    gsum = jax.tree.map(jnp.zeros_like, state.params)
    losses = []
    for i in range(2):
        (li, stats), gi = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, stats, x[2 * i : 2 * i + 2], t[2 * i : 2 * i + 2],
            jax.random.fold_in(base_rng, i))
        gsum = jax.tree.map(lambda a, g: a + g, gsum, gi)
        losses.append(li)
    grads = jax.tree.map(lambda g: g / 2, gsum)
    updates, _ = trainer.tx.update(grads, state.opt_state, state.params)
    want_params = jax.tree.map(lambda p, u: p + u, state.params, updates)

    np.testing.assert_allclose(
        float(metrics["loss"]), float((losses[0] + losses[1]) / 2), rtol=1e-6)
    for got, want in zip(jax.tree.leaves(new_state.params), jax.tree.leaves(want_params)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6, rtol=1e-5)
    for got, want in zip(jax.tree.leaves(new_state.batch_stats), jax.tree.leaves(stats)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6, rtol=1e-5)


def test_train_step_exe_cache_dispatch(tmp_path):
    """With training.exe_cache_dir set, the step compiles through the
    executable cache (entry written) and still produces finite metrics
    (on the CPU test backend the cached executable falls back to jit)."""
    cfg = {**CFG, "logging": {"log_dir": str(tmp_path / "log"),
                              "images_dir": str(tmp_path / "log"),
                              "save_best_worst_samples": 0}}
    cfg["training"] = {**CFG["training"], "grad_accum": 1,
                       "exe_cache_dir": str(tmp_path / "cache")}
    model = create_model(cfg)
    trainer = Trainer(model, None, None, cfg, seed=0)
    rng = np.random.default_rng(1)
    images = rng.integers(0, 256, (2, 48, 48, 3), dtype=np.uint8)
    masks = rng.integers(0, 2, (2, 48, 48)).astype(np.uint8) * 255
    state = trainer.init_state({"image": images})
    _, metrics = trainer._train_step(state, jnp.asarray(images), jnp.asarray(masks))
    assert np.isfinite(float(metrics["loss"]))
    assert list((tmp_path / "cache").glob("exe_*.bin"))


def test_exe_cache_key_covers_model_config(tmp_path):
    """pool_size (and use_pallas/remat) change the compiled math without
    changing the model class name or any argument shape — the attention
    Q/K params are pool-size independent.  Two trainers differing only in
    pool_size sharing one cache dir must write two distinct entries, not
    silently reuse the first executable."""
    def build(pool_size):
        cfg = {**CFG, "logging": {"log_dir": str(tmp_path / f"log{pool_size}"),
                                  "images_dir": str(tmp_path / f"log{pool_size}"),
                                  "save_best_worst_samples": 0}}
        cfg["training"] = {**CFG["training"], "grad_accum": 1,
                           "exe_cache_dir": str(tmp_path / "cache")}
        cfg["model"] = {**CFG["model"], "pool_size": pool_size}
        model = create_model(cfg)
        return Trainer(model, None, None, cfg, seed=0)

    rng = np.random.default_rng(2)
    images = rng.integers(0, 256, (2, 48, 48, 3), dtype=np.uint8)
    masks = rng.integers(0, 2, (2, 48, 48)).astype(np.uint8) * 255

    t4 = build(4)
    s4 = t4.init_state({"image": images})
    t4._train_step(s4, jnp.asarray(images), jnp.asarray(masks))
    entries = set((tmp_path / "cache").glob("exe_*.bin"))
    assert len(entries) == 1

    t8 = build(8)  # same param shapes, different pooled-attention math
    s8 = t8.init_state({"image": images})
    _, m8 = t8._train_step(s8, jnp.asarray(images), jnp.asarray(masks))
    assert np.isfinite(float(m8["loss"]))
    entries2 = set((tmp_path / "cache").glob("exe_*.bin"))
    assert len(entries2) == 2 and entries < entries2
