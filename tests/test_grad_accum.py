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


# ---------------------------------------------------------------- exact mode

import flax.linen as nn  # noqa: E402
import pytest  # noqa: E402


class _PlainConvNet(nn.Module):
    """BN-free model: with no batch-statistic coupling, exact grad-accum
    must reproduce the monolithic step's gradients bit-for-bit."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(6, (3, 3))(x)
        x = nn.relu(x)
        return nn.Conv(1, (1, 1))(x)


def _one_step(tmp_path, tag, loss_type, extra_training, model=None, batch=4, seed=0):
    cfg = {**CFG, "logging": {"log_dir": str(tmp_path / tag),
                              "images_dir": str(tmp_path / tag),
                              "save_best_worst_samples": 0}}
    cfg["training"] = {**CFG["training"],
                       "loss": {"type": loss_type,
                                "params": {"alpha": 0.3, "beta": 0.7}},
                       **extra_training}
    model = model if model is not None else create_model(cfg)
    trainer = Trainer(model, None, None, cfg, seed=seed)
    rng = np.random.default_rng(7)
    images = rng.integers(0, 256, (batch, 48, 48, 3), dtype=np.uint8)
    masks = rng.integers(0, 2, (batch, 48, 48)).astype(np.uint8) * 255
    state = trainer.init_state({"image": images})
    new_state, metrics = trainer._train_step(
        state, jnp.asarray(images), jnp.asarray(masks))
    return new_state, metrics


@pytest.mark.parametrize("loss_type", ["dice", "tversky", "bce_dice", "joint"])
def test_grad_accum_exact_matches_monolithic(tmp_path, loss_type):
    """grad_accum=2 + grad_accum_exact on a BN-free model == one
    monolithic B=4 step (VERDICT r3 item 4: the coupled dice/tversky
    sums run over the whole virtual batch).

    The LOSS is bitwise identical (same probs, same full-batch sums).
    Parameter updates agree to float32 reduction-order rounding: the
    conv weight-grad batch reduction is split into two partial sums,
    which reorders the summation (measured max |delta| ~1e-10 on 1e-4
    magnitude grads, i.e. ~1 ulp) — there is no remaining systematic
    averaged-vs-coupled error, which is what the default path has."""
    mono, m_mono = _one_step(tmp_path, f"mono_{loss_type}", loss_type,
                             {"grad_accum": 1}, model=_PlainConvNet())
    ex, m_ex = _one_step(tmp_path, f"exact_{loss_type}", loss_type,
                         {"grad_accum": 2, "grad_accum_exact": True},
                         model=_PlainConvNet())
    assert float(m_mono["loss"]) == float(m_ex["loss"])
    for a, b in zip(jax.tree.leaves(mono.params), jax.tree.leaves(ex.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-9)


def test_grad_accum_default_is_inexact_for_coupled_loss(tmp_path):
    """Sanity check that the exact option changes anything: the default
    averaged-microbatch-dice path must NOT equal the monolithic step
    (if it did, the exact mode would be redundant)."""
    mono, _ = _one_step(tmp_path, "mono_d", "dice", {"grad_accum": 1},
                        model=_PlainConvNet())
    avg, _ = _one_step(tmp_path, "avg_d", "dice", {"grad_accum": 2},
                       model=_PlainConvNet())
    diffs = [np.max(np.abs(np.asarray(a) - np.asarray(b)))
             for a, b in zip(jax.tree.leaves(mono.params), jax.tree.leaves(avg.params))]
    assert max(diffs) > 0


def test_grad_accum_exact_with_bn_threads_stats(tmp_path):
    """With BN (the flagship), exact mode keeps the microbatch stats
    threading: batch_stats must equal the default accum path's (only the
    loss coupling changes), and the step must stay finite."""
    ex, m_ex = _one_step(tmp_path, "bn_exact", "dice",
                         {"grad_accum": 2, "grad_accum_exact": True})
    avg, m_avg = _one_step(tmp_path, "bn_avg", "dice", {"grad_accum": 2})
    assert np.isfinite(float(m_ex["loss"]))
    for a, b in zip(jax.tree.leaves(ex.batch_stats), jax.tree.leaves(avg.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5)


def test_grad_accum_exact_sharded_matches_single_device(tmp_path):
    """Exact accum under the 8-device data mesh == single-device exact
    accum.  The backward-through-scan path is new surface for the GSPMD
    grad-accum miscompile class (trainer.py pins microbatch shardings;
    repro in scripts/repro_scan_halo_grad.py) — this canary guards it.
    batch 16 / accum 2 -> microbatch 8 divides the data axis, so the
    pinned-sharding path is the one exercised."""
    from dfc_sa_unet_tpu.parallel import data_parallel_mesh

    from dfc_sa_unet_tpu.nn.layers import BatchNorm, Conv

    class MiniNet(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            x = Conv(features=4, kernel_size=3, padding=1, name="c1")(x)
            x = BatchNorm(name="bn1")(x, train=train)
            x = nn.relu(x)
            return Conv(features=1, kernel_size=1, name="c2")(x)

    cfg = {**CFG, "logging": {"log_dir": str(tmp_path / "sh"),
                              "images_dir": str(tmp_path / "sh"),
                              "save_best_worst_samples": 0}}
    cfg["training"] = {**CFG["training"], "batch_size": 16, "grad_accum": 2,
                       "grad_accum_exact": True,
                       "loss": {"type": "dice", "params": {}}}
    rng = np.random.default_rng(11)
    images = rng.integers(0, 256, (16, 16, 16, 3), dtype=np.uint8)
    masks = rng.integers(0, 2, (16, 16, 16)).astype(np.uint8) * 255
    batch = {"image": images, "mask": masks}

    t1 = Trainer(MiniNet(), None, None, cfg, mesh=None, seed=0)
    s1 = t1.init_state(batch)
    s1n, m1 = t1._train_step(s1, jnp.asarray(images), jnp.asarray(masks))

    t8 = Trainer(MiniNet(), None, None, cfg, mesh=data_parallel_mesh(), seed=0)
    s8 = t8.init_state(batch)
    imgs, msks, valid = t8._put_batch(batch)
    assert valid is None and len(imgs.sharding.device_set) == 8
    s8n, m8 = t8._train_step(s8, imgs, msks)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1n.params), jax.tree.leaves(s8n.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1n.batch_stats), jax.tree.leaves(s8n.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)
