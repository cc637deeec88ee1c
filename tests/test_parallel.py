"""Multi-chip (virtual 8-device CPU mesh) data-parallel tests."""

import pytest

import numpy as np

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.data.synthetic import generate
from dfc_sa_unet_tpu.data.loader import DataLoaderFactory
from dfc_sa_unet_tpu.models.factory import ModelFactory
from dfc_sa_unet_tpu.parallel import data_parallel_mesh, shard_batch
from dfc_sa_unet_tpu.train.trainer import Trainer

pytestmark = pytest.mark.slow  # >60s on the CPU conftest; run with -m 'slow or not slow'


def _config(root, log_dir):
    return {
        "training": {"num_epochs": 1, "batch_size": 8, "learning_rate": 0.01,
                     "momentum": 0.9, "weight_decay": 1e-4, "num_workers": 2,
                     "save_checkpoint_freq": 10, "device": "auto",
                     "loss": {"type": "bce_dice", "params": {"bce_weight": 0.5, "dice_weight": 0.5}}},
        "model": {"name": "DFC-SA-Res-Block", "features": [8, 16, 24, 32], "pool_size": 4},
        "dataset": {"train_dir": root, "val_dir": root, "img_size": [32, 32], "augmentation": False},
        "logging": {"log_dir": log_dir, "images_dir": log_dir + "/images",
                    "save_best_worst_samples": 0},
    }


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8, jax.devices()


def test_sharded_train_step_matches_single_device(tmp_path):
    """One GSPMD-sharded train step == the single-device step (same batch):
    gradients and BN batch stats are computed globally by construction."""
    root = generate(str(tmp_path / "d"), n=8, size=32, seed=5)
    cfg = _config(root, str(tmp_path / "logs"))
    factory = DataLoaderFactory(cfg, seed=0)
    loader = factory.get_val_loader()
    batch = next(iter(loader))
    assert batch["image"].shape[0] == 8

    model = ModelFactory.get_model(cfg)

    # single-device
    t1 = Trainer(model, loader, loader, cfg, mesh=None, seed=0)
    s1 = t1.init_state(batch)
    s1n, m1 = t1._train_step(s1, jnp.asarray(batch["image"]), jnp.asarray(batch["mask"]))

    # 8-device mesh
    mesh = data_parallel_mesh()
    t8 = Trainer(model, loader, loader, cfg, mesh=mesh, seed=0)
    s8 = t8.init_state(batch)
    imgs, masks, _ = t8._put_batch(batch)
    s8n, m8 = t8._train_step(s8, imgs, masks)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), atol=1e-5, rtol=1e-5)
    # updated params must agree (global grads)
    l1 = jax.tree.leaves(s1n.params)
    l8 = jax.tree.leaves(s8n.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)
    # updated BN running stats must agree (global batch statistics)
    for a, b in zip(jax.tree.leaves(s1n.batch_stats), jax.tree.leaves(s8n.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_partial_eval_batch_sharded_exact_flagship(tmp_path):
    """Flagship version of the fast mini-net check: a partial val batch
    (6 of 8 devices) padded+masked on the mesh reproduces the unpadded
    single-device eval metrics exactly."""
    root = generate(str(tmp_path / "d"), n=8, size=32, seed=7)
    cfg = _config(root, str(tmp_path / "logs"))
    loader = DataLoaderFactory(cfg, seed=0).get_val_loader()
    batch = next(iter(loader))
    small = {k: (v[:6] if hasattr(v, "__getitem__") and not isinstance(v, str) else v)
             for k, v in batch.items()}
    model = ModelFactory.get_model(cfg)

    t1 = Trainer(model, loader, loader, cfg, mesh=None, seed=0)
    s1 = t1.init_state(batch)
    _, m1 = t1._eval_step(s1, jnp.asarray(small["image"]), jnp.asarray(small["mask"]), None)

    mesh = data_parallel_mesh()
    t8 = Trainer(model, loader, loader, cfg, mesh=mesh, seed=0)
    s8 = t8.init_state(batch)
    imgs, masks, valid = t8._put_batch(small, pad_to_devices=True)
    assert valid is not None and len(imgs.sharding.device_set) == 8
    _, m8 = t8._eval_step(s8, imgs, masks, valid)
    for key in ("loss", "iou", "dice"):
        np.testing.assert_allclose(float(m1[key]), float(m8[key]), atol=1e-5, rtol=1e-5,
                                   err_msg=key)
    for key in ("per_sample_iou", "per_sample_dice"):
        np.testing.assert_allclose(
            np.asarray(m8[key])[:6], np.asarray(m1[key]), atol=1e-5, rtol=1e-4, err_msg=key)


def test_data_parallel_predictor_flagship(tmp_path):
    """Flagship sharded serving: Predictor(mesh) probabilities ==
    single-device, for divisible and padded non-divisible batches."""
    from dfc_sa_unet_tpu.infer.predictor import Predictor

    cfg = _config(str(tmp_path), str(tmp_path / "logs"))
    model = ModelFactory.get_model(cfg)
    variables = model.init(
        jax.random.key(2), jnp.zeros((1, 32, 32, 3), jnp.float32), train=False
    )
    imgs = np.random.default_rng(17).integers(
        0, 256, size=(8, 32, 32, 3), dtype=np.uint8
    )
    p1 = Predictor(model, variables)
    pm = Predictor(model, variables, mesh=data_parallel_mesh())
    np.testing.assert_allclose(
        pm.predict_probs(imgs), p1.predict_probs(imgs), atol=1e-6, rtol=1e-6)
    got_odd = pm.predict_probs(imgs[:5])  # pads to 8, shards, discards
    np.testing.assert_allclose(
        got_odd, p1.predict_probs(imgs[:5]), atol=1e-6, rtol=1e-6)


def test_shard_batch_places_shards():
    mesh = data_parallel_mesh()
    x = np.zeros((16, 4), np.float32)
    sharded = shard_batch({"x": x}, mesh)["x"]
    assert len(sharded.addressable_shards) == 8
    assert sharded.addressable_shards[0].data.shape == (2, 4)


def test_explicit_spmd_step_matches_gspmd(tmp_path):
    """The shard_map step with hand-placed psums must equal the GSPMD step
    (and hence the single-device step) exactly."""
    import jax.numpy as jnp
    from dfc_sa_unet_tpu.parallel.spmd import make_spmd_train_step
    from dfc_sa_unet_tpu.train import optim

    root = generate(str(tmp_path / "d"), n=8, size=32, seed=9)
    cfg = _config(root, str(tmp_path / "logs"))
    factory = DataLoaderFactory(cfg, seed=0)
    loader = factory.get_val_loader()
    batch = next(iter(loader))

    model = ModelFactory.get_model(cfg)
    mesh = data_parallel_mesh()

    # GSPMD path
    tg = Trainer(model, loader, loader, cfg, mesh=mesh, seed=0)
    sg = tg.init_state(batch)
    imgs, masks, _ = tg._put_batch(batch)
    sg0 = jax.tree.map(jnp.array, sg)  # _train_step donates sg
    sgn, mg = tg._train_step(sg, imgs, masks)
    sg = sg0

    # explicit shard_map path, same initial state
    tx = optim.from_config(cfg)
    step = make_spmd_train_step(
        model, tx, mesh,
        loss_type=cfg["training"]["loss"]["type"],
        loss_params=cfg["training"]["loss"]["params"],
    )
    ssn, ms = step(sg, imgs, masks)

    np.testing.assert_allclose(float(mg["loss"]), float(ms["loss"]), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(mg["dice"]), float(ms["dice"]), atol=1e-5)
    for a, b in zip(jax.tree.leaves(sgn.params), jax.tree.leaves(ssn.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(sgn.batch_stats), jax.tree.leaves(ssn.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


def test_explicit_spmd_joint_loss_matches_single_device(tmp_path):
    """joint loss (BCE + Dice + contour BCE) through the explicit psum
    decomposition == the single-device GSPMD step's loss and update."""
    from dfc_sa_unet_tpu.parallel.spmd import make_spmd_train_step
    from dfc_sa_unet_tpu.train import optim

    root = generate(str(tmp_path / "d"), n=8, size=32, seed=11)
    cfg = _config(root, str(tmp_path / "logs"))
    cfg["training"]["loss"] = {
        "type": "joint",
        "params": {"bce_weight": 0.4, "dice_weight": 0.4, "contour_weight": 0.2},
    }
    factory = DataLoaderFactory(cfg, seed=0)
    loader = factory.get_val_loader()
    batch = next(iter(loader))

    model = ModelFactory.get_model(cfg)
    mesh = data_parallel_mesh()

    tg = Trainer(model, loader, loader, cfg, mesh=mesh, seed=0)
    sg = tg.init_state(batch)
    imgs, masks, _ = tg._put_batch(batch)
    sg0 = jax.tree.map(jnp.array, sg)  # _train_step donates sg
    sgn, mg = tg._train_step(sg, imgs, masks)
    sg = sg0

    tx = optim.from_config(cfg)
    step = make_spmd_train_step(model, tx, mesh, loss_type="joint",
                                loss_params=cfg["training"]["loss"]["params"])
    ssn, ms = step(sg, imgs, masks)

    np.testing.assert_allclose(float(mg["loss"]), float(ms["loss"]), atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(sgn.params), jax.tree.leaves(ssn.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


def test_explicit_spmd_dropout_rng_decorrelated(tmp_path):
    """The explicit step folds the shard index into the dropout rng — each
    replica must drop different units (and a dropout-bearing model runs)."""
    from jax.sharding import PartitionSpec as P
    from dfc_sa_unet_tpu.parallel.spmd import make_spmd_train_step
    from dfc_sa_unet_tpu.train import optim

    mesh = data_parallel_mesh()

    # probe: the exact rng construction used in spmd.shard_body
    def rng_probe():
        rng = jax.random.fold_in(
            jax.random.fold_in(jax.random.key(0), 3), jax.lax.axis_index("data")
        )
        return jax.random.uniform(rng, (1, 16))

    try:
        probe = jax.shard_map(rng_probe, mesh=mesh, in_specs=(), out_specs=P("data"),
                              check_vma=False)
    except TypeError:
        probe = jax.shard_map(rng_probe, mesh=mesh, in_specs=(), out_specs=P("data"),
                              check_rep=False)
    draws = np.asarray(probe())
    assert draws.shape == (8, 16)
    assert len({tuple(np.round(r, 7)) for r in draws}) == 8, "shards share a dropout rng"

    # a dropout-bearing model trains through the explicit step
    root = generate(str(tmp_path / "d"), n=8, size=32, seed=13)
    cfg = _config(root, str(tmp_path / "logs"))
    cfg["model"] = {"name": "VisionTransformerSegmentation", "img_dim": 32, "patch_dim": 8,
                    "in_channels": 3, "out_channels": 1, "embed_dim": 32, "num_layers": 1,
                    "num_heads": 2, "mlp_dim": 64, "dropout": 0.5}
    factory = DataLoaderFactory(cfg, seed=0)
    loader = factory.get_val_loader()
    batch = next(iter(loader))
    model = ModelFactory.get_model(cfg)
    trainer = Trainer(model, loader, loader, cfg, mesh=mesh, seed=0)
    state = trainer.init_state(batch)
    imgs, masks, _ = trainer._put_batch(batch)
    tx = optim.from_config(cfg)
    step = make_spmd_train_step(model, tx, mesh, loss_type="bce_dice",
                                loss_params={"bce_weight": 0.5, "dice_weight": 0.5})
    new_state, metrics = step(state, imgs, masks)
    assert np.isfinite(float(metrics["loss"]))
    # params actually moved
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(new_state.params))
    )
    assert moved
