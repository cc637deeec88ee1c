"""pretrained_path loading through the factory (reference
models/model_factory.py:50-72): warm-start training from a converted torch
``.pth`` — or an Orbax dir — via the config alone."""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.data.loader import DataLoaderFactory
from dfc_sa_unet_tpu.data.synthetic import generate
from dfc_sa_unet_tpu.models.factory import ModelFactory, load_pretrained_variables
from dfc_sa_unet_tpu.train.trainer import Trainer
from dfc_sa_unet_tpu.utils import checkpoint as ckpt_util

from tests._reference import load_ref_module, require_reference

pytestmark = pytest.mark.slow  # >60s on the CPU conftest; run with -m 'slow or not slow'

FEATURES = [8, 16, 24, 32]


def _config(root, log_dir, pretrained_path):
    return {
        "training": {
            "num_epochs": 1,
            "batch_size": 4,
            "learning_rate": 0.01,
            "momentum": 0.9,
            "weight_decay": 1e-4,
            "num_workers": 0,
            "save_checkpoint_freq": 100,
            "device": "auto",
            "loss": {"type": "bce_dice", "params": {"weight_bce": 0.5, "weight_dice": 0.5}},
        },
        "model": {
            "name": "DFC-SA-Res-Block",
            "in_channels": 3,
            "out_channels": 1,
            "features": FEATURES,
            "pool_size": 4,
            "pretrained_path": pretrained_path,
        },
        "dataset": {"train_dir": root, "val_dir": root, "img_size": [48, 48],
                    "augmentation": False},
        "logging": {"log_dir": log_dir, "images_dir": os.path.join(log_dir, "images"),
                    "save_best_worst_samples": 0},
    }


def test_warm_start_from_torch_pth_via_config(tmp_path):
    """Train one epoch warm-started from a reference trainer-style ``.pth``
    named only in the config — the exact flow the reference supports."""
    require_reference()
    ref = load_ref_module("unet_dfc_sa_res")
    torch.manual_seed(7)
    ref_model = ref.UNetDFCSARes(in_channels=3, out_channels=1, features=FEATURES, pool_size=4)
    pth = str(tmp_path / "ref_ckpt.pth")
    # trainer-checkpoint shape (reference utils/trainer.py:276-288)
    torch.save({"epoch": 3, "model_state_dict": ref_model.state_dict()}, pth)

    root = generate(str(tmp_path / "data"), n=8, size=48, seed=3)
    config = _config(root, str(tmp_path / "logs"), pth)

    model, pretrained = ModelFactory.get_model_and_variables(config)
    assert pretrained is not None and "params" in pretrained

    # the loaded weights reproduce the torch logits (not a fresh init)
    x_nchw = np.random.default_rng(0).standard_normal((1, 3, 48, 48)).astype(np.float32)
    ref_model.eval()
    with torch.no_grad():
        want = ref_model(torch.from_numpy(x_nchw)).numpy()
    got = model.apply(pretrained, jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1))), train=False)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), want,
                               atol=5e-4, rtol=1e-3)

    factory = DataLoaderFactory(config, seed=0)
    trainer = Trainer(model, factory.get_train_loader(), factory.get_val_loader(), config,
                      seed=0, init_variables=pretrained)
    state = trainer.train()
    assert len(trainer.history["train_losses"]) == 1
    assert np.isfinite(trainer.history["train_losses"]).all()
    assert int(state.step) > 0


def test_pretrained_from_orbax_dir(tmp_path):
    """pretrained_path may also be an Orbax directory (e.g. best_model)."""
    cfg = {"model": {"name": "DFC-SA-Res-Block", "features": FEATURES, "pool_size": 4},
           "dataset": {"img_size": [48, 48]}}
    model = ModelFactory.get_model(cfg)
    variables = model.init(jax.random.key(1), jnp.zeros((1, 48, 48, 3)), train=False)
    path = str(tmp_path / "best_model")
    ckpt_util.save_pytree(path, {"params": variables["params"],
                                 "batch_stats": variables["batch_stats"]})

    cfg["model"]["pretrained_path"] = path
    loaded = load_pretrained_variables(model, cfg)
    for a, b in zip(jax.tree.leaves(variables["params"]), jax.tree.leaves(loaded["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_no_pretrained_path_returns_none():
    cfg = {"model": {"name": "UNet"}}
    model = ModelFactory.get_model(cfg)
    assert load_pretrained_variables(model, cfg) is None
