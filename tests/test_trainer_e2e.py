"""End-to-end training: tiny model, synthetic data, checkpoint + resume."""

import os

import numpy as np
import pytest

from dfc_sa_unet_tpu.data.loader import DataLoaderFactory
from dfc_sa_unet_tpu.data.synthetic import generate
from dfc_sa_unet_tpu.models.factory import ModelFactory
from dfc_sa_unet_tpu.train.trainer import Trainer
from dfc_sa_unet_tpu.utils import checkpoint as ckpt_util

pytestmark = pytest.mark.slow  # >60s on the CPU conftest; run with -m 'slow or not slow'


def _config(root, log_dir, epochs=2):
    return {
        "training": {
            "num_epochs": epochs,
            "batch_size": 4,
            "learning_rate": 0.05,
            "momentum": 0.9,
            "weight_decay": 1e-4,
            "num_workers": 2,
            "save_checkpoint_freq": 1,
            "device": "auto",
            "loss": {"type": "bce_dice", "params": {"bce_weight": 0.5, "dice_weight": 0.5}},
        },
        "model": {
            "name": "DFC-SA-Res-Block",
            "in_channels": 3,
            "out_channels": 1,
            "features": [8, 16, 24, 32],
            "pool_size": 4,
        },
        "dataset": {
            "train_dir": root,
            "val_dir": root,
            "img_size": [48, 48],
            "augmentation": True,
        },
        "logging": {"log_dir": log_dir, "images_dir": os.path.join(log_dir, "images"),
                    "save_best_worst_samples": 2},
    }


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = generate(str(tmp_path_factory.mktemp("data")), n=12, size=48, seed=1)
    log_dir = str(tmp_path_factory.mktemp("logs"))
    return root, log_dir


def test_train_checkpoints_and_artifacts(env):
    root, log_dir = env
    config = _config(root, log_dir, epochs=2)
    factory = DataLoaderFactory(config, seed=0)
    model = ModelFactory.get_model(config)
    trainer = Trainer(model, factory.get_train_loader(), factory.get_val_loader(), config, seed=0)
    trainer.train()

    assert len(trainer.history["train_losses"]) == 2
    assert np.isfinite(trainer.history["train_losses"]).all()
    # loss should drop on this trivially-learnable data
    assert trainer.history["train_losses"][-1] < trainer.history["train_losses"][0]
    # artifacts (reference utils/trainer.py:388-453)
    imgs = os.path.join(log_dir, "images")
    for f in ["loss_plot.png", "loss_plot.csv", "dice_plot.png", "dice_plot.csv",
              "iou_plot.png", "iou_plot.csv"]:
        assert os.path.exists(os.path.join(imgs, f)), f
    assert os.path.isdir(os.path.join(log_dir, "checkpoints", "checkpoint_epoch_2"))
    assert os.path.isdir(os.path.join(log_dir, "best_model"))
    # best/worst sample dumps
    assert os.path.isdir(os.path.join(log_dir, "epoch_2", "best_samples"))
    assert os.path.isdir(os.path.join(log_dir, "epoch_2", "worst_samples"))


def test_resume_continues_epoch_and_history(env):
    """Fixes reference defect: resume must keep history and epoch numbering
    (reference utils/trainer.py:326-349 restarts both)."""
    root, log_dir = env
    config = _config(root, log_dir, epochs=4)
    factory = DataLoaderFactory(config, seed=0)
    model = ModelFactory.get_model(config)
    trainer = Trainer(model, factory.get_train_loader(), factory.get_val_loader(), config, seed=0)
    ckpt = ckpt_util.latest_epoch_checkpoint(os.path.join(log_dir, "checkpoints"))
    assert ckpt and ckpt.endswith("checkpoint_epoch_2")
    trainer.train(resume_from=ckpt)
    assert trainer.start_epoch == 2
    assert len(trainer.history["train_losses"]) == 4  # 2 restored + 2 new


def test_input_bound_warning_fires_once(env, capsys):
    """A loader that starves the step must trigger the one-shot
    [input-bound] hint (>30% of epoch wall spent in next())."""
    import time

    root, log_dir = env
    config = _config(root, os.path.join(log_dir, "ib"), epochs=2)
    factory = DataLoaderFactory(config, seed=0)

    class SlowLoader:
        def __init__(self, inner):
            self.inner = inner
            self.dataset = inner.dataset

        def __len__(self):
            return len(self.inner)

        def set_epoch(self, e):
            self.inner.set_epoch(e)

        def __iter__(self):
            for b in self.inner:
                time.sleep(0.5)
                yield b

    model = ModelFactory.get_model(config)
    trainer = Trainer(model, SlowLoader(factory.get_train_loader()),
                      factory.get_val_loader(), config, seed=0)
    trainer.train()
    out = capsys.readouterr().out
    assert out.count("[input-bound]") == 1
