"""Preemption safety: a stop request mid-training checkpoints and exits
cleanly, and the checkpoint resumes."""

import os

import numpy as np

from dfc_sa_unet_tpu.data.loader import DataLoaderFactory
from dfc_sa_unet_tpu.data.synthetic import generate
from dfc_sa_unet_tpu.models.factory import ModelFactory
from dfc_sa_unet_tpu.train.trainer import Trainer
from dfc_sa_unet_tpu.utils import checkpoint as ckpt_util


def test_stop_request_checkpoints_and_resumes(tmp_path):
    root = generate(str(tmp_path / "d"), n=8, size=32, seed=3)
    log_dir = str(tmp_path / "logs")
    config = {
        "training": {"num_epochs": 50, "batch_size": 4, "learning_rate": 0.01,
                     "momentum": 0.9, "weight_decay": 1e-4, "num_workers": 1,
                     "save_checkpoint_freq": 100, "device": "auto",
                     "loss": {"type": "dice", "params": {}}},
        "model": {"name": "DFC-SA-Res-Block", "features": [8, 16, 24, 32], "pool_size": 4},
        "dataset": {"train_dir": root, "val_dir": root, "img_size": [32, 32], "augmentation": False},
        "logging": {"log_dir": log_dir, "images_dir": log_dir + "/images",
                    "save_best_worst_samples": 0},
    }
    factory = DataLoaderFactory(config, seed=0)
    model = ModelFactory.get_model(config)
    trainer = Trainer(model, factory.get_train_loader(), factory.get_val_loader(), config, seed=0)

    # simulate SIGTERM arriving during epoch 2
    orig_train_epoch = trainer.train_epoch

    def stopping_train_epoch(state, epoch):
        if epoch == 1:
            trainer._stop_requested.set()
        return orig_train_epoch(state, epoch)

    trainer.train_epoch = stopping_train_epoch
    trainer.train()
    # epochs 0 and 1 completed; preemption checkpoint for epoch index 1
    assert len(trainer.history["train_losses"]) == 2
    ckpt = ckpt_util.latest_epoch_checkpoint(os.path.join(log_dir, "checkpoints"))
    assert ckpt is not None and ckpt.endswith("checkpoint_epoch_2"), ckpt

    # resume continues at epoch 3 of a shortened schedule
    config["training"]["num_epochs"] = 3
    trainer2 = Trainer(model, factory.get_train_loader(), factory.get_val_loader(), config, seed=0)
    trainer2.train(resume_from=ckpt)
    assert trainer2.start_epoch == 2
    assert len(trainer2.history["train_losses"]) == 3
    assert np.isfinite(trainer2.history["train_losses"]).all()
