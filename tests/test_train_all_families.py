"""One real train step (forward+loss+backward+update) for every model
family through the Trainer — catches integration issues (dropout rngs,
batch_stats threading, optimizer shapes) the parity tests don't."""

import numpy as np
import pytest

from dfc_sa_unet_tpu.models.factory import ModelFactory
from dfc_sa_unet_tpu.train.trainer import Trainer

pytestmark = pytest.mark.slow  # >60s on the CPU conftest; run with -m 'slow or not slow'

SMALL = {"features": [8, 16, 24, 32], "pool_size": 4}

CASES = [
    ("UNet", {}, 32),
    ("DFC-SA-Res-Block", SMALL, 32),
    ("UNet_Baseline", SMALL, 32),
    ("UNet_AttentionOnly", SMALL, 32),
    ("UNet_AdditionFusion", SMALL, 32),
    ("UNet_ConcatFusion", SMALL, 32),
    ("UNet_FullResAttention", SMALL, 32),
    ("UNet_EncoderOnlyDFC", SMALL, 32),
    ("UNet_DecoderOnlyDFC", SMALL, 32),
    ("UNet_BothStandardConv", SMALL, 32),
    ("VisionTransformerSegmentation",
     {"img_dim": 32, "patch_dim": 8, "embed_dim": 16, "num_layers": 1, "num_heads": 2,
      "mlp_dim": 32, "dropout": 0.1, "segmentation_head_upsample_layers": 3}, 32),
    ("TransformerUNet", {}, 32),
]


def _config(name, extra, size):
    return {
        "training": {"num_epochs": 1, "batch_size": 2, "learning_rate": 0.01,
                     "momentum": 0.9, "weight_decay": 1e-4, "num_workers": 1,
                     "save_checkpoint_freq": 10, "device": "auto",
                     "loss": {"type": "bce_dice", "params": {"bce_weight": 0.5, "dice_weight": 0.5}}},
        "model": {"name": name, "in_channels": 3, "out_channels": 1, **extra},
        "dataset": {"train_dir": "", "val_dir": "", "img_size": [size, size], "augmentation": False},
        "logging": {"log_dir": "/tmp/smoke", "images_dir": "/tmp/smoke/i",
                    "save_best_worst_samples": 0},
    }


@pytest.mark.parametrize("name,extra,size", CASES, ids=[c[0] for c in CASES])
def test_one_train_and_eval_step(name, extra, size):
    import jax.numpy as jnp

    config = _config(name, extra, size)
    if name in ("TransformerUNet", "TransUNet"):
        # shrink the hybrid backbone for test speed
        config["dataset"]["img_size"] = [32, 32]
    model = ModelFactory.get_model(config)
    if name in ("TransformerUNet", "TransUNet"):
        from dfc_sa_unet_tpu.models.transunet import TransUNet, get_r50_b16_config

        cfg = get_r50_b16_config()
        cfg.update(patches_grid=(2, 2), resnet_num_layers=(1, 1, 1), hidden_size=48,
                   mlp_dim=64, num_heads=4, num_layers=1, n_classes=1)
        model = TransUNet(config=cfg, img_size=32, num_classes=1)

    trainer = Trainer(model, None, None, config, seed=0)
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.integers(0, 256, size=(2, size, size, 3), dtype=np.uint8),
        "mask": rng.integers(0, 256, size=(2, size, size), dtype=np.uint8),
    }
    state = trainer.init_state(batch)
    imgs, masks = jnp.asarray(batch["image"]), jnp.asarray(batch["mask"])
    import jax

    # _train_step donates the input state -- snapshot params to host first
    params_before = [np.asarray(l) for l in jax.tree.leaves(state.params)]
    new_state, metrics = trainer._train_step(state, imgs, masks)
    assert np.isfinite(float(metrics["loss"])), name
    # params actually changed
    changed = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(params_before, jax.tree.leaves(new_state.params))
    )
    assert changed, f"{name}: no parameter update"
    _, em = trainer._eval_step(new_state, imgs, masks)
    assert np.isfinite(float(em["loss"])), name


def test_bf16_train_step():
    """bf16 training regression: the conv VJP must not mix f32 cotangents
    with bf16 kernels (caught on real TPU; preferred_element_type fix)."""
    import jax.numpy as jnp

    config = _config("DFC-SA-Res-Block", SMALL, 32)
    model = ModelFactory.get_model(config, dtype=jnp.bfloat16)
    trainer = Trainer(model, None, None, config, seed=0, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.integers(0, 256, size=(2, 32, 32, 3), dtype=np.uint8),
        "mask": rng.integers(0, 256, size=(2, 32, 32), dtype=np.uint8),
    }
    state = trainer.init_state(batch)
    import jax

    s2, m = trainer._train_step(state, jnp.asarray(batch["image"]), jnp.asarray(batch["mask"]))
    assert np.isfinite(float(m["loss"]))
    # master params stay f32
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(s2.params))


@pytest.mark.parametrize("name,extra,size", [
    ("UNet", {}, 32),
    ("VisionTransformerSegmentation",
     {"img_dim": 32, "patch_dim": 8, "embed_dim": 16, "num_layers": 1, "num_heads": 2,
      "mlp_dim": 32, "dropout": 0.1, "segmentation_head_upsample_layers": 3}, 32),
    ("TransformerUNet", {}, 32),
], ids=["UNet", "ViT", "TransUNet"])
def test_bf16_train_step_other_families(name, extra, size):
    """bf16 backward coverage beyond the DFC family (Dense/LayerNorm/
    GroupNorm/WSConv/ConvTranspose VJP dtype paths)."""
    import jax.numpy as jnp

    config = _config(name, extra, size)
    if name in ("TransformerUNet", "TransUNet"):
        from dfc_sa_unet_tpu.models.transunet import TransUNet, get_r50_b16_config

        cfg = get_r50_b16_config()
        cfg.update(patches_grid=(2, 2), resnet_num_layers=(1, 1, 1), hidden_size=48,
                   mlp_dim=64, num_heads=4, num_layers=1, n_classes=1)
        model = TransUNet(config=cfg, img_size=32, num_classes=1, dtype=jnp.bfloat16)
    else:
        model = ModelFactory.get_model(config, dtype=jnp.bfloat16)
    trainer = Trainer(model, None, None, config, seed=0, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.integers(0, 256, size=(2, size, size, 3), dtype=np.uint8),
        "mask": rng.integers(0, 256, size=(2, size, size), dtype=np.uint8),
    }
    state = trainer.init_state(batch)
    import jax.numpy as jnp2

    _, m = trainer._train_step(state, jnp2.asarray(batch["image"]), jnp2.asarray(batch["mask"]))
    assert np.isfinite(float(m["loss"])), name
