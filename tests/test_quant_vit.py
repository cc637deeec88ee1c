"""Int8 transformer serving engine: mechanics + end-metric Dice gate.

Mirror of tests/test_quant.py for the ViT-B encoder path
(infer/quant_vit.py).  The serving gate is END-METRIC (BASELINE.json:
Dice/IoU delta <= 1e-3), pinned here on CPU; the throughput side runs
on the real chip via ``bench.py --model VisionTransformerSegmentation
--int8`` (probe chain: scripts/bench_int8_mha.py, PERF.md round 3).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.infer.quant_vit import VIT_OPS, Int8ViTEngine
from dfc_sa_unet_tpu.models.factory import ModelFactory

CFG = {"model": {"name": "VisionTransformerSegmentation", "in_channels": 3,
                 "out_channels": 1, "img_dim": 32, "patch_dim": 8,
                 "embed_dim": 32, "num_layers": 2, "num_heads": 4,
                 "mlp_dim": 64, "dropout": 0.1}}


@pytest.fixture(scope="module")
def setup():
    model = ModelFactory.get_model(CFG)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 32, 32, 3)), jnp.float32
    )
    variables = model.init(jax.random.key(0), x, train=False)
    return model, variables, x


@pytest.fixture(scope="module")
def fp_logits(setup):
    model, variables, x = setup
    return np.asarray(model.apply(variables, x, train=False))


def test_fp_engine_matches_module(setup, fp_logits):
    """int8_ops={} makes this the fp serving engine: folded-BN head +
    lax attention must reproduce model.apply bit-tightly in f32."""
    _, variables, x = setup
    fp = Int8ViTEngine(CFG, variables, dtype=jnp.float32, int8_ops={},
                       use_pallas=False)
    np.testing.assert_allclose(np.asarray(fp(x)), fp_logits, atol=1e-5, rtol=1e-5)


def test_int8_auto_close_to_fp(setup, fp_logits):
    """AUTO (all four linears of every block) stays within tight
    prob-space error and flips no binarized pixels on this input."""
    _, variables, x = setup
    q = Int8ViTEngine(CFG, variables, dtype=jnp.float32, calib_batches=[x],
                      use_pallas=False)
    assert q.int8_ops == {i: VIT_OPS for i in range(2)}
    pf = np.asarray(jax.nn.sigmoid(fp_logits))
    pq = np.asarray(jax.nn.sigmoid(q(x)))
    assert np.abs(pf - pq).max() < 5e-3
    assert ((pf > 0.5) == (pq > 0.5)).mean() > 0.999


def test_per_op_and_per_layer_selection(setup, fp_logits):
    _, variables, x = setup
    # op subset applied to every layer
    q = Int8ViTEngine(CFG, variables, dtype=jnp.float32,
                      int8_ops=("fc1", "fc2"), calib_batches=[x],
                      use_pallas=False)
    assert q.int8_ops == {0: frozenset({"fc1", "fc2"}),
                          1: frozenset({"fc1", "fc2"})}
    assert set(q.qlayers[0]) == {"fc1", "fc2"}
    pq = np.asarray(jax.nn.sigmoid(q(x)))
    assert np.abs(np.asarray(jax.nn.sigmoid(fp_logits)) - pq).max() < 5e-3
    # per-layer mapping
    q2 = Int8ViTEngine(CFG, variables, dtype=jnp.float32,
                       int8_ops={1: ("qkv",)}, calib_batches=[x],
                       use_pallas=False)
    assert q2.int8_ops == {1: frozenset({"qkv"})}
    with pytest.raises(ValueError, match="unknown layers/ops"):
        Int8ViTEngine(CFG, variables, dtype=jnp.float32,
                      int8_ops={5: ("qkv",)}, act_scales="timing")
    with pytest.raises(ValueError, match="unknown layers/ops"):
        Int8ViTEngine(CFG, variables, dtype=jnp.float32,
                      int8_ops=("conv",), act_scales="timing")


def test_act_scales_reusable_and_validated(setup):
    _, variables, x = setup
    q = Int8ViTEngine(CFG, variables, dtype=jnp.float32, calib_batches=[x],
                      use_pallas=False)
    # captured scales rebuild an identical engine without calibration data
    q2 = Int8ViTEngine(CFG, variables, dtype=jnp.float32,
                       act_scales=q.act_scales, use_pallas=False)
    assert q2.act_scales == q.act_scales
    for i in q.qlayers:
        for op, (qk, sc) in q.qlayers[i].items():
            np.testing.assert_array_equal(np.asarray(qk), np.asarray(q2.qlayers[i][op][0]))
            np.testing.assert_array_equal(np.asarray(sc), np.asarray(q2.qlayers[i][op][1]))
    with pytest.raises(ValueError, match="missing"):
        Int8ViTEngine(CFG, variables, dtype=jnp.float32, act_scales={"0.x": 0.1})
    with pytest.raises(ValueError, match="act_scales or calib"):
        Int8ViTEngine(CFG, variables, dtype=jnp.float32)
    with pytest.raises(ValueError, match="serves VisionTransformer"):
        Int8ViTEngine({"model": {"name": "UNet"}}, variables)


def test_fused_mha_path_matches_lax(setup):
    """use_pallas=True (interpret mode on CPU) must agree with the lax
    attention inside the engine — same guarantee the module path has."""
    _, variables, x = setup
    a = Int8ViTEngine(CFG, variables, dtype=jnp.float32, int8_ops={},
                      use_pallas=False)
    b = Int8ViTEngine(CFG, variables, dtype=jnp.float32, int8_ops={},
                      use_pallas=True)
    np.testing.assert_allclose(np.asarray(a(x)), np.asarray(b(x)),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_int8_vit_dice_delta_gate_end_to_end(tmp_path):
    """The north-star gate for the transformer path: train a small
    ViT-seg into a real segmenter on the synthetic set, then require
    |Dice(fp) - Dice(int8)| <= 1e-3.

    Unlike the DFC gate (tests/test_quant.py), the Dice comparison runs
    on the TRAINING images: a 2-layer ViT trained on 16 synthetic
    images memorizes (train Dice ~0.96) but does not generalize to
    held-out frames (val Dice ~0), so held-out masks would make the
    gate vacuous (0 vs 0).  The gate's subject is the QUANTIZATION
    delta on a model that genuinely segments its inputs — which the
    train set provides; calibration still uses the held-out frames so
    the scales are not tuned on the evaluation set."""
    from dfc_sa_unet_tpu.data.loader import DataLoaderFactory, normalize_on_device
    from dfc_sa_unet_tpu.data.synthetic import generate
    from dfc_sa_unet_tpu.metrics import confusion_counts, metrics_from_counts
    from dfc_sa_unet_tpu.train.trainer import Trainer

    root = generate(str(tmp_path / "d"), n=16, size=32, seed=3)
    val_root = generate(str(tmp_path / "v"), n=8, size=32, seed=4)
    cfg = {
        # lr 0.05 blows this tiny ViT up around epoch 38 (params -> NaN;
        # the NaN-skip guard only blocks non-finite GRADIENT steps) —
        # 0.02 trains stably to ~0.88 train Dice
        "training": {"num_epochs": 40, "batch_size": 8, "learning_rate": 0.02,
                     "momentum": 0.9, "weight_decay": 1e-4, "num_workers": 1,
                     "save_checkpoint_freq": 1000, "device": "auto",
                     "loss": {"type": "bce_dice",
                              "params": {"bce_weight": 0.5, "dice_weight": 0.5}}},
        "model": CFG["model"],
        "dataset": {"train_dir": root, "val_dir": val_root, "img_size": [32, 32],
                    "augmentation": False},
        "logging": {"log_dir": str(tmp_path / "logs"),
                    "images_dir": str(tmp_path / "images"),
                    "save_best_worst_samples": 0},
    }
    model = ModelFactory.get_model(cfg)
    factory = DataLoaderFactory(cfg, seed=0)
    trainer = Trainer(model, factory.get_train_loader(), factory.get_val_loader(),
                      cfg, mesh=None, seed=0)
    batch = next(iter(factory.get_train_loader()))
    state = trainer.init_state(batch)
    for epoch in range(cfg["training"]["num_epochs"]):
        state, _ = trainer.train_epoch(state, epoch)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    train = list(factory.get_train_loader())
    imgs = np.concatenate([b["image"] for b in train])
    masks = np.concatenate([b["mask"] for b in train])
    xs = normalize_on_device(jnp.asarray(imgs), jnp.float32)
    val = list(factory.get_val_loader())
    calib = normalize_on_device(
        jnp.asarray(np.concatenate([b["image"] for b in val])), jnp.float32
    )

    fp = Int8ViTEngine(cfg, variables, dtype=jnp.float32, int8_ops={},
                       use_pallas=False)
    q = Int8ViTEngine(cfg, variables, dtype=jnp.float32,
                      calib_batches=[calib], use_pallas=False)

    def micro_dice(engine):
        probs = np.asarray(jax.nn.sigmoid(engine._forward(xs)))[..., 0]
        pred = (probs > 0.5).astype(np.uint8)
        gt = (masks > 127).astype(np.uint8)
        c = confusion_counts(jnp.asarray(pred), jnp.asarray(gt))
        return metrics_from_counts(**{k: int(v) for k, v in c.items()})["dice_f1"]

    d_fp = micro_dice(fp)
    d_q = micro_dice(q)
    assert d_fp > 0.5, f"fp model failed to train (dice {d_fp})"
    assert abs(d_fp - d_q) <= 1e-3, (d_fp, d_q)
