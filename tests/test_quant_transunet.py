"""Int8 TransUNet serving engine: mechanics + end-metric Dice gate.

Mirror of tests/test_quant_vit.py for the TransUNet encoder path
(infer/quant_transunet.py).  The serving gate is END-METRIC
(BASELINE.json: Dice/IoU delta <= 1e-3), pinned here on CPU; the
throughput side runs on the real chip via ``bench.py --model
TransformerUNet --int8`` (probe chain: scripts/bench_int8_mha.py —
the encoder blocks share ViT-B's linear-stack shapes, PERF.md round 3).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.infer.quant_transunet import TRANSUNET_OPS, Int8TransUNetEngine
from dfc_sa_unet_tpu.models.transunet import TransUNet, get_r50_b16_config

CFG = {"model": {"name": "TransUNet", "in_channels": 3, "out_channels": 1},
       "dataset": {"img_size": [64, 64]}}


def small_vit_config():
    cfg = get_r50_b16_config()
    cfg.update(
        patches_grid=(4, 4), resnet_num_layers=(1, 1, 1), hidden_size=96,
        mlp_dim=64, num_heads=4, num_layers=2, n_classes=1,
    )
    return cfg


@pytest.fixture(scope="module")
def setup():
    vcfg = small_vit_config()
    model = TransUNet(config=vcfg, img_size=64, num_classes=1)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64, 64, 3)), jnp.float32
    )
    variables = model.init(jax.random.key(0), x, train=False)
    return model, vcfg, variables, x


@pytest.fixture(scope="module")
def fp_logits(setup):
    model, _, variables, x = setup
    return np.asarray(model.apply(variables, x, train=False))


def test_fp_engine_matches_module(setup, fp_logits):
    """int8_ops={} makes this the fp serving engine: the hand-rolled
    encoder + submodule backbone/decoder must reproduce model.apply
    bit-tightly in f32."""
    _, vcfg, variables, x = setup
    fp = Int8TransUNetEngine(CFG, variables, dtype=jnp.float32, int8_ops={},
                             use_pallas=False, vit_config=vcfg)
    np.testing.assert_allclose(np.asarray(fp(x)), fp_logits, atol=1e-5, rtol=1e-5)


def test_single_channel_repeat(setup):
    """1-channel inputs repeat to 3 exactly like the module
    (reference transformer_unet.py:362-364)."""
    model, vcfg, variables, _ = setup
    x1 = jnp.asarray(
        np.random.default_rng(5).standard_normal((1, 64, 64, 1)), jnp.float32
    )
    fp = Int8TransUNetEngine(CFG, variables, dtype=jnp.float32, int8_ops={},
                             use_pallas=False, vit_config=vcfg)
    want = np.asarray(model.apply(variables, x1, train=False))
    np.testing.assert_allclose(np.asarray(fp(x1)), want, atol=1e-5, rtol=1e-5)


def test_int8_auto_close_to_fp(setup, fp_logits):
    """AUTO (all four linears of every block, q/k/v packed) stays within
    tight prob-space error and flips no binarized pixels on this input."""
    _, vcfg, variables, x = setup
    q = Int8TransUNetEngine(CFG, variables, dtype=jnp.float32, calib_batches=[x],
                            use_pallas=False, vit_config=vcfg)
    assert q.int8_ops == {i: TRANSUNET_OPS for i in range(2)}
    pf = np.asarray(jax.nn.sigmoid(fp_logits))
    pq = np.asarray(jax.nn.sigmoid(q(x)))
    assert np.abs(pf - pq).max() < 5e-3
    assert ((pf > 0.5) == (pq > 0.5)).mean() > 0.999


def test_per_op_and_per_layer_selection(setup, fp_logits):
    _, vcfg, variables, x = setup
    q = Int8TransUNetEngine(CFG, variables, dtype=jnp.float32,
                            int8_ops=("fc1", "fc2"), calib_batches=[x],
                            use_pallas=False, vit_config=vcfg)
    assert q.int8_ops == {0: frozenset({"fc1", "fc2"}),
                          1: frozenset({"fc1", "fc2"})}
    assert set(q.qlayers[0]) == {"fc1", "fc2"}
    pq = np.asarray(jax.nn.sigmoid(q(x)))
    assert np.abs(np.asarray(jax.nn.sigmoid(fp_logits)) - pq).max() < 5e-3
    q2 = Int8TransUNetEngine(CFG, variables, dtype=jnp.float32,
                             int8_ops={1: ("qkv",)}, calib_batches=[x],
                             use_pallas=False, vit_config=vcfg)
    assert q2.int8_ops == {1: frozenset({"qkv"})}
    with pytest.raises(ValueError, match="unknown layers/ops"):
        Int8TransUNetEngine(CFG, variables, dtype=jnp.float32,
                            int8_ops={5: ("qkv",)}, act_scales="timing",
                            vit_config=vcfg)
    with pytest.raises(ValueError, match="unknown layers/ops"):
        Int8TransUNetEngine(CFG, variables, dtype=jnp.float32,
                            int8_ops=("conv",), act_scales="timing",
                            vit_config=vcfg)


def test_act_scales_reusable_and_validated(setup):
    _, vcfg, variables, x = setup
    q = Int8TransUNetEngine(CFG, variables, dtype=jnp.float32, calib_batches=[x],
                            use_pallas=False, vit_config=vcfg)
    q2 = Int8TransUNetEngine(CFG, variables, dtype=jnp.float32,
                             act_scales=q.act_scales, use_pallas=False,
                             vit_config=vcfg)
    assert q2.act_scales == q.act_scales
    for i in q.qlayers:
        for op, (qk, sc) in q.qlayers[i].items():
            np.testing.assert_array_equal(np.asarray(qk), np.asarray(q2.qlayers[i][op][0]))
            np.testing.assert_array_equal(np.asarray(sc), np.asarray(q2.qlayers[i][op][1]))
    with pytest.raises(ValueError, match="missing"):
        Int8TransUNetEngine(CFG, variables, dtype=jnp.float32,
                            act_scales={"0.ln_a": 0.1}, vit_config=vcfg)
    with pytest.raises(ValueError, match="act_scales or calib"):
        Int8TransUNetEngine(CFG, variables, dtype=jnp.float32, vit_config=vcfg)
    with pytest.raises(ValueError, match="serves TransformerUNet"):
        Int8TransUNetEngine({"model": {"name": "UNet"}}, variables)


def test_timing_scales_build_and_run(setup):
    """act_scales='timing' (bench.py's graph-identical placeholder
    scales) must build AUTO and produce finite output of the right
    shape — accuracy is deliberately garbage."""
    _, vcfg, variables, x = setup
    q = Int8TransUNetEngine(CFG, variables, dtype=jnp.float32,
                            act_scales="timing", use_pallas=False,
                            vit_config=vcfg)
    assert q.int8_ops == {i: TRANSUNET_OPS for i in range(2)}
    y = np.asarray(q(x))
    assert y.shape == (2, 64, 64, 1) and np.isfinite(y).all()


def test_fused_mha_path_matches_lax(setup):
    """use_pallas=True (interpret mode on CPU) must agree with the lax
    attention inside the engine — the packed-at-build q/k/v feed
    fused_mha exactly like ViT-seg's in_proj does."""
    _, vcfg, variables, x = setup
    a = Int8TransUNetEngine(CFG, variables, dtype=jnp.float32, int8_ops={},
                            use_pallas=False, vit_config=vcfg)
    b = Int8TransUNetEngine(CFG, variables, dtype=jnp.float32, int8_ops={},
                            use_pallas=True, vit_config=vcfg)
    np.testing.assert_allclose(np.asarray(a(x)), np.asarray(b(x)),
                               atol=1e-5, rtol=1e-5)


def test_data_parallel_int8_engine_matches_single_device(setup):
    """inference.py --int8 --data_parallel composition for TransUNet: the
    engine apply_fn (weights closed over as jit constants) under
    Predictor's mesh path must equal the single-device int8
    probabilities (mirrors the DFC test in test_parallel_fast.py)."""
    from dfc_sa_unet_tpu.data.loader import normalize_on_device
    from dfc_sa_unet_tpu.infer.predictor import Predictor
    from dfc_sa_unet_tpu.parallel import data_parallel_mesh

    model, vcfg, variables, _ = setup
    imgs = np.random.default_rng(7).integers(
        0, 256, size=(8, 64, 64, 3), dtype=np.uint8
    )
    engine = Int8TransUNetEngine(
        CFG, variables, dtype=jnp.float32, use_pallas=False, vit_config=vcfg,
        calib_batches=[normalize_on_device(jnp.asarray(imgs))],
    )
    apply_fn = lambda _, x: engine._forward(x)  # noqa: E731

    p1 = Predictor(model, variables, apply_fn=apply_fn)
    pm = Predictor(model, variables, apply_fn=apply_fn, mesh=data_parallel_mesh())
    want = p1.predict_probs(imgs)
    got = pm.predict_probs(imgs)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


@pytest.mark.slow
def test_int8_transunet_dice_delta_gate_end_to_end(tmp_path):
    """The north-star gate for the TransUNet path: train a small
    TransUNet into a real segmenter on the synthetic set, then require
    |Dice(fp) - Dice(int8)| <= 1e-3.

    Like the ViT gate (tests/test_quant_vit.py), the Dice comparison
    runs on the TRAINING images (a shrunk encoder memorizes 16
    synthetic frames without generalizing, which would make a held-out
    gate vacuous); calibration still uses the held-out frames so the
    scales are not tuned on the evaluation set."""
    from dfc_sa_unet_tpu.data.loader import DataLoaderFactory, normalize_on_device
    from dfc_sa_unet_tpu.data.synthetic import generate
    from dfc_sa_unet_tpu.metrics import confusion_counts, metrics_from_counts
    from dfc_sa_unet_tpu.train.trainer import Trainer

    root = generate(str(tmp_path / "d"), n=16, size=64, seed=3)
    val_root = generate(str(tmp_path / "v"), n=8, size=64, seed=4)
    cfg = {
        "training": {"num_epochs": 12, "batch_size": 8, "learning_rate": 0.02,
                     "momentum": 0.9, "weight_decay": 1e-4, "num_workers": 1,
                     "save_checkpoint_freq": 1000, "device": "auto",
                     "loss": {"type": "bce_dice",
                              "params": {"bce_weight": 0.5, "dice_weight": 0.5}}},
        "model": CFG["model"],
        "dataset": {"train_dir": root, "val_dir": val_root, "img_size": [64, 64],
                    "augmentation": False},
        "logging": {"log_dir": str(tmp_path / "logs"),
                    "images_dir": str(tmp_path / "images"),
                    "save_best_worst_samples": 0},
    }
    vcfg = small_vit_config()
    model = TransUNet(config=vcfg, img_size=64, num_classes=1)
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

    fp = Int8TransUNetEngine(cfg, variables, dtype=jnp.float32, int8_ops={},
                             use_pallas=False, vit_config=vcfg)
    q = Int8TransUNetEngine(cfg, variables, dtype=jnp.float32,
                            calib_batches=[calib], use_pallas=False,
                            vit_config=vcfg)

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
