"""Int8 quantized serving engine: mechanics + end-metric Dice gate.

The serving gate for int8 is END-METRIC (BASELINE.json north star:
Dice/IoU delta <= 1e-3), not bitwise parity — these tests pin both the
quantization mechanics and that gate on CPU.  The throughput side is
measured on the real chip (scripts/bench_int8*.py, bench.py --int8).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.infer.engine import DFCEngine
from dfc_sa_unet_tpu.infer.quant import (
    AUTO_INT8_OPS, Int8DFCEngine, quantize_act, quantize_weight,
)
from dfc_sa_unet_tpu.models.factory import ModelFactory

CFG = {"model": {"name": "DFC-SA-Res-Block", "in_channels": 3, "out_channels": 1,
                 "features": [8, 16, 24, 32], "pool_size": 4}}
ALL_LEVELS = [f"down{i}" for i in range(1, 5)] + ["bottleneck"] + [
    f"up_conv{i}" for i in range(4, 0, -1)
]


@pytest.fixture(scope="module")
def setup():
    model = ModelFactory.get_model(CFG)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64, 64, 3)), jnp.float32
    )
    variables = model.init(jax.random.key(0), x, train=False)
    return model, variables, x


@pytest.fixture(scope="module")
def fp_probs(setup):
    _, variables, x = setup
    fp = DFCEngine(CFG, variables, dtype=jnp.float32)
    return np.asarray(jax.nn.sigmoid(fp._forward(x)))


@pytest.fixture(scope="module")
def q_auto(setup):
    _, variables, x = setup
    return Int8DFCEngine(CFG, variables, dtype=jnp.float32, calib_batches=[x])


def test_quantize_weight_roundtrip_bound():
    rng = np.random.default_rng(1)
    k = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.2, jnp.float32)
    q, s = quantize_weight(k)
    assert q.dtype == jnp.int8 and s.shape == (8,)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(k))
    # symmetric per-channel: error bounded by half a quantization step
    assert err.max() <= float(np.asarray(s).max()) * 0.5 + 1e-7


def test_quantize_act_clips_and_rounds():
    x = jnp.asarray([[-300.0, -1.0, 0.0, 0.26, 300.0]], jnp.float32)
    q = quantize_act(x, 0.5)
    # symmetric clip: [-127, 127] so dequant error is sign-balanced
    np.testing.assert_array_equal(np.asarray(q), [[-127, -2, 0, 1, 127]])


def test_int8_engine_matches_fp_engine(setup, fp_probs, q_auto):
    """Auto-level int8 engine stays within tight prob-space error of the
    fp engine and produces identical binarized masks on this input."""
    _, _, x = setup
    assert q_auto.int8_ops == dict(AUTO_INT8_OPS)
    pq = np.asarray(jax.nn.sigmoid(q_auto._forward(x)))
    assert np.abs(fp_probs - pq).max() < 5e-3
    assert ((fp_probs > 0.5) == (pq > 0.5)).mean() > 0.999


@pytest.mark.slow
def test_int8_engine_all_levels_runs(setup, fp_probs):
    """Every level quantized (incl. the small-Cin ones kept bf16 in auto
    mode for speed) still tracks the fp engine closely."""
    _, variables, x = setup
    q = Int8DFCEngine(CFG, variables, dtype=jnp.float32, int8_levels=ALL_LEVELS,
                      calib_batches=[x])
    pq = np.asarray(jax.nn.sigmoid(q._forward(x)))
    assert np.abs(fp_probs - pq).max() < 1e-2


def test_act_scales_reusable_and_validated(setup, q_auto):
    _, variables, x = setup
    # captured scales rebuild an identical engine without calibration data
    # (same scales + same quantized weights => same jitted computation;
    # running the forward again would only re-pay the CPU compile)
    q2 = Int8DFCEngine(CFG, variables, dtype=jnp.float32, act_scales=q_auto.act_scales)
    assert q2.act_scales == q_auto.act_scales
    for name in q_auto.qblocks:
        for key, val in q_auto.qblocks[name].items():
            if val is None:
                assert q2.qblocks[name][key] is None
                continue
            np.testing.assert_array_equal(np.asarray(val[0]), np.asarray(q2.qblocks[name][key][0]))
            np.testing.assert_array_equal(np.asarray(val[1]), np.asarray(q2.qblocks[name][key][1]))
    with pytest.raises(ValueError, match="missing"):
        Int8DFCEngine(CFG, variables, dtype=jnp.float32, act_scales={"down4.x": 0.1})
    with pytest.raises(ValueError, match="act_scales or calib"):
        Int8DFCEngine(CFG, variables, dtype=jnp.float32)


@pytest.mark.slow
def test_int8_dice_delta_gate_end_to_end(tmp_path):
    """The north-star gate: train a small model to a real segmenter on
    the synthetic set, then require |Dice(fp) - Dice(int8)| <= 1e-3 on
    held-out synthetic validation (end metric, micro Dice)."""
    from dfc_sa_unet_tpu.data.loader import DataLoaderFactory, normalize_on_device
    from dfc_sa_unet_tpu.data.synthetic import generate
    from dfc_sa_unet_tpu.metrics import confusion_counts, metrics_from_counts
    from dfc_sa_unet_tpu.train.trainer import Trainer

    root = generate(str(tmp_path / "d"), n=16, size=64, seed=3)
    val_root = generate(str(tmp_path / "v"), n=8, size=64, seed=4)
    cfg = {
        "training": {"num_epochs": 30, "batch_size": 8, "learning_rate": 0.05,
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
    model = ModelFactory.get_model(cfg)
    factory = DataLoaderFactory(cfg, seed=0)
    trainer = Trainer(model, factory.get_train_loader(), factory.get_val_loader(),
                      cfg, mesh=None, seed=0)
    batch = next(iter(factory.get_train_loader()))
    state = trainer.init_state(batch)
    for epoch in range(cfg["training"]["num_epochs"]):
        state, _ = trainer.train_epoch(state, epoch)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    val = list(factory.get_val_loader())
    imgs = np.concatenate([b["image"] for b in val])
    masks = np.concatenate([b["mask"] for b in val])
    xs = normalize_on_device(jnp.asarray(imgs), jnp.float32)

    fp = DFCEngine(cfg, variables, dtype=jnp.float32)
    q = Int8DFCEngine(cfg, variables, dtype=jnp.float32, calib_batches=[xs[:8]])

    def micro_dice(engine):
        probs = np.asarray(jax.nn.sigmoid(engine._forward(xs)))[..., 0]
        pred = (probs > 0.5).astype(np.uint8)
        gt = (masks > 127).astype(np.uint8)  # loader masks are [B, H, W] u8
        c = confusion_counts(jnp.asarray(pred), jnp.asarray(gt))
        return metrics_from_counts(**{k: int(v) for k, v in c.items()})["dice_f1"]

    d_fp = micro_dice(fp)
    d_q = micro_dice(q)
    # the model must actually segment for the gate to be meaningful
    assert d_fp > 0.5, f"fp model failed to train (dice {d_fp})"
    assert abs(d_fp - d_q) <= 1e-3, (d_fp, d_q)


# ------------------------------------------------- calibration hardening

@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """A briefly-trained small segmenter: at random init the deep
    (quantized) levels barely influence the logits, so scale-corruption
    effects only show on a model whose deep features carry signal."""
    from dfc_sa_unet_tpu.data.loader import DataLoaderFactory, normalize_on_device
    from dfc_sa_unet_tpu.data.synthetic import generate
    from dfc_sa_unet_tpu.train.trainer import Trainer

    tmp = tmp_path_factory.mktemp("quant_trained")
    root = generate(str(tmp / "d"), n=16, size=64, seed=3)
    cfg = {
        "training": {"num_epochs": 12, "batch_size": 8, "learning_rate": 0.05,
                     "momentum": 0.9, "weight_decay": 1e-4, "num_workers": 1,
                     "save_checkpoint_freq": 1000, "device": "auto",
                     "loss": {"type": "bce_dice",
                              "params": {"bce_weight": 0.5, "dice_weight": 0.5}}},
        "model": CFG["model"],
        "dataset": {"train_dir": root, "val_dir": root, "img_size": [64, 64],
                    "augmentation": False},
        "logging": {"log_dir": str(tmp / "logs"), "images_dir": str(tmp / "img"),
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
    imgs = np.concatenate([b["image"] for b in factory.get_val_loader()])
    xs = normalize_on_device(jnp.asarray(imgs), jnp.float32)
    return cfg, variables, xs


def test_percentile_calibration_robust_to_outlier(trained):
    """An outlier calibration image inflates max-abs scales; percentile
    calibration keeps them near the clean values and serves clean data
    with smaller error (VERDICT r3 item 5)."""
    cfg, variables, xs = trained
    x = xs[:8]
    x_out = x.at[0, :8, :8, :].set(500.0)  # one wild patch (~0.4% of pixels)

    clean = Int8DFCEngine(cfg, variables, dtype=jnp.float32, calib_batches=[x])
    e_max = Int8DFCEngine(cfg, variables, dtype=jnp.float32, calib_batches=[x_out])
    e_pct = Int8DFCEngine(cfg, variables, dtype=jnp.float32, calib_batches=[x_out],
                          calib_percentile=99.0)

    # the outlier blows up the max-abs input scale; the percentile scale
    # stays within a small factor of the clean calibration
    k = "down1.x"
    assert e_max.act_scales[k] > 10 * clean.act_scales[k]
    assert e_pct.act_scales[k] < 5 * clean.act_scales[k]

    # and the percentile engine serves CLEAN data closer to fp
    fp = DFCEngine(cfg, variables, dtype=jnp.float32)
    fp_probs = np.asarray(jax.nn.sigmoid(fp._forward(xs)))
    err_max = np.abs(np.asarray(jax.nn.sigmoid(e_max._forward(xs))) - fp_probs).max()
    err_pct = np.abs(np.asarray(jax.nn.sigmoid(e_pct._forward(xs))) - fp_probs).max()
    assert err_pct < err_max


def test_self_check_passes_on_clean_calibration(trained):
    """Calibrated engine on its own data: int8_self_check reports a small
    flip rate and does not raise under strict."""
    from dfc_sa_unet_tpu.infer.quant import int8_self_check

    cfg, variables, xs = trained
    eng = Int8DFCEngine(cfg, variables, dtype=jnp.float32, calib_batches=[xs[:8]])
    assert eng.calib_batch is not None and eng.calib_fp_probs is not None
    chk = int8_self_check(eng, strict=True)
    assert chk is not None and chk["flip_rate"] <= 5e-3


def test_self_check_flags_broken_scales(trained, capsys):
    """Corrupted activation scales (stand-in for a pathological
    checkpoint/calibration combination) must trip the self-check: warning
    by default, RuntimeError under strict."""
    from dfc_sa_unet_tpu.infer.quant import int8_self_check

    cfg, variables, xs = trained

    def broken():
        # every level quantized: the AUTO set's deep-levels-only slice is
        # too insensitive on this tiny model (shallow fp skips carry the
        # mask) to demonstrate the check — the check itself is the same
        e = Int8DFCEngine(cfg, variables, dtype=jnp.float32,
                          int8_levels=ALL_LEVELS, calib_batches=[xs[:8]])
        # scales 1000x too small: every quantize saturates and the
        # features are destroyed (measured flip ~16% vs legit ~0.01%)
        e.act_scales = {k: v / 1000.0 for k, v in e.act_scales.items()}
        return e

    chk = int8_self_check(broken())  # warns
    assert chk["flip_rate"] > 5e-3
    assert "self-check" in capsys.readouterr().out
    with pytest.raises(RuntimeError, match="self-check"):
        int8_self_check(broken(), strict=True)


def test_self_check_multichannel_uses_argmax():
    """A multi-channel (softmax-semantics) head is gated on argmax
    disagreement, not per-channel 0.5 thresholds (ADVICE r4): a uniform
    logit shift flips every per-channel threshold but no argmax."""
    from dfc_sa_unet_tpu.infer.quant import int8_self_check

    class FakeEngine:
        def __init__(self, logits_fp, logits_q):
            self.calib_batch = jnp.zeros((1,))
            self.calib_fp_probs = jax.nn.sigmoid(jnp.asarray(logits_fp, jnp.float32))
            self._q = jnp.asarray(logits_q, jnp.float32)

        def _forward(self, x):
            return self._q

    rng = np.random.default_rng(3)
    fp = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    # shift every logit by -10: every sigmoid crosses 0.5 (old metric
    # would read flip_rate 1.0) but the argmax class never changes
    eng = FakeEngine(fp, fp - 10.0)
    chk = int8_self_check(eng, strict=True)
    assert chk["flip_rate"] == 0.0
    # a real class swap is caught
    swapped = fp[..., ::-1].copy()
    chk = int8_self_check(FakeEngine(fp, swapped))
    assert chk["flip_rate"] > 0.5
    # single-channel path unchanged: the same -10 shift IS a mask flip
    fp1 = rng.normal(size=(2, 4, 4, 1)).astype(np.float32)
    chk = int8_self_check(FakeEngine(fp1, fp1 - 10.0))
    assert chk["flip_rate"] > 0.5


def test_percentile_default_is_throughput_neutral(trained):
    """The r5 default flip to --int8_percentile 99.9 cannot cost
    throughput: percentile vs max-abs calibration changes only the
    VALUES of the baked scale constants, not the compiled graph — the
    lowered forwards have identical op-type histograms and identical
    XLA-costed flops (the zoo-neutrality evidence for VERDICT r4 item 7,
    stronger than a tunnel timing A/B which carries ±6.5% session
    noise)."""
    import re
    from collections import Counter

    cfg, variables, xs = trained
    e_max = Int8DFCEngine(cfg, variables, dtype=jnp.float32, calib_batches=[xs[:8]])
    e_pct = Int8DFCEngine(cfg, variables, dtype=jnp.float32, calib_batches=[xs[:8]],
                          calib_percentile=99.9)
    assert e_max.act_scales != e_pct.act_scales  # the A/B is real

    def signature(engine):
        lowered = jax.jit(engine._build_forward()).lower(xs[:8])
        ops = Counter(re.findall(r"^\s*(?:ROOT )?%?[\w.-]+ = \S+ (\w+)\(",
                                 lowered.compile().as_text(), re.M))
        cost = lowered.compile().cost_analysis()
        return ops, cost.get("flops")

    ops_max, flops_max = signature(e_max)
    ops_pct, flops_pct = signature(e_pct)
    assert ops_max == ops_pct
    assert flops_max == flops_pct


def test_self_check_holdout_batch(trained, capsys):
    """VERDICT r4 item 7: with a holdout_batch the self-check also gates
    on data the scales were NOT calibrated on (captured with the same
    compiled fp forward), and the gate applies to the worst of the two."""
    from dfc_sa_unet_tpu.infer.quant import int8_self_check

    cfg, variables, xs = trained
    eng = Int8DFCEngine(cfg, variables, dtype=jnp.float32,
                        calib_batches=[xs[:8]], holdout_batch=xs[8:16])
    assert eng.holdout_fp_probs is not None
    chk = int8_self_check(eng, strict=True)
    assert {"flip_rate", "mean_abs_dprob",
            "holdout_flip_rate", "holdout_mean_abs_dprob"} <= set(chk)
    assert chk["holdout_flip_rate"] <= 5e-3

    # a holdout-only breach trips the gate even when the calibration
    # batch agrees: fake a perfect calib reference + corrupted holdout ref
    eng.calib_fp_probs = jax.nn.sigmoid(
        eng._forward(eng.calib_batch).astype(jnp.float32))
    eng.holdout_fp_probs = 1.0 - eng.holdout_fp_probs
    chk = int8_self_check(eng)  # warns
    assert chk["holdout_flip_rate"] > 5e-3 >= chk["flip_rate"]
    assert "held-out" in capsys.readouterr().out
    with pytest.raises(RuntimeError, match="held-out"):
        eng2 = Int8DFCEngine(cfg, variables, dtype=jnp.float32,
                             calib_batches=[xs[:8]], holdout_batch=xs[8:16])
        eng2.calib_fp_probs = jax.nn.sigmoid(
            eng2._forward(eng2.calib_batch).astype(jnp.float32))
        eng2.holdout_fp_probs = 1.0 - eng2.holdout_fp_probs
        int8_self_check(eng2, strict=True)


def test_self_check_none_without_calibration(setup):
    """Engines built from preset scales have no calibration reference —
    the self-check reports None rather than guessing."""
    from dfc_sa_unet_tpu.infer.quant import int8_self_check

    _, variables, x = setup
    eng = Int8DFCEngine(CFG, variables, dtype=jnp.float32, act_scales="timing")
    assert int8_self_check(eng) is None
