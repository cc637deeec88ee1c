"""Fast multi-device smoke tests (in the default gate, unlike
test_parallel.py's slow set): a sharded-vs-single train step and the
padded+masked partial eval batch.  Tiny shapes so the whole file compiles
and runs in well under a minute on the 1-core CPU conftest."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.data.synthetic import generate
from dfc_sa_unet_tpu.data.loader import DataLoaderFactory
from dfc_sa_unet_tpu.models.factory import ModelFactory
from dfc_sa_unet_tpu.parallel import data_parallel_mesh
from dfc_sa_unet_tpu.train.trainer import Trainer


def _config(root, log_dir, batch=8):
    return {
        "training": {"num_epochs": 1, "batch_size": batch, "learning_rate": 0.01,
                     "momentum": 0.9, "weight_decay": 1e-4, "num_workers": 1,
                     "save_checkpoint_freq": 10, "device": "auto",
                     "loss": {"type": "bce_dice",
                              "params": {"bce_weight": 0.5, "dice_weight": 0.5}}},
        "model": {"name": "DFC-SA-Res-Block", "features": [4, 8, 12, 16], "pool_size": 1},
        "dataset": {"train_dir": root, "val_dir": root, "img_size": [16, 16],
                    "augmentation": False},
        "logging": {"log_dir": log_dir, "images_dir": log_dir + "/images",
                    "save_best_worst_samples": 0},
    }


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pfast")
    root = generate(str(tmp / "d"), n=8, size=16, seed=21)
    cfg = _config(root, str(tmp / "logs"))
    loader = DataLoaderFactory(cfg, seed=0).get_val_loader()
    batch = next(iter(loader))
    model = ModelFactory.get_model(cfg)
    return cfg, loader, batch, model


class _MiniNet:
    """Tiny conv+BN+conv module over the framework's own nn layers —
    compiles in seconds on CPU while still exercising every piece of the
    SPMD train machinery the flagship uses (cross-replica BatchNorm via
    the contextvar axis, donated TrainState, _put_batch sharding).  The
    full flagship sharded-vs-single check stays in the slow set
    (test_parallel.py)."""

    def __new__(cls):
        import flax.linen as nn

        from dfc_sa_unet_tpu.nn.layers import BatchNorm, Conv

        class MiniNet(nn.Module):
            @nn.compact
            def __call__(self, x, train: bool = False):
                x = Conv(features=4, kernel_size=3, padding=1, name="c1")(x)
                x = BatchNorm(name="bn1")(x, train=train)
                x = nn.relu(x)
                return Conv(features=1, kernel_size=1, name="c2")(x)

        return MiniNet()


def test_sharded_train_step_matches_single_device_fast(setup):
    """The SPMD regression canary for the default gate: one GSPMD-sharded
    train step must equal the single-device step (global grads + global
    BN batch statistics by construction)."""
    cfg, loader, batch, _ = setup
    model = _MiniNet()

    t1 = Trainer(model, loader, loader, cfg, mesh=None, seed=0)
    s1 = t1.init_state(batch)
    s1n, m1 = t1._train_step(s1, jnp.asarray(batch["image"]), jnp.asarray(batch["mask"]))

    mesh = data_parallel_mesh()
    t8 = Trainer(model, loader, loader, cfg, mesh=mesh, seed=0)
    s8 = t8.init_state(batch)
    imgs, masks, valid = t8._put_batch(batch)
    assert valid is None
    assert len(imgs.sharding.device_set) == 8, imgs.sharding
    s8n, m8 = t8._train_step(s8, imgs, masks)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1n.params), jax.tree.leaves(s8n.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1n.batch_stats), jax.tree.leaves(s8n.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_partial_eval_batch_stays_sharded_and_exact(setup):
    """A val batch of 6 on the 8-device mesh: _put_batch pads it to 8 and
    shards (previously it silently ran replicated), and the mask-aware
    eval step reproduces the unpadded single-device metrics exactly.
    (Mini-net for compile speed; the flagship version runs in the slow
    set, test_parallel.py.)"""
    cfg, loader, batch, _ = setup
    model = _MiniNet()
    small = {k: (v[:6] if hasattr(v, "__getitem__") and not isinstance(v, str) else v)
             for k, v in batch.items()}
    assert small["image"].shape[0] == 6

    # single-device reference (no padding anywhere)
    t1 = Trainer(model, loader, loader, cfg, mesh=None, seed=0)
    s1 = t1.init_state(batch)
    _, m1 = t1._eval_step(s1, jnp.asarray(small["image"]), jnp.asarray(small["mask"]), None)

    mesh = data_parallel_mesh()
    t8 = Trainer(model, loader, loader, cfg, mesh=mesh, seed=0)
    s8 = t8.init_state(batch)
    imgs, masks, valid = t8._put_batch(small, pad_to_devices=True)
    assert imgs.shape[0] == 8 and masks.shape[0] == 8
    assert valid is not None and valid.shape == (8,)
    np.testing.assert_array_equal(np.asarray(valid), [1, 1, 1, 1, 1, 1, 0, 0])
    # actually sharded over all 8 devices, one sample per device
    assert len(imgs.sharding.device_set) == 8, imgs.sharding
    assert imgs.addressable_shards[0].data.shape[0] == 1

    _, m8 = t8._eval_step(s8, imgs, masks, valid)
    for key in ("loss", "iou", "dice"):
        np.testing.assert_allclose(float(m1[key]), float(m8[key]), atol=1e-5, rtol=1e-5,
                                   err_msg=key)
    # per-sample metrics of the valid entries match; padded tail is inert
    for key in ("per_sample_iou", "per_sample_dice"):
        np.testing.assert_allclose(
            np.asarray(m8[key])[:6], np.asarray(m1[key]), atol=1e-5, rtol=1e-4, err_msg=key)


def test_data_parallel_predictor_matches_single_device(setup):
    """Predictor(mesh=...): sharded predict_probs must equal the
    single-device probabilities bitwise-close, for a divisible batch
    (8 over 8 devices) and a padded non-divisible one (6 -> pad 8)."""
    from dfc_sa_unet_tpu.infer.predictor import Predictor

    cfg, loader, batch, _ = setup
    model = _MiniNet()
    variables = model.init(
        jax.random.key(1), jnp.zeros((1, 16, 16, 3), jnp.float32), train=False
    )
    p1 = Predictor(model, variables)
    pm = Predictor(model, variables, mesh=data_parallel_mesh())

    imgs = np.asarray(batch["image"])  # [8, 16, 16, 3] u8
    want = p1.predict_probs(imgs)
    got = pm.predict_probs(imgs)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)

    want_odd = p1.predict_probs(imgs[:6])
    got_odd = pm.predict_probs(imgs[:6])  # pads to 8, shards, discards
    assert got_odd.shape == (6, 16, 16)
    np.testing.assert_allclose(got_odd, want_odd, atol=1e-6, rtol=1e-6)


def test_partial_eval_all_loss_types_exact(setup):
    """Masked losses must equal the unpadded values for every loss type
    (sum-based dice/tversky AND mean-based bce/joint components)."""
    from dfc_sa_unet_tpu.losses import compute_loss

    rng = np.random.default_rng(3)
    probs = jnp.asarray(rng.uniform(0.01, 0.99, (6, 16, 16, 1)), jnp.float32)
    target = jnp.asarray((rng.uniform(size=(6, 16, 16, 1)) > 0.5), jnp.float32)
    probs_pad = jnp.concatenate([probs, jnp.zeros((2, 16, 16, 1), jnp.float32)])
    target_pad = jnp.concatenate([target, jnp.zeros((2, 16, 16, 1), jnp.float32)])
    valid = jnp.asarray([1, 1, 1, 1, 1, 1, 0, 0], jnp.float32)

    params = {"alpha": 0.3, "beta": 0.7, "bce_weight": 0.4, "dice_weight": 0.4,
              "contour_weight": 0.2}
    for loss_type in ("dice", "tversky", "bce_dice", "joint"):
        want = float(compute_loss(probs, target, loss_type, params))
        got = float(compute_loss(probs_pad, target_pad, loss_type, params, sample_mask=valid))
        np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6, err_msg=loss_type)


def test_fused_mha_under_mesh_matches_single_device():
    """The transformer families' fused Pallas MHA must partition cleanly
    under the data mesh (pallas_call under GSPMD): sharded batch in,
    sharded batch out, values equal to the single-device kernel.  Guards
    the `--data_parallel --bf16` serving combination for ViT-seg/TransUNet."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dfc_sa_unet_tpu.ops.pallas_attention import fused_mha

    rng = np.random.default_rng(11)
    qkv = jnp.asarray(rng.standard_normal((8, 49, 3 * 48)), jnp.float32)
    want = np.asarray(fused_mha(qkv, 6))

    sh = NamedSharding(data_parallel_mesh(), P("data"))
    got = jax.jit(lambda t: fused_mha(t, 6), in_shardings=(sh,))(jax.device_put(qkv, sh))
    assert len(got.sharding.device_set) == 8, got.sharding
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6, rtol=1e-6)


def test_data_parallel_int8_engine_matches_single_device(setup):
    """inference.py --int8 --data_parallel composition: an Int8DFCEngine
    apply_fn (weights closed over as jit constants) under Predictor's
    mesh path must equal the single-device int8 probabilities."""
    from dfc_sa_unet_tpu.infer.predictor import Predictor
    from dfc_sa_unet_tpu.infer.quant import Int8DFCEngine

    cfg, loader, batch, model = setup
    variables = model.init(
        jax.random.key(2), jnp.zeros((1, 16, 16, 3), jnp.float32), train=False
    )
    imgs = np.asarray(batch["image"])  # [8, 16, 16, 3] u8
    from dfc_sa_unet_tpu.data.loader import normalize_on_device

    engine = Int8DFCEngine(cfg, variables, dtype=jnp.float32,
                           calib_batches=[normalize_on_device(jnp.asarray(imgs))])
    apply_fn = lambda _, x: engine._forward(x)  # noqa: E731

    p1 = Predictor(model, variables, apply_fn=apply_fn)
    pm = Predictor(model, variables, apply_fn=apply_fn, mesh=data_parallel_mesh())
    want = p1.predict_probs(imgs)
    got = pm.predict_probs(imgs)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)
    # non-divisible batch pads to the mesh, shards, discards
    np.testing.assert_allclose(pm.predict_probs(imgs[:5]),
                               p1.predict_probs(imgs[:5]), atol=1e-6, rtol=1e-6)


def test_mesh_size_not_dividing_128_terminates(setup):
    """Regression: a mesh whose size does not divide 128 (e.g. 6 devices)
    used to recurse forever on n=128 (pad to 132 -> chunk to 128 -> pad...).
    The mesh pad must bypass the batch-shape policy."""
    from jax.sharding import Mesh

    from dfc_sa_unet_tpu.infer.predictor import Predictor

    cfg, loader, batch, _ = setup
    model = _MiniNet()
    variables = model.init(
        jax.random.key(3), jnp.zeros((1, 16, 16, 3), jnp.float32), train=False
    )
    mesh6 = Mesh(np.asarray(jax.devices()[:6]), ("data",))
    p1 = Predictor(model, variables)
    pm = Predictor(model, variables, mesh=mesh6)
    imgs = np.repeat(np.asarray(batch["image"]), 16, axis=0)  # n=128
    np.testing.assert_allclose(pm.predict_probs(imgs), p1.predict_probs(imgs),
                               atol=1e-6, rtol=1e-6)
    # and a small non-divisible batch (n=7 over 6 devices)
    np.testing.assert_allclose(pm.predict_probs(imgs[:7]), p1.predict_probs(imgs[:7]),
                               atol=1e-6, rtol=1e-6)


def test_spatial_sharded_predictor_matches_single_device(setup):
    """Predictor over a 2-D ('data','spatial') mesh: image rows shard too
    (XLA inserts the conv halo exchanges), and the probabilities equal the
    single-device values.  Guards `inference.py --spatial_parallel`."""
    from dfc_sa_unet_tpu.infer.predictor import Predictor
    from dfc_sa_unet_tpu.parallel import serving_mesh

    cfg, loader, batch, _ = setup
    model = _MiniNet()
    variables = model.init(
        jax.random.key(4), jnp.zeros((1, 16, 16, 3), jnp.float32), train=False
    )
    imgs = np.asarray(batch["image"])  # [8, 16, 16, 3] u8
    p1 = Predictor(model, variables)
    pm = Predictor(model, variables, mesh=serving_mesh(spatial=4))  # 2 x 4
    want = p1.predict_probs(imgs)
    got = pm.predict_probs(imgs)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)
    # non-divisible batch still pads on the data axis only (8 -> data 2)
    np.testing.assert_allclose(pm.predict_probs(imgs[:3]), want[:3],
                               atol=1e-6, rtol=1e-6)


def test_spatial_non_divisible_height_falls_back_exactly(setup):
    """H=12 over spatial=8 cannot shard rows without changing the conv
    math at the padded edge; the Predictor must fall back to batch-only
    sharding for that shape and stay exact."""
    from dfc_sa_unet_tpu.infer.predictor import Predictor
    from dfc_sa_unet_tpu.parallel import serving_mesh

    cfg, loader, batch, _ = setup
    model = _MiniNet()
    variables = model.init(
        jax.random.key(5), jnp.zeros((1, 12, 16, 3), jnp.float32), train=False
    )
    imgs = np.asarray(batch["image"])[:, :12]  # [8, 12, 16, 3]
    p1 = Predictor(model, variables)
    pm = Predictor(model, variables, mesh=serving_mesh(spatial=8))  # 1 x 8
    np.testing.assert_allclose(pm.predict_probs(imgs), p1.predict_probs(imgs),
                               atol=1e-6, rtol=1e-6)


def test_spatial_sharded_flagship_exact_with_halo_exchange():
    """The full DFC-SA flagship under a ('data','spatial') mesh: the
    forward must be partitioned (collective-permute halo exchanges in the
    compiled HLO — i.e. XLA really sharded the rows rather than gathering)
    and bit-close to single-device.  This is the whole-large-image serving
    path: one image's rows spread across chips, no sliding-window seams."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dfc_sa_unet_tpu.models.factory import create_model
    from dfc_sa_unet_tpu.parallel import serving_mesh

    cfg = {"model": {"name": "DFC-SA-Res-Block", "in_channels": 3, "out_channels": 1,
                     "features": [4, 8, 12, 16], "pool_size": 2}}
    model = create_model(cfg)
    x = jnp.asarray(np.random.default_rng(6).uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.key(6), x, train=False)

    fn = jax.jit(lambda v, t: model.apply(v, t, train=False))
    want = np.asarray(fn(variables, x))

    mesh = serving_mesh(spatial=4)  # 2 x 4
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "spatial")))
    vs = jax.device_put(variables, NamedSharding(mesh, P()))
    got = fn(vs, xs)
    assert len(got.sharding.device_set) == 8, got.sharding
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)

    hlo = fn.lower(vs, xs).compile().as_text()
    assert "collective-permute" in hlo, "expected conv halo exchanges"


def test_serving_mesh_validates_divisibility():
    from dfc_sa_unet_tpu.parallel import serving_mesh

    with pytest.raises(ValueError):
        serving_mesh(spatial=3)  # 8 % 3 != 0
    m = serving_mesh(spatial=2)
    assert m.shape == {"data": 4, "spatial": 2}


def test_spatial_sharded_train_step_matches_single_device(setup):
    """2-D ('data','spatial') mesh training: one step with image rows
    sharded across devices must equal the single-device step — XLA's halo
    exchanges and cross-axis BN statistic all-reduces keep the math
    global.  Guards `train.py --spatial_parallel`."""
    from dfc_sa_unet_tpu.parallel import serving_mesh

    cfg, loader, batch, _ = setup
    model = _MiniNet()

    t1 = Trainer(model, loader, loader, cfg, mesh=None, seed=0)
    s1 = t1.init_state(batch)
    s1n, m1 = t1._train_step(s1, jnp.asarray(batch["image"]), jnp.asarray(batch["mask"]))

    mesh = serving_mesh(spatial=4)  # 2 x 4
    t2d = Trainer(model, loader, loader, cfg, mesh=mesh, seed=0)
    s2d = t2d.init_state(batch)
    imgs, masks, valid = t2d._put_batch(batch)
    assert valid is None
    assert len(imgs.sharding.device_set) == 8, imgs.sharding
    # rows really shard: each device holds 16/4 = 4 rows of 8/2 = 4 images
    assert imgs.addressable_shards[0].data.shape[:2] == (4, 4)
    s2dn, m2d = t2d._train_step(s2d, imgs, masks)

    np.testing.assert_allclose(float(m1["loss"]), float(m2d["loss"]), atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1n.params), jax.tree.leaves(s2dn.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1n.batch_stats), jax.tree.leaves(s2dn.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_spatial_train_non_divisible_height_falls_back(setup):
    """H=12 over spatial=8: _put_batch must shard the batch dim only (not
    pad rows — that would perturb edge convs and BN stats) and stay exact."""
    from dfc_sa_unet_tpu.parallel import serving_mesh

    cfg, loader, batch, _ = setup
    model = _MiniNet()
    small = {"image": np.asarray(batch["image"])[:, :12],
             "mask": np.asarray(batch["mask"])[:, :12]}

    t1 = Trainer(model, loader, loader, cfg, mesh=None, seed=0)
    s1 = t1.init_state(small)
    _, m1 = t1._train_step(s1, jnp.asarray(small["image"]), jnp.asarray(small["mask"]))

    t2d = Trainer(model, loader, loader, cfg, mesh=serving_mesh(spatial=8), seed=0)
    s2d = t2d.init_state(small)
    imgs, masks, _ = t2d._put_batch(small)
    # data axis is 1 on a 1x8 mesh: the fallback replicates (full batch,
    # full height per device) rather than padding rows
    assert imgs.addressable_shards[0].data.shape[:2] == (8, 12)
    _, m2d = t2d._train_step(s2d, imgs, masks)
    np.testing.assert_allclose(float(m1["loss"]), float(m2d["loss"]), atol=1e-5, rtol=1e-5)


def test_grad_accum_under_spatial_mesh_exact(setup):
    """grad_accum>1 under a ('data','spatial') mesh: left to GSPMD
    propagation, the microbatch reshape of the 2-D-sharded batch
    miscompiles on jax 0.9 (conv weight grads scaled exactly
    min(accum, data_axis)x; minimal repro:
    scripts/repro_scan_halo_grad.py).  The train step pins the
    microbatch sharding with an explicit with_sharding_constraint, so
    the 2-D mesh KEEPS its row sharding and the gradients match the
    single-device grad-accum step exactly."""
    import copy

    from dfc_sa_unet_tpu.parallel import serving_mesh

    cfg, loader, batch, _ = setup
    cfg = copy.deepcopy(cfg)
    cfg["training"]["grad_accum"] = 2
    model = _MiniNet()

    t1 = Trainer(model, loader, loader, cfg, mesh=None, seed=0)
    s1 = t1.init_state(batch)
    s1n, m1 = t1._train_step(s1, jnp.asarray(batch["image"]), jnp.asarray(batch["mask"]))

    t2d = Trainer(model, loader, loader, cfg, mesh=serving_mesh(spatial=4), seed=0)
    assert t2d.grad_accum == 2
    s2d = t2d.init_state(batch)
    imgs, masks, valid = t2d._put_batch(batch)
    assert valid is None
    # the 2-D sharding is kept: each device holds 16/4 = 4 image rows
    assert imgs.addressable_shards[0].data.shape[1] == 4, imgs.sharding
    s2dn, m2d = t2d._train_step(s2d, imgs, masks)

    np.testing.assert_allclose(float(m1["loss"]), float(m2d["loss"]), atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1n.params), jax.tree.leaves(s2dn.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1n.batch_stats), jax.tree.leaves(s2dn.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)

    # a pure-spatial mesh (data axis 1) is NOT affected — the miscompile
    # factor is min(accum, data_axis) — so it must KEEP its row sharding
    # (the memory-critical large-crop case) and still match exactly
    tsp = Trainer(model, loader, loader, cfg, mesh=serving_mesh(spatial=8), seed=0)
    ssp = tsp.init_state(batch)
    imgs, masks, valid = tsp._put_batch(batch)
    assert valid is None
    assert imgs.addressable_shards[0].data.shape[1] == 2, imgs.sharding  # 16 rows / 8
    sspn, msp = tsp._train_step(ssp, imgs, masks)
    np.testing.assert_allclose(float(m1["loss"]), float(msp["loss"]), atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1n.params), jax.tree.leaves(sspn.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_partial_train_batch_replicated_fallback_exact_params(setup):
    """A train batch of 6 on a 2x4 ('data','spatial') mesh (6 % 2 == 0
    would shard, so use 5): _put_batch warns and runs it replicated.
    The idle-axis miscompile (PERF.md: a 'spatial'-sharded conv-grad
    input with a >1 idle 'data' axis doubles weight grads) makes
    'replicated' a load-bearing word — GSPMD must not re-shard rows
    mid-graph.  Assert PARAMS, not just loss: the loss (forward) is
    exact even when weight grads are doubled."""
    from dfc_sa_unet_tpu.parallel import serving_mesh

    cfg, loader, batch, _ = setup
    model = _MiniNet()
    small = {"image": np.asarray(batch["image"])[:5],
             "mask": np.asarray(batch["mask"])[:5]}

    t1 = Trainer(model, loader, loader, cfg, mesh=None, seed=0)
    s1 = t1.init_state(small)
    s1n, m1 = t1._train_step(s1, jnp.asarray(small["image"]), jnp.asarray(small["mask"]))

    t2d = Trainer(model, loader, loader, cfg, mesh=serving_mesh(spatial=4), seed=0)
    s2 = t2d.init_state(small)
    imgs, masks, valid = t2d._put_batch(small)
    assert valid is None
    assert t2d._warned_replicated
    s2n, m2 = t2d._train_step(s2, imgs, masks)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1n.params), jax.tree.leaves(s2n.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1n.batch_stats), jax.tree.leaves(s2n.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_grad_accum_undivisible_microbatch_paths(setup, capsys):
    """The two fallback paths of the grad-accum sharding pin:

    (a) 1-D data mesh whose axis does NOT divide the microbatch
        (8 devices, B=8, accum=2 -> micro 4): the pin must NOT fire —
        1-D propagation is exact unpinned (repro's 1-D rows) and forcing
        P(None, None, None) would silently all-gather the batch and run
        every device replicated.  Exactness vs single device is the pin.
    (b) 2-D mesh where the data axis does not divide (data=2, spatial=4,
        B=6, accum=2 -> micro 3): the microbatch must be pinned FULLY
        replicated, with a one-time warning.  Keeping the rows sharded is
        wrong in every formulation — a conv weight grad whose input is
        'spatial'-sharded while a >1 'data' axis sits idle is exactly
        min(accum, data)x (XLA partitioner bug; idle-axis rows in
        scripts/repro_scan_halo_grad.py).

    (c) 2-D mesh where only the spatial axis does not divide (H=14 % 4,
        micro 4 % data 2 == 0): batch stays 'data'-sharded (idle spatial
        with a sharded batch is exact in the plain-grad matrix) and the
        step stays exact."""
    import copy

    from dfc_sa_unet_tpu.parallel import serving_mesh

    cfg, loader, batch, _ = setup
    cfg = copy.deepcopy(cfg)
    cfg["training"]["grad_accum"] = 2
    model = _MiniNet()

    # --- (a) 1-D mesh, micro 4 % 8 != 0: unpinned, still exact
    t1 = Trainer(model, loader, loader, cfg, mesh=None, seed=0)
    s1 = t1.init_state(batch)
    s1n, m1 = t1._train_step(s1, jnp.asarray(batch["image"]), jnp.asarray(batch["mask"]))

    t8 = Trainer(model, loader, loader, cfg, mesh=data_parallel_mesh(), seed=0)
    s8 = t8.init_state(batch)
    imgs, masks, valid = t8._put_batch(batch)
    assert valid is None
    s8n, m8 = t8._train_step(s8, imgs, masks)
    capsys.readouterr()
    assert not t8._warned_accum_replicated
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1n.params), jax.tree.leaves(s8n.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)

    # --- (b) 2-D mesh, micro 3 % data(2) != 0 but H 16 % spatial(4) == 0
    small = {"image": np.asarray(batch["image"])[:6],
             "mask": np.asarray(batch["mask"])[:6]}
    sm1 = t1.init_state(small)
    sm1n, mm1 = t1._train_step(sm1, jnp.asarray(small["image"]), jnp.asarray(small["mask"]))

    t2d = Trainer(model, loader, loader, cfg, mesh=serving_mesh(spatial=4), seed=0)
    sm2 = t2d.init_state(small)
    imgs, masks, valid = t2d._put_batch(small)
    assert valid is None
    sm2n, mm2 = t2d._train_step(sm2, imgs, masks)
    assert t2d._warned_accum_replicated
    assert "does not divide the data axis" in capsys.readouterr().out
    np.testing.assert_allclose(float(mm1["loss"]), float(mm2["loss"]), atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(sm1n.params), jax.tree.leaves(sm2n.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)

    # --- (c) 2-D mesh, H 14 % spatial(4) != 0 but micro 4 % data(2) == 0
    hcut = {"image": np.asarray(batch["image"])[:, :14],
            "mask": np.asarray(batch["mask"])[:, :14]}
    sh1 = t1.init_state(hcut)
    sh1n, mh1 = t1._train_step(sh1, jnp.asarray(hcut["image"]), jnp.asarray(hcut["mask"]))

    th = Trainer(model, loader, loader, cfg, mesh=serving_mesh(spatial=4), seed=0)
    sh2 = th.init_state(hcut)
    imgs, masks, valid = th._put_batch(hcut)
    assert valid is None
    sh2n, mh2 = th._train_step(sh2, imgs, masks)
    assert not th._warned_accum_replicated
    np.testing.assert_allclose(float(mh1["loss"]), float(mh2["loss"]), atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(sh1n.params), jax.tree.leaves(sh2n.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_vit_seg_fused_under_spatial_mesh_exact():
    """--spatial_parallel with a transformer family: the patch conv's rows
    shard (halo exchange); the token-dim operations and the fused Pallas
    MHA are replicated/gathered by GSPMD as needed — values must equal
    single-device (guards the --bf16 --spatial_parallel composition)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dfc_sa_unet_tpu.models.vit_seg import VisionTransformerForSegmentation
    from dfc_sa_unet_tpu.parallel import serving_mesh

    kw = dict(img_dim=32, patch_dim=8, in_channels=3, num_classes=1,
              embed_dim=32, num_layers=2, num_heads=4, mlp_dim=64,
              dropout=0.0, upsample_layers=3, use_pallas=True)
    m = VisionTransformerForSegmentation(**kw)
    x = jnp.asarray(np.random.default_rng(7).uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    v = m.init(jax.random.key(7), x, train=False)
    fn = jax.jit(lambda v, t: m.apply(v, t, train=False))
    want = np.asarray(fn(v, x))

    mesh = serving_mesh(spatial=4)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "spatial")))
    vs = jax.device_put(v, NamedSharding(mesh, P()))
    np.testing.assert_allclose(np.asarray(fn(vs, xs)), want, atol=1e-6, rtol=1e-6)


def test_engines_under_spatial_mesh_match_single_device(setup):
    """inference.py --engine/--int8 composed with --spatial_parallel: the
    folded DFCEngine and the Int8DFCEngine (weights as jit constants)
    under a 2-D ('data','spatial') mesh must equal their single-device
    probabilities — the engines use different pooling/epilogue
    formulations than the module path, so GSPMD's halo/all-reduce
    insertion deserves its own exactness pin (the grad-accum x 2-D-mesh
    miscompile showed 2-D propagation can go wrong where 1-D is fine)."""
    from dfc_sa_unet_tpu.data.loader import normalize_on_device
    from dfc_sa_unet_tpu.infer.engine import DFCEngine
    from dfc_sa_unet_tpu.infer.predictor import Predictor
    from dfc_sa_unet_tpu.infer.quant import Int8DFCEngine
    from dfc_sa_unet_tpu.parallel import serving_mesh

    cfg, loader, batch, model = setup
    variables = model.init(
        jax.random.key(4), jnp.zeros((1, 16, 16, 3), jnp.float32), train=False
    )
    imgs = np.asarray(batch["image"])  # [8, 16, 16, 3] u8
    mesh2d = serving_mesh(spatial=4)

    engines = {
        "engine": DFCEngine(cfg, variables, dtype=jnp.float32),
        "int8": Int8DFCEngine(cfg, variables, dtype=jnp.float32,
                              calib_batches=[normalize_on_device(jnp.asarray(imgs))]),
    }
    for name, eng in engines.items():
        apply_fn = lambda _, x, e=eng: e._forward(x)  # noqa: E731
        p1 = Predictor(model, variables, apply_fn=apply_fn)
        pm = Predictor(model, variables, apply_fn=apply_fn, mesh=mesh2d)
        got = pm.predict_probs(imgs)
        want = p1.predict_probs(imgs)
        np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6, err_msg=name)
