"""Inference driver tests: sliding-window parity, TTA, CLI end-to-end."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.data.synthetic import generate
from dfc_sa_unet_tpu.infer.predictor import Predictor
from dfc_sa_unet_tpu.models.factory import ModelFactory

CFG = {
    "training": {"num_epochs": 1, "batch_size": 2, "learning_rate": 0.01, "num_workers": 1,
                 "save_checkpoint_freq": 1, "device": "auto",
                 "loss": {"type": "dice", "params": {}}},
    "model": {"name": "DFC-SA-Res-Block", "in_channels": 3, "out_channels": 1,
              "features": [8, 16, 24, 32], "pool_size": 4, "pretrained_path": None},
    "dataset": {"train_dir": "x", "val_dir": "x", "img_size": [64, 64], "augmentation": False},
    "logging": {"log_dir": "x", "images_dir": "x", "save_best_worst_samples": 0},
}


@pytest.fixture(scope="module")
def predictor():
    model = ModelFactory.get_model(CFG)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    return Predictor(model, variables)


def _slow_sliding_reference(predictor, image, tile, overlap):
    """The reference's per-tile loop (inference.py:104-153), unbatched."""
    h, w = image.shape[:2]
    stride = tile - overlap
    canvas = np.zeros((h, w), np.float32)
    counts = np.zeros((h, w), np.float32)
    for y in range(0, h, stride):
        for x in range(0, w, stride):
            ye, xe = min(y + tile, h), min(x + tile, w)
            ys, xs = max(0, ye - tile), max(0, xe - tile)
            pred = predictor.predict_single(image[ys:ye, xs:xe])
            canvas[ys:ye, xs:xe] += pred
            counts[ys:ye, xs:xe] += 1
    counts[counts == 0] = 1
    return canvas / counts


def test_sliding_window_matches_per_tile_loop(predictor):
    rng = np.random.default_rng(0)
    image = rng.integers(0, 256, size=(150, 130, 3), dtype=np.uint8)
    got = predictor.predict_sliding(image, tile_size=64, overlap=16, batch_size=4)
    want = _slow_sliding_reference(predictor, image, 64, 16)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_sliding_window_tta_shape_and_range(predictor):
    image = np.random.default_rng(1).integers(0, 256, size=(100, 100, 3), dtype=np.uint8)
    out = predictor.predict_sliding(image, tile_size=64, overlap=16, batch_size=8, tta=True)
    assert out.shape == (100, 100)
    assert (out >= 0).all() and (out <= 1).all()


def test_small_image_falls_back_to_direct(predictor):
    image = np.random.default_rng(2).integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    out = predictor.predict_sliding(image, tile_size=64, overlap=16)
    np.testing.assert_allclose(out, predictor.predict_single(image), atol=1e-6)


def test_inference_cli_end_to_end(tmp_path):
    """Full CLI: torch-free checkpoint -> predictions + metrics CSV."""
    import yaml

    data_root = generate(str(tmp_path / "data"), n=4, size=64, seed=3)
    cfg = {**CFG, "dataset": {**CFG["dataset"], "train_dir": data_root, "val_dir": data_root}}
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    # save an init-only checkpoint in orbax format
    from dfc_sa_unet_tpu.utils import checkpoint as ckpt_util

    model = ModelFactory.get_model(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
    ckpt = tmp_path / "ckpt"
    ckpt_util.save_pytree(
        str(ckpt), {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    )

    out_dir = tmp_path / "out"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, "inference.py", "--config", str(cfg_path), "--model", str(ckpt),
         "--input", data_root, "--output", str(out_dir), "--no_slide_window"],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(__file__)), env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    sample_dir = out_dir / "sample_000"
    for f in ["original.png", "pred_heatmap.png", "pred_binary.png", "pred_overlay.png",
              "ground_truth.png"]:
        assert (sample_dir / f).exists(), f
    assert (out_dir / "sample_000_combined_view.png").exists()
    assert (out_dir / "evaluation_metrics.csv").exists()
    assert "Micro-Averaged" in res.stdout


def test_sliding_stream_matches_per_image(predictor):
    """Cross-image tile batching must equal per-image predict_sliding,
    preserve input order, and handle small-image fallbacks mid-stream."""
    rng = np.random.default_rng(3)
    images = [
        rng.integers(0, 256, size=(150, 130, 3), dtype=np.uint8),
        rng.integers(0, 256, size=(96, 160, 3), dtype=np.uint8),
        rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8),  # < tile: fallback
        rng.integers(0, 256, size=(130, 150, 3), dtype=np.uint8),
    ]
    got = list(predictor.predict_sliding_stream(
        enumerate(images), tile_size=64, overlap=16, batch_size=8))
    assert [k for k, _ in got] == [0, 1, 2, 3]
    for (_, stream_probs), img in zip(got, images):
        want = predictor.predict_sliding(img, tile_size=64, overlap=16, batch_size=8)
        np.testing.assert_allclose(stream_probs, want, atol=1e-5, rtol=1e-4)


def test_sliding_stream_tta_matches_per_image(predictor):
    rng = np.random.default_rng(4)
    images = [rng.integers(0, 256, size=(100, 100, 3), dtype=np.uint8) for _ in range(3)]
    got = dict(predictor.predict_sliding_stream(
        enumerate(images), tile_size=64, overlap=16, batch_size=8, tta=True))
    for i, img in enumerate(images):
        want = predictor.predict_sliding(img, tile_size=64, overlap=16, batch_size=8, tta=True)
        np.testing.assert_allclose(got[i], want, atol=1e-5, rtol=1e-4)


def test_exe_cache_roundtrip(tmp_path, predictor):
    """cached_compile writes one entry per shape, the returned callable
    matches the plain jit path, and a reloaded entry still produces
    correct results (falling back to jit if the deserialized executable
    cannot run on this backend -- the multi-device CPU case)."""
    from dfc_sa_unet_tpu.utils.exe_cache import cached_compile

    x = np.random.default_rng(5).integers(0, 256, size=(2, 64, 64, 3), dtype=np.uint8)
    xj = jnp.asarray(x)
    want = np.asarray(predictor._forward_u8(predictor.variables, xj))

    f1 = cached_compile(predictor._forward_u8, str(tmp_path), "t", predictor.variables, xj)
    assert len(list(tmp_path.glob("exe_*.bin"))) == 1
    np.testing.assert_allclose(np.asarray(f1(predictor.variables, xj)), want, atol=1e-6)

    # second construction hits the cache file; results still correct
    f2 = cached_compile(predictor._forward_u8, str(tmp_path), "t", predictor.variables, xj)
    np.testing.assert_allclose(np.asarray(f2(predictor.variables, xj)), want, atol=1e-6)

    # different shape -> a second entry
    x1 = jnp.asarray(x[:1])
    cached_compile(predictor._forward_u8, str(tmp_path), "t", predictor.variables, x1)
    assert len(list(tmp_path.glob("exe_*.bin"))) == 2

    # Predictor-level integration
    p2 = Predictor(predictor.model, predictor.variables, exe_cache_dir=str(tmp_path))
    np.testing.assert_allclose(p2.predict_probs(x), predictor.predict_probs(x), atol=1e-6)


def test_predict_probs_autopad_equivalence(predictor):
    """Batches in [64, 128) are padded to 128 on device; results must
    equal the per-image outputs exactly (padding discarded)."""
    rng = np.random.default_rng(6)
    x = rng.integers(0, 256, size=(65, 64, 64, 3), dtype=np.uint8)
    got = predictor.predict_probs(x)
    assert got.shape == (65, 64, 64)
    want = predictor.predict_probs(x[:32])  # native small batch, no pad
    np.testing.assert_allclose(got[:32], want, atol=1e-5, rtol=1e-4)


def test_exe_cache_key_and_dryrun_cover_sharding(predictor):
    """A single-device executable must never be served to a mesh run of
    the same shapes (and vice versa): the key covers the device topology
    and each arg's sharding, and the donation dry-run places its dummies
    with the args' own shardings so mesh entries verify instead of
    failing on layout mismatch."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from dfc_sa_unet_tpu.utils import exe_cache

    x = jnp.asarray(np.random.default_rng(7).integers(
        0, 256, size=(8, 64, 64, 3), dtype=np.uint8))
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, PartitionSpec("data")))
    vs = jax.device_put(predictor.variables, NamedSharding(mesh, PartitionSpec()))

    k1 = exe_cache._key("t", "", (predictor.variables, x))
    k2 = exe_cache._key("t", "", (vs, xs))
    assert k1 != k2, "sharded args must key a separate cache entry"
    assert k2 == exe_cache._key("t", "", (vs, xs))  # deterministic

    # a mesh-compiled executable passes the dry-run with sharded dummies
    exe = predictor._forward_u8.lower(vs, xs).compile()
    exe_cache._dry_run(exe, (vs, xs))
    # sanity: it computes the single-device values
    want = np.asarray(predictor._forward_u8(predictor.variables, x))
    np.testing.assert_allclose(np.asarray(exe(vs, xs)), want, atol=1e-6)
