"""Small-utility tests: StepTimer, metrics_from_counts edge cases,
visualization artifact shapes."""

import os
import time

import numpy as np
import pytest

from dfc_sa_unet_tpu.metrics import metrics_from_counts
from dfc_sa_unet_tpu.utils.profiling import StepTimer
from dfc_sa_unet_tpu.utils.visualization import (
    create_combined_visualization,
    create_overlay,
    denormalize_image,
)


def test_step_timer():
    t = StepTimer()
    t.tick()
    time.sleep(0.01)
    t.tick(items=4)
    time.sleep(0.01)
    t.tick(items=4)
    assert t.steps == 2 and t.items == 8
    assert t.ms_per_step >= 10.0
    assert 0 < t.items_per_sec < 8 / 0.02 * 2
    assert "img/s" in t.summary()


def test_metrics_from_counts_zero_everything():
    m = metrics_from_counts(0, 0, 0, 0)
    for v in m.values():
        assert np.isfinite(v) and v == 0.0


def test_metrics_from_counts_perfect():
    m = metrics_from_counts(tp=100, fp=0, fn=0, tn=900)
    assert abs(m["dice_f1"] - 1.0) < 1e-5
    assert abs(m["iou"] - 1.0) < 1e-5
    assert abs(m["accuracy"] - 1.0) < 1e-5


def test_overlay_and_combined_shapes(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    mask = (rng.uniform(size=(32, 32)) > 0.5).astype(np.float32)
    ov = create_overlay(img, mask)
    assert ov.shape == img.shape and ov.dtype == np.uint8
    out = create_combined_visualization(
        img, (mask * 255).astype(np.uint8), (mask * 255).astype(np.uint8),
        "t", str(tmp_path / "combined.png"),
    )
    assert out.shape[1] == 5 * 32 + 4 * 3  # 5 panels + 4 borders
    assert (tmp_path / "combined.png").exists()


def test_denormalize_roundtrip():
    rng = np.random.default_rng(1)
    orig = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    norm = (orig.astype(np.float32) / 255.0 - mean) / std
    back = denormalize_image(norm)
    assert np.abs(back.astype(int) - orig.astype(int)).max() <= 1


def test_checkpoint_roundtrips_zero_size_leaves(tmp_path):
    """Orbax refuses zero-size arrays, but the zoo produces them
    (LightSelfAttention QK convs at features[0]//8 == 0 channels — e.g.
    every test config with features=[4,...]); Trainer.save_checkpoint
    then carries matching zero-size SGD momentum buffers.  save_pytree
    must placeholder them and restore_pytree must bring them back with
    the exact shape/dtype — via the template AND via the sidecar
    manifest (templateless restore is the factory's pretrained path)."""
    from dfc_sa_unet_tpu.utils.checkpoint import restore_pytree, save_pytree

    tree = {
        "params": {"q": np.zeros((1, 1, 4, 0), np.float32),
                   "k": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "opt_leaves": [np.zeros((0, 2), np.float32), np.ones((3,), np.float32)],
        "epoch": np.asarray(7),
    }
    path = str(tmp_path / "ckpt")
    save_pytree(path, tree)

    for restored in (restore_pytree(path, template=tree), restore_pytree(path)):
        assert restored["params"]["q"].shape == (1, 1, 4, 0)
        assert restored["params"]["q"].dtype == np.float32
        assert restored["opt_leaves"][0].shape == (0, 2)
        np.testing.assert_array_equal(restored["params"]["k"], tree["params"]["k"])
        np.testing.assert_array_equal(restored["opt_leaves"][1], tree["opt_leaves"][1])
        assert int(restored["epoch"]) == 7


def test_checkpoint_save_is_atomic_with_manifest(tmp_path):
    """The zero-size manifest must land in the SAME atomic rename as the
    Orbax data: a preemption between ckptr.save() finalizing and the
    manifest write would otherwise leave a complete-looking checkpoint
    whose zero-size leaves restore as shape-(1,) placeholders.  Simulate
    the crash by making the manifest dump raise — no finalized checkpoint
    may exist afterwards, and no temp litter that latest_epoch_checkpoint
    could pick up."""
    import json as json_mod

    from dfc_sa_unet_tpu.utils import checkpoint as ckpt_mod

    tree = {"q": np.zeros((1, 1, 4, 0), np.float32),
            "k": np.ones((2, 2), np.float32)}
    path = str(tmp_path / "checkpoint_epoch_3")

    real_dump = json_mod.dump
    try:
        def boom(*a, **kw):
            raise RuntimeError("simulated preemption")
        ckpt_mod.json.dump = boom
        with pytest.raises(RuntimeError, match="simulated preemption"):
            ckpt_mod.save_pytree(path, tree)
    finally:
        ckpt_mod.json.dump = real_dump

    assert not os.path.exists(path)  # nothing finalized without a manifest
    from dfc_sa_unet_tpu.utils.checkpoint import latest_epoch_checkpoint
    assert latest_epoch_checkpoint(str(tmp_path)) is None

    # and a successful save has the manifest inside the finalized dir
    ckpt_mod.save_pytree(path, tree)
    assert os.path.exists(os.path.join(path, "zero_size_leaves.json"))
    assert latest_epoch_checkpoint(str(tmp_path)) == os.path.abspath(path)
    restored = ckpt_mod.restore_pytree(path)
    assert restored["q"].shape == (1, 1, 4, 0)


def test_checkpoint_empty_template_leaf_restores_saved_history(tmp_path):
    """A zero-size TEMPLATE leaf must not be mistaken for a zero-size
    SAVED leaf: resuming templates the checkpoint with a fresh Trainer's
    EMPTY history lists, and the saved (non-empty) history must come
    back (this is Trainer.load_checkpoint's exact shape)."""
    from dfc_sa_unet_tpu.utils.checkpoint import restore_pytree, save_pytree

    saved = {"history": {"train_losses": np.asarray([0.5, 0.4], np.float64)},
             "params": {"w": np.ones((2, 2), np.float32)}}
    path = str(tmp_path / "ckpt")
    save_pytree(path, saved)

    template = {"history": {"train_losses": np.asarray([], np.float64)},
                "params": {"w": np.zeros((2, 2), np.float32)}}
    restored = restore_pytree(path, template=template)
    np.testing.assert_array_equal(restored["history"]["train_losses"], [0.5, 0.4])
    np.testing.assert_array_equal(restored["params"]["w"], saved["params"]["w"])


def test_source_edit_invalidates_exe_cache_key(tmp_path):
    """VERDICT r2 item 4: editing framework source must invalidate every
    exe-cache entry.  Hash a pristine copy of the package tree, then the
    same copy with one trailing comment byte appended to blocks.py — the
    source fingerprint (and hence every cache key built from it) changes;
    an unmodified copy reproduces the live tree's fingerprint exactly
    (relpath-keyed walk, so location does not matter)."""
    import shutil

    import dfc_sa_unet_tpu
    from dfc_sa_unet_tpu.utils import exe_cache

    src = dfc_sa_unet_tpu.__path__[0]
    copy = tmp_path / "pkg"
    shutil.copytree(src, copy, ignore=shutil.ignore_patterns("__pycache__"))

    pristine = exe_cache.source_fingerprint(str(copy))
    assert pristine == exe_cache.source_fingerprint()  # == the live tree

    target = copy / "models" / "blocks.py"
    with open(target, "a") as f:
        f.write("\n# edited\n")
    assert exe_cache.source_fingerprint(str(copy)) != pristine
