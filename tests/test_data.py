"""Data pipeline tests: dataset contract, transforms parity, loader."""

import numpy as np
import pytest

import jax.numpy as jnp

from dfc_sa_unet_tpu.data.dataset import SegmentationDataset
from dfc_sa_unet_tpu.data.loader import (
    BatchLoader,
    binarize_mask_on_device,
    normalize_on_device,
)
from dfc_sa_unet_tpu.data.synthetic import generate
from dfc_sa_unet_tpu.data.transforms import build_transforms


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return generate(str(root), n=10, size=64, seed=0)


def test_dataset_contract(data_root):
    ds = SegmentationDataset(data_root, build_transforms((48, 48), augment=False), (48, 48))
    assert len(ds) == 10
    s = ds[0]
    assert set(s) == {"image", "mask", "filename"}
    assert s["image"].shape == (48, 48, 3) and s["image"].dtype == np.uint8
    assert s["mask"].shape == (48, 48) and s["mask"].dtype == np.uint8
    assert s["filename"].endswith(".png")


def test_device_normalize_matches_totensor_normalize(data_root):
    """uint8 + on-device affine == ToTensor + Normalize(ImageNet)."""
    ds = SegmentationDataset(data_root, build_transforms((32, 32), augment=False), (32, 32))
    s = ds[3]
    got = np.asarray(normalize_on_device(jnp.asarray(s["image"][None])))[0]
    # ToTensor (/255) + Normalize(ImageNet) computed directly
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    ref = (s["image"].astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
    # mask binarization: (v/255 > 0.5) == v >= 128
    m = np.asarray(binarize_mask_on_device(jnp.asarray(s["mask"][None])))[0]
    want = ((s["mask"].astype(np.float32) / 255.0) > 0.5).astype(np.float32)[..., None]
    np.testing.assert_array_equal(m, want)


def test_loader_batching_and_determinism(data_root):
    ds = SegmentationDataset(data_root, build_transforms((32, 32), augment=True), (32, 32))
    loader = BatchLoader(ds, batch_size=4, shuffle=True, num_workers=2, seed=7)
    loader.set_epoch(0)
    batches_a = [b["image"].copy() for b in loader]
    loader.set_epoch(0)
    batches_b = [b["image"].copy() for b in loader]
    assert len(batches_a) == 3  # 10 samples / 4 -> 3 batches (last partial)
    assert batches_a[0].shape == (4, 32, 32, 3)
    assert batches_a[-1].shape == (2, 32, 32, 3)
    for a, b in zip(batches_a, batches_b):
        np.testing.assert_array_equal(a, b)  # same epoch -> same order+augment
    loader.set_epoch(1)
    batches_c = [b["image"] for b in loader]
    assert any(not np.array_equal(a, c) for a, c in zip(batches_a, batches_c))


def test_loader_drop_last(data_root):
    ds = SegmentationDataset(data_root, build_transforms((32, 32), augment=False), (32, 32))
    loader = BatchLoader(ds, batch_size=4, shuffle=False, drop_last=True)
    shapes = [b["image"].shape for b in loader]
    assert shapes == [(4, 32, 32, 3), (4, 32, 32, 3)]


def test_cached_dataset_is_bit_identical(data_root):
    """cache=True must replay the exact same samples (decode+resize cached,
    random augmentation still applied per call from the given rng)."""
    tf = build_transforms((48, 48), augment=True)
    plain = SegmentationDataset(data_root, tf, (48, 48))
    cached = SegmentationDataset(data_root, tf, (48, 48), cache=True)
    for idx in range(len(plain)):
        a = plain.__getitem__(idx, rng=np.random.default_rng(idx))
        b = cached.__getitem__(idx, rng=np.random.default_rng(idx))
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["mask"], b["mask"])
        assert a["filename"] == b["filename"]
    # second pass hits the cache and must still match (incl. fresh augment)
    a2 = plain.__getitem__(0, rng=np.random.default_rng(99))
    b2 = cached.__getitem__(0, rng=np.random.default_rng(99))
    np.testing.assert_array_equal(a2["image"], b2["image"])


def test_cached_loader_matches_uncached(data_root):
    cfgish = build_transforms((32, 32), augment=True)
    mk = lambda cache: BatchLoader(
        SegmentationDataset(data_root, cfgish, (32, 32), cache=cache),
        batch_size=4, shuffle=True, num_workers=2, seed=5)
    a, b = mk(False), mk(True)
    for _ in range(2):  # epoch 1 replays from cache
        for ba, bb in zip(a, b):
            np.testing.assert_array_equal(ba["image"], bb["image"])
            np.testing.assert_array_equal(ba["mask"], bb["mask"])
        a.set_epoch(1), b.set_epoch(1)


def test_augmentation_keeps_pairs_aligned(data_root):
    """Rotations/flips must apply identically to image and mask."""
    ds = SegmentationDataset(data_root, build_transforms((64, 64), augment=True), (64, 64))
    rng = np.random.default_rng(3)
    s = ds.__getitem__(0, rng=rng)
    # the blob is bright; thresholding the image should roughly match the mask
    bright = (s["image"].mean(axis=-1) > 120).astype(np.float32)
    m = (s["mask"] >= 128).astype(np.float32)
    inter = (bright * m).sum()
    dice = 2 * inter / (bright.sum() + m.sum() + 1e-7)
    assert dice > 0.7, f"augmented image/mask desynced (dice={dice:.3f})"


def test_auto_cache_enables_when_it_fits(data_root):
    """'auto' (the dataset.cache config default) caches a tiny dataset
    when the transform starts with the matching deterministic resize."""
    tf = build_transforms((32, 32), augment=False)
    ds = SegmentationDataset(data_root, tf, (32, 32), cache="auto")
    assert ds.cache is True and ds._cached is not None and ds._cache_resized


def test_auto_cache_disables_when_too_large(data_root, monkeypatch):
    from dfc_sa_unet_tpu.data import dataset as dsmod

    monkeypatch.setattr(dsmod, "_mem_available_bytes", lambda: 4 * 32 * 32)
    tf = build_transforms((32, 32), augment=False)
    ds = SegmentationDataset(data_root, tf, (32, 32), cache="auto")
    assert ds.cache is False and ds._cached is None


def test_auto_cache_disables_for_custom_transforms(data_root):
    """'auto' must not cache post-resize data under a transform that does
    not begin with PairedResize(img_size) — resolution would then depend
    on host free RAM (review finding)."""
    ds = SegmentationDataset(data_root, None, (32, 32), cache="auto")
    assert ds.cache is False


def test_forced_cache_with_custom_transform_keeps_contract(data_root):
    """cache=True with transform=None caches decoded ORIGINALS: outputs
    must be bit-identical to the uncached dataset (original resolution,
    not img_size)."""
    plain = SegmentationDataset(data_root, None, (32, 32))
    cached = SegmentationDataset(data_root, None, (32, 32), cache=True)
    assert not cached._cache_resized
    for idx in (0, 1):
        a = plain[idx]
        b = cached[idx]
        np.testing.assert_array_equal(np.asarray(a["image"]), np.asarray(b["image"]))
        np.testing.assert_array_equal(np.asarray(a["mask"]), np.asarray(b["mask"]))
    b2 = cached[0]  # second access replays from cache
    np.testing.assert_array_equal(np.asarray(plain[0]["image"]), np.asarray(b2["image"]))


def test_factory_default_cache_is_auto(data_root):
    from dfc_sa_unet_tpu.data.loader import DataLoaderFactory

    cfg = {"dataset": {"train_dir": data_root, "val_dir": data_root,
                       "img_size": [32, 32]},
           "training": {"batch_size": 4}}
    f = DataLoaderFactory(cfg)
    assert f.cache == "auto"
    assert f.get_train_loader().dataset.cache is True  # tiny fixture fits


def test_disk_cache_matches_uncached_and_persists(data_root):
    """cache='disk' replays bit-identical samples via .npy memmaps; a second
    dataset over the same root reuses the manifest without rebuilding."""
    import os

    tf = build_transforms((48, 48), augment=True)
    plain = SegmentationDataset(data_root, tf, (48, 48))
    disk = SegmentationDataset(data_root, tf, (48, 48), cache="disk")
    assert disk._disk is not None
    cdir = os.path.join(data_root, ".dfc_cache")
    assert os.path.isfile(os.path.join(cdir, "imgs_48x48.npy"))
    for idx in range(len(plain)):
        a = plain.__getitem__(idx, rng=np.random.default_rng(idx))
        b = disk.__getitem__(idx, rng=np.random.default_rng(idx))
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["mask"], b["mask"])

    # reopen: manifest fresh -> memmaps reused (mtime of the npy unchanged)
    mtime = os.path.getmtime(os.path.join(cdir, "imgs_48x48.npy"))
    disk2 = SegmentationDataset(data_root, tf, (48, 48), cache="disk")
    assert os.path.getmtime(os.path.join(cdir, "imgs_48x48.npy")) == mtime
    b2 = disk2.__getitem__(3, rng=np.random.default_rng(3))
    a2 = plain.__getitem__(3, rng=np.random.default_rng(3))
    np.testing.assert_array_equal(a2["image"], b2["image"])


def test_disk_cache_rebuilds_on_source_change(tmp_path):
    """Touching a source image invalidates the manifest and rebuilds."""
    import os
    import time

    root = generate(str(tmp_path), n=4, size=48, seed=1)
    tf = build_transforms((32, 32), augment=False)
    SegmentationDataset(root, tf, (32, 32), cache="disk")
    img0 = os.path.join(root, "original", sorted(os.listdir(os.path.join(root, "original")))[0])
    # flip some pixels: content change with same size
    from PIL import Image as _I
    a = np.asarray(_I.open(img0).convert("RGB")).copy()
    a[:8] = 255 - a[:8]
    _I.fromarray(a).save(img0)
    os.utime(img0, ns=(time.time_ns(), time.time_ns() + 10**6))

    ds = SegmentationDataset(root, tf, (32, 32), cache="disk")
    fresh = SegmentationDataset(root, tf, (32, 32))
    s_ds = ds.__getitem__(0, rng=np.random.default_rng(0))
    s_fr = fresh.__getitem__(0, rng=np.random.default_rng(0))
    np.testing.assert_array_equal(s_ds["image"], s_fr["image"])


def test_disk_cache_requires_resize_transform(data_root):
    with pytest.raises(ValueError):
        SegmentationDataset(data_root, None, (32, 32), cache="disk")


def test_disk_cache_loader_matches_uncached(data_root):
    """BatchLoader over a disk-cached dataset yields bit-identical batches
    (incl. fresh per-epoch augmentation) to the uncached dataset."""
    tf = build_transforms((32, 32), augment=True)
    mk = lambda cache: BatchLoader(
        SegmentationDataset(data_root, tf, (32, 32), cache=cache),
        batch_size=4, shuffle=True, num_workers=2, seed=5)
    a, b = mk(False), mk("disk")
    for epoch in range(2):
        a.set_epoch(epoch), b.set_epoch(epoch)
        for ba, bb in zip(a, b):
            np.testing.assert_array_equal(ba["image"], bb["image"])
            np.testing.assert_array_equal(ba["mask"], bb["mask"])


def test_disk_cache_rebuilds_when_npy_deleted(tmp_path):
    """A fresh manifest with missing .npy files (user reclaimed space but
    left the small manifest) must rebuild, not crash."""
    import os

    root = generate(str(tmp_path), n=3, size=48, seed=2)
    tf = build_transforms((32, 32), augment=False)
    SegmentationDataset(root, tf, (32, 32), cache="disk")
    cdir = os.path.join(root, ".dfc_cache")
    os.remove(os.path.join(cdir, "imgs_32x32.npy"))
    ds = SegmentationDataset(root, tf, (32, 32), cache="disk")
    assert os.path.isfile(os.path.join(cdir, "imgs_32x32.npy"))
    s = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert s["image"].shape == (32, 32, 3)


def test_factory_accepts_int_img_size(data_root):
    from dfc_sa_unet_tpu.data.loader import DataLoaderFactory

    cfg = {"dataset": {"train_dir": data_root, "val_dir": data_root, "img_size": 32},
           "training": {"batch_size": 4}}
    loader = DataLoaderFactory(cfg).get_val_loader()
    batch = next(iter(loader))
    assert batch["image"].shape[1:] == (32, 32, 3)
