"""Batched, prefetching host input pipeline feeding the TPU.

Design (TPU-first, vs the reference's torch DataLoader):
  * worker threads decode/augment in uint8 (PIL releases the GIL for
    decode/resize), batches are stacked NHWC uint8,
  * uint8 batches are shipped to device asynchronously and normalized
    there (normalize_on_device) — 4x less host->device traffic and
    bit-identical to the reference's ToTensor+Normalize,
  * double-buffered prefetch: the next batch is being decoded + DMA'd
    while the current step runs,
  * at most two batch shapes per epoch (full and final-partial), so jit
    caches stay warm; optionally ``drop_last`` for a single static shape.
"""

import threading
import queue
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np
import jax.numpy as jnp

from dfc_sa_unet_tpu.data.dataset import SegmentationDataset
from dfc_sa_unet_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD, build_transforms

_MEAN = np.asarray(IMAGENET_MEAN, np.float32) * 255.0
_STD = np.asarray(IMAGENET_STD, np.float32) * 255.0


def normalize_on_device(images_u8: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 HWC -> normalized float: ((x/255) - mean)/std, fused as one
    affine in f32 then cast (exactly ToTensor + Normalize(ImageNet))."""
    x = images_u8.astype(jnp.float32)
    return ((x - _MEAN) / _STD).astype(dtype)


def binarize_mask_on_device(masks_u8: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 HW -> {0,1} float with a channel dim ((v/255) > 0.5 <=> v >= 128,
    reference utils/data_loader.py:55-62)."""
    m = (masks_u8 >= 128).astype(dtype)
    return m[..., None]


class BatchLoader:
    """Iterable over dict batches {'image' u8 [B,H,W,3], 'mask' u8 [B,H,W],
    'filename' list}.  Deterministic given (seed, epoch).

    Multi-host sharding (``shard=(process_id, process_count)``): every
    process computes the SAME global epoch order (the permutation is
    seeded by (seed, epoch) only), conceptually zero-pads each global
    batch up to ``process_count * ceil(batch/process_count)`` rows
    (rounded to ``shard_pad_multiple``, the local device count), and
    loads only its own contiguous chunk of that padded batch.  The
    chunks concatenated in process order are exactly the single-process
    batch plus per-process trailing zeros, so assembling them with
    ``jax.make_array_from_process_local_data`` reproduces single-process
    training bit-for-bit.  When padding occurs, ``partial`` selects the
    exactness strategy:

      * ``'pad'`` (eval): the batch carries a ``'valid'`` [chunk] float
        mask (1 = real row) for the trainer's mask-aware eval step,
      * ``'replicate'`` (training): every process loads the FULL batch
        and the dict carries ``'replicated': True`` — zero rows would
        perturb BatchNorm batch statistics, so the trainer runs such
        batches replicated instead (exact math, mirroring the
        single-process mesh fallback).

    Sharded batches always carry ``'filename_global'`` (the names of
    every real row of the global batch, in global order — strings only,
    no pixel data) so per-sample selection can stay globally exact;
    ``'filename'`` lists only this process's real rows.
    """

    def __init__(
        self,
        dataset: SegmentationDataset,
        batch_size: int,
        shuffle: bool,
        num_workers: int = 2,
        drop_last: bool = False,
        seed: int = 0,
        prefetch: int = 2,
        shard: "tuple | None" = None,
        shard_pad_multiple: int = 1,
        partial: str = "pad",
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0
        if shard is not None:
            pid, nproc = shard
            if not (0 <= pid < nproc):
                raise ValueError(f"shard id {pid} out of range for {nproc} processes")
        if partial not in ("pad", "replicate"):
            raise ValueError(f"partial must be 'pad' or 'replicate', got {partial!r}")
        self.shard = shard
        self.shard_pad_multiple = max(1, int(shard_pad_multiple))
        self.partial = partial

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _index_order(self):
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            return rng.permutation(n)
        return np.arange(n)

    def __iter__(self) -> Iterator[dict]:
        order = self._index_order()
        n = len(order)
        nb = len(self)
        base_rng = np.random.default_rng((self.seed, self.epoch, 1))
        # one child generator per sample for reproducible augmentation
        seeds = base_rng.integers(0, 2**63 - 1, size=n)

        def load_one(i):
            idx = int(order[i])
            return self.dataset.__getitem__(idx, rng=np.random.default_rng(int(seeds[i])))

        def load_rows(rows):
            with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
                samples = list(ex.map(load_one, rows))
            return {
                "image": np.stack([s["image"] for s in samples]),
                "mask": np.stack([s["mask"] for s in samples]),
                "filename": [s["filename"] for s in samples],
            }

        def make_batch(b):
            lo, hi = b * self.batch_size, min((b + 1) * self.batch_size, n)
            if self.shard is None:
                return load_rows(range(lo, hi))
            pid, nproc = self.shard
            g = hi - lo
            m = self.shard_pad_multiple
            per_proc = -(-g // nproc)  # ceil(g / nproc)
            chunk = -(-per_proc // m) * m  # rounded up to the device multiple
            names_global = [self.dataset.samples[int(order[i])][2] for i in range(lo, hi)]
            if chunk * nproc != g and self.partial == "replicate":
                batch = load_rows(range(lo, hi))
                batch["replicated"] = True
                batch["filename_global"] = names_global
                return batch
            start = lo + pid * chunk
            stop = min(start + chunk, hi)
            if start < hi:
                batch = load_rows(range(start, stop))
            else:
                # this process owns only padding rows — probe one sample
                # for the post-transform shapes, then zero it out below
                probe = load_rows(range(lo, lo + 1))
                batch = {"image": probe["image"][:0], "mask": probe["mask"][:0],
                         "filename": []}
            pad = chunk - batch["image"].shape[0]
            if pad:
                batch["image"] = np.concatenate(
                    [batch["image"],
                     np.zeros((pad, *batch["image"].shape[1:]), batch["image"].dtype)])
                batch["mask"] = np.concatenate(
                    [batch["mask"],
                     np.zeros((pad, *batch["mask"].shape[1:]), batch["mask"].dtype)])
            if chunk * nproc != g:
                batch["valid"] = np.concatenate(
                    [np.ones(chunk - pad, np.float32), np.zeros(pad, np.float32)])
            batch["filename_global"] = names_global
            return batch

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for b in range(nb):
                    if stop.is_set():
                        return
                    q.put(make_batch(b))
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
            # drain so the producer can exit
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


class DataLoaderFactory:
    """Config-driven loader factory (reference utils/data_loader.py:75-185).

    Note: the reference passes ``img_size`` straight to PIL.resize, which
    takes (W, H); all shipped configs are square so this is moot, and we
    mirror the reference's pass-through behavior exactly.
    """

    def __init__(self, config, seed: int = 0):
        self.config = config
        ds = config["dataset"]
        tr = config["training"]
        self.train_dir = ds["train_dir"].replace("\\", "/")
        self.val_dir = ds["val_dir"].replace("\\", "/")
        self.batch_size = tr["batch_size"]
        self.num_workers = tr.get("num_workers", 2)
        img = ds.get("img_size", [224, 224])
        self.img_size = (img, img) if isinstance(img, int) else tuple(img)
        self.use_augmentation = ds.get("augmentation", True)
        # decode+resize once into RAM (~200 KB/sample at 224) — makes the
        # 1-core host pipeline outrun every measured training step rate
        # (PERF.md round 3: host input pipeline).  Default "auto": cache
        # only when the decoded set fits in 25% of currently-available RAM,
        # so arbitrarily large sets still stream per-epoch like the
        # reference's loader; set true/false to force.
        self.cache = ds.get("cache", "auto")
        self.seed = seed

    def get_train_loader(self, drop_last: bool = False, shard=None,
                         shard_pad_multiple: int = 1) -> BatchLoader:
        transform = build_transforms(self.img_size, augment=self.use_augmentation)
        dataset = SegmentationDataset(self.train_dir, transform, self.img_size,
                                      cache=self.cache)
        # partial='replicate': a padded train batch would perturb BatchNorm
        # batch statistics, so partial batches load in full on every process
        # and run replicated (exact, mirrors the single-process mesh fallback)
        return BatchLoader(
            dataset, self.batch_size, shuffle=True, num_workers=self.num_workers,
            drop_last=drop_last, seed=self.seed,
            shard=shard, shard_pad_multiple=shard_pad_multiple, partial="replicate",
        )

    def get_val_loader(self, shard=None, shard_pad_multiple: int = 1) -> BatchLoader:
        transform = build_transforms(self.img_size, augment=False)
        dataset = SegmentationDataset(self.val_dir, transform, self.img_size,
                                      cache=self.cache)
        # partial='pad': the trainer's mask-aware eval step makes padded
        # batches produce exactly the unpadded metrics
        return BatchLoader(
            dataset, self.batch_size, shuffle=False, num_workers=self.num_workers,
            drop_last=False, seed=self.seed,
            shard=shard, shard_pad_multiple=shard_pad_multiple, partial="pad",
        )
