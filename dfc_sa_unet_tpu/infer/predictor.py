"""Inference engine: direct and batched sliding-window prediction.

The reference (inference.py:104-153) runs one H2D->forward->D2H round trip
*per tile* — the dominant cost on any accelerator.  Here all tiles of an
image are extracted host-side (uint8), stacked, and run through the model
in fixed-size batches (padding the last chunk so XLA sees exactly one
batch shape), then count-average-stitched on host.  TTA (identity + hflip
+ vflip, reference inference.py:134-141) rides the same batches: the
flipped copies are concatenated into the batch dimension instead of
tripling the number of forward passes.

When an image is at least tile_size in both dimensions, every clamped
tile is exactly tile_size x tile_size (reference's y_start clamp), so the
batched path is shape-static.  Smaller images fall back to a direct
forward at their own shape, exactly like the reference would.
"""

import queue
import threading
from functools import partial
from typing import Iterable, Iterator, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image, ImageFile

from dfc_sa_unet_tpu.data.loader import normalize_on_device

ImageFile.LOAD_TRUNCATED_IMAGES = True


def prefetch(it: Iterable, depth: int = 2) -> Iterator:
    """Run ``it`` in a background thread, ``depth`` items ahead.

    Used by the inference driver to overlap host image decode with device
    compute (the training loader has the same double-buffering pattern,
    data/loader.py:104; the reference decodes and predicts serially,
    reference inference.py:264-287).  Exceptions re-raise at the consumer.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    _END, _ERR = object(), object()

    def producer():
        try:
            for item in it:
                if stop.is_set():
                    return
                q.put(item)
            q.put(_END)
        except BaseException as e:  # noqa: BLE001 — forwarded to consumer
            q.put((_ERR, e))

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, tuple) and len(item) == 2 and item[0] is _ERR:
                raise item[1]
            yield item
    finally:
        stop.set()
        while not q.empty():
            try:
                q.get_nowait()
            except queue.Empty:
                break


def load_image(image_path: str, target_size: Optional[Tuple[int, int]] = None):
    """Load an image as RGB uint8 (PIL; cv2 for TIFF incl. BGRA handling,
    reference inference.py:34-71).  Returns (array_for_model, original_rgb)
    where array_for_model is optionally resized to target_size (W, H)."""
    image_path = image_path.replace("\\", "/")
    try:
        if image_path.lower().endswith((".tif", ".tiff")):
            import cv2

            arr = cv2.imread(image_path, cv2.IMREAD_UNCHANGED)
            if arr is None:
                raise IOError(f"cv2 could not read {image_path}")
            if arr.ndim == 3 and arr.shape[2] == 4:
                arr = cv2.cvtColor(arr, cv2.COLOR_BGRA2BGR)
            if arr.ndim == 2:
                arr = cv2.cvtColor(arr, cv2.COLOR_GRAY2BGR)
            original = cv2.cvtColor(arr, cv2.COLOR_BGR2RGB)
        else:
            original = np.array(Image.open(image_path).convert("RGB"))
        img = original
        if target_size:
            img = np.array(
                Image.fromarray(original).resize(tuple(target_size), Image.Resampling.BILINEAR)
            )
        return img, original
    except Exception as e:  # noqa: BLE001 — mirror reference's skip-and-continue
        print(f"Error: could not load image {image_path}: {e}")
        return None, None


class Predictor:
    """Jitted forward wrapper with a per-shape compile cache.

    ``apply_fn`` defaults to ``model.apply(..., train=False)``; pass e.g.
    a DFCEngine-backed callable for the folded+fused serving path.
    """

    def __init__(self, model, variables, compute_dtype=None, apply_fn=None,
                 exe_cache_dir=None, cache_salt="", mesh=None):
        self.model = model
        self.variables = variables
        self.compute_dtype = compute_dtype or jnp.float32
        # Data-parallel serving (the reference's inference.py:104-153 is
        # strictly single-device): with a jax.sharding.Mesh (axis 'data'),
        # variables are replicated and every predict_probs batch is
        # sharded over the batch dim — GSPMD inserts no collectives in
        # eval mode (BN uses running stats), so sharded probabilities are
        # exactly the single-device values and host-side stitching /
        # metric accumulation is unchanged.
        # With a 2-D ('data', 'spatial') mesh (parallel.mesh.serving_mesh),
        # image ROWS are sharded too: XLA inserts the conv halo exchanges
        # and pooled-attention reductions (collective-permute / all-reduce
        # over ICI) automatically, and the sharded forward matches
        # single-device to f32 noise — one large image can be served
        # exactly (no tile seams) across chips whose individual HBM its
        # activations would exceed.  Heights not divisible by the spatial
        # axis fall back to data-only sharding for that shape.
        self.mesh = mesh
        self._n_data = self._n_spatial = 1
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self._n_data = mesh.shape.get("data", 1)
            self._n_spatial = mesh.shape.get("spatial", 1)
            spec = (PartitionSpec("data", "spatial") if self._n_spatial > 1
                    else PartitionSpec("data"))
            self._data_sharding = NamedSharding(mesh, spec)
            self._batch_only_sharding = NamedSharding(mesh, PartitionSpec("data"))
            self._replicated = NamedSharding(mesh, PartitionSpec())
            self.variables = jax.device_put(self.variables, self._replicated)
        # Executable cache (utils/exe_cache): skips the 380-930 s first
        # tunnel compile on warm starts (measured 0.3 s reload).
        # ``cache_salt`` must cover any constants baked into apply_fn that
        # the source fingerprint cannot see (e.g. engine-folded weights —
        # inference.py passes tree_fingerprint of the checkpoint).  The
        # model's own hyperparameters (pool_size, features, ...) are
        # hashed from its dataclass repr: two configs of the same class
        # and weight shapes still produce different executables.
        self.exe_cache_dir = exe_cache_dir
        self.cache_salt = cache_salt
        self._compiled = {}  # input shape -> compiled executable
        if apply_fn is None:
            def apply_fn(variables, x):
                return self.model.apply(variables, x, train=False)

        @partial(jax.jit, static_argnames=())
        def _forward_u8(variables, images_u8):
            x = normalize_on_device(images_u8, self.compute_dtype)
            logits = apply_fn(variables, x)
            return jax.nn.sigmoid(logits.astype(jnp.float32))

        self._forward_u8 = _forward_u8

    def predict_probs(self, images_u8: np.ndarray) -> np.ndarray:
        """[B,H,W,3] uint8 -> [B,H,W] probabilities.

        Batch-shape policy (measured sweep in PERF.md): batch 128 is the
        fast shape on v5e — XLA's conv strategy for most other sizes runs
        at ~45% of its rate.  Batches in [64, 128) are zero-padded to 128
        and the padding discarded (computing 128 beats computing 64-127);
        batches > 128 are processed in 128-sized chunks (a 160-batch run
        native lands on the cliff; 128+32 does not), with the tail reusing
        the same policy.  B < 64 native wins over padding.
        """
        n = images_u8.shape[0]
        if n > 128:
            images_u8 = np.asarray(images_u8)
            out = np.empty((n, *images_u8.shape[1:3]), np.float32)
            for lo in range(0, n, 128):
                out[lo : lo + 128] = self.predict_probs(images_u8[lo : lo + 128])
            return out
        if 64 <= n < 128:
            pad = np.zeros((128 - n, *images_u8.shape[1:]), dtype=np.uint8)
            return self.predict_probs(np.concatenate([np.asarray(images_u8), pad]))[:n]
        # batch-size policy settled; mesh divisibility is handled below
        # WITHOUT re-entering the policy (a mesh whose size does not divide
        # 128 would otherwise pad past 128 and recurse forever)
        return self._run_exact(np.asarray(images_u8))

    def _run_exact(self, images_u8: np.ndarray) -> np.ndarray:
        """Forward a batch at its given size (plus mesh padding if needed),
        bypassing the 64/128 batch-shape policy."""
        n = images_u8.shape[0]
        if self.mesh is not None:
            if n % self._n_data != 0:
                # batch must divide the mesh's data axis: zero-pad and discard
                # (eval-mode forward is per-sample independent, so padding is
                # inert)
                pad = np.zeros(((-n) % self._n_data, *images_u8.shape[1:]), dtype=np.uint8)
                images_u8 = np.concatenate([images_u8, pad])
            sharding = self._data_sharding
            if self._n_spatial > 1 and images_u8.shape[1] % self._n_spatial != 0:
                # padding H would change the conv math at the bottom edge —
                # stay exact and shard the batch dim only for this shape
                print(f"(spatial={self._n_spatial} does not divide H="
                      f"{images_u8.shape[1]}; sharding batch only)")
                sharding = self._batch_only_sharding
            images_u8 = jax.device_put(jnp.asarray(images_u8), sharding)
        else:
            images_u8 = jnp.asarray(images_u8)
        if self.exe_cache_dir is not None:
            key = images_u8.shape
            if key not in self._compiled:
                import hashlib

                from dfc_sa_unet_tpu.utils.exe_cache import cached_compile

                mh = hashlib.sha1(repr(self.model).encode()).hexdigest()[:12]
                dp = (f":dp{self._n_data}x{self._n_spatial}"
                      if self.mesh is not None else "")
                self._compiled[key] = cached_compile(
                    self._forward_u8, self.exe_cache_dir,
                    f"{type(self.model).__name__}:{mh}:{jnp.dtype(self.compute_dtype).name}{dp}",
                    self.variables, images_u8,
                    salt=self.cache_salt,
                )
            probs = self._compiled[key](self.variables, images_u8)
        else:
            probs = self._forward_u8(self.variables, images_u8)
        return np.asarray(probs)[:n, ..., 0]  # [:n] discards mesh padding

    # ------------------------------------------------------------- direct

    def predict_single(self, image_u8: np.ndarray) -> np.ndarray:
        """One image, at its own resolution (reference inference.py:93-102)."""
        return self.predict_probs(image_u8[None])[0]

    # ----------------------------------------------------- sliding window

    def predict_sliding(
        self,
        image_u8: np.ndarray,
        tile_size: int = 224,
        overlap: int = 50,
        batch_size: int = 128,
        tta: bool = False,
    ) -> np.ndarray:
        """Overlap-averaged sliding-window prediction
        (reference inference.py:104-153), batched.
        """
        h, w = image_u8.shape[:2]
        if h < tile_size or w < tile_size:
            return self.predict_single(image_u8)
        stride = tile_size - overlap
        coords = []
        for y in range(0, h, stride):
            for x in range(0, w, stride):
                y_end, x_end = min(y + tile_size, h), min(x + tile_size, w)
                coords.append((max(0, y_end - tile_size), max(0, x_end - tile_size)))
        tiles = np.stack(
            [image_u8[ys : ys + tile_size, xs : xs + tile_size] for ys, xs in coords]
        )

        variants = [tiles]
        if tta:
            variants += [tiles[:, :, ::-1], tiles[:, ::-1, :]]  # hflip(W), vflip(H)
        stacked = np.concatenate(variants, axis=0)

        # fixed-size chunks: pad the tail so XLA compiles exactly one shape
        n = stacked.shape[0]
        preds = np.empty((n, tile_size, tile_size), np.float32)
        for lo in range(0, n, batch_size):
            hi = min(lo + batch_size, n)
            chunk = stacked[lo:hi]
            if hi - lo < batch_size:
                chunk = np.concatenate(
                    [chunk, np.zeros((batch_size - (hi - lo), *chunk.shape[1:]), chunk.dtype)]
                )
            preds[lo:hi] = self.predict_probs(chunk)[: hi - lo]

        t = len(coords)
        pred = preds[:t]
        if tta:
            pred = (pred + preds[t : 2 * t, :, ::-1] + preds[2 * t :, ::-1, :]) / 3.0

        canvas = np.zeros((h, w), np.float32)
        counts = np.zeros((h, w), np.float32)
        for p, (ys, xs) in zip(pred, coords):
            canvas[ys : ys + tile_size, xs : xs + tile_size] += p
            counts[ys : ys + tile_size, xs : xs + tile_size] += 1.0
        counts[counts == 0] = 1.0
        return canvas / counts

    def predict_sliding_stream(
        self,
        images: Iterable,
        tile_size: int = 224,
        overlap: int = 50,
        batch_size: int = 128,
        tta: bool = False,
    ) -> Iterator:
        """Sliding-window prediction over a STREAM of images, batching
        tiles ACROSS images.

        ``images`` yields ``(key, image_u8)``; this yields ``(key, probs)``
        in input order.  A single 512x512 image produces only 9 tiles —
        padding those to the TPU-fast batch of 128 wastes 14x the compute
        (PERF.md batch-shape cliff).  Here tiles from consecutive images
        fill shared fixed-size batches, so directory throughput approaches
        the dense-batch rate regardless of per-image tile counts.  Math is
        identical to per-image ``predict_sliding`` (same tiles, same
        count-average stitch; TTA variants ride the same shared batches).
        """
        pending: dict = {}  # key -> [canvas, counts, remaining_tiles]
        order: list = []  # emission order (input order)
        done: dict = {}  # key -> probs, for small-image fallbacks
        buf_meta: list = []  # (key, ys, xs, variant)
        buf_tiles: list = []

        def run_chunk(final: bool):
            while len(buf_tiles) >= batch_size or (final and buf_tiles):
                take = min(batch_size, len(buf_tiles))
                chunk = np.stack(buf_tiles[:take])
                meta = buf_meta[:take]
                del buf_tiles[:take], buf_meta[:take]
                if take < batch_size:
                    chunk = np.concatenate(
                        [chunk, np.zeros((batch_size - take, *chunk.shape[1:]), chunk.dtype)]
                    )
                probs = self.predict_probs(chunk)[:take]
                for (key, ys, xs, var), p in zip(meta, probs):
                    if var == 1:
                        p = p[:, ::-1]
                    elif var == 2:
                        p = p[::-1, :]
                    canvas, counts, _ = pending[key]
                    canvas[ys : ys + tile_size, xs : xs + tile_size] += p
                    counts[ys : ys + tile_size, xs : xs + tile_size] += 1.0
                    pending[key][2] -= 1

        def completed():
            while order:
                key = order[0]
                if key in done:
                    yield key, done.pop(key)
                elif key in pending and pending[key][2] == 0:
                    canvas, counts, _ = pending.pop(key)
                    counts[counts == 0] = 1.0
                    yield key, canvas / counts
                else:
                    return
                order.pop(0)

        for key, image_u8 in images:
            h, w = image_u8.shape[:2]
            order.append(key)
            if h < tile_size or w < tile_size:
                run_chunk(final=True)  # keep emission order: flush older tiles
                done[key] = self.predict_single(image_u8)
                yield from completed()
                continue
            stride = tile_size - overlap
            coords = []
            for y in range(0, h, stride):
                for x in range(0, w, stride):
                    y_end, x_end = min(y + tile_size, h), min(x + tile_size, w)
                    coords.append((max(0, y_end - tile_size), max(0, x_end - tile_size)))
            nvar = 3 if tta else 1
            pending[key] = [np.zeros((h, w), np.float32), np.zeros((h, w), np.float32),
                            len(coords) * nvar]
            for ys, xs in coords:
                tile = image_u8[ys : ys + tile_size, xs : xs + tile_size]
                buf_meta.append((key, ys, xs, 0))
                buf_tiles.append(tile)
                if tta:
                    buf_meta.append((key, ys, xs, 1))
                    buf_tiles.append(tile[:, ::-1])
                    buf_meta.append((key, ys, xs, 2))
                    buf_tiles.append(tile[::-1, :])
            run_chunk(final=False)
            yield from completed()

        run_chunk(final=True)
        yield from completed()
        assert not pending and not done, (list(pending), list(done))
