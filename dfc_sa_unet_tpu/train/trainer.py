"""Trainer — jitted epoch loop with the reference's training semantics.

Reference behavior preserved (utils/trainer.py:105-461):
  * forward -> sigmoid -> loss on probabilities, per-batch hard IoU/Dice,
  * NaN-loss batches are skipped (branch-free on device: a non-finite loss
    zeroes the update and the batch is excluded from running means),
  * grad clip at global-norm 1.0, SGD(momentum, weight_decay),
  * per-epoch validation with best/worst-K sample collection by Dice,
  * best model = highest validation Dice; periodic + best checkpoints,
  * loss/Dice/IoU plots + CSVs each epoch, per-epoch sample dumps.

TPU-first differences (documented, not semantic):
  * per-sample validation metrics are one vectorized reduction on device
    (the reference re-runs calculate_metrics per sample on host),
  * only scalar metrics sync to host each step; images for the K sample
    dumps are re-read from disk after the epoch,
  * resume actually works: full state (params, batch_stats, optimizer
    momentum, history, epoch) restores and training continues at epoch+1
    (the reference wipes history and restarts at 0 — SURVEY.md §3.5),
  * optional data-parallel mesh: batches are sharded over 'data', XLA
    inserts the gradient/BN-stat reductions over ICI automatically.
"""

import os
import signal
import threading
import time
from functools import partial
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from dfc_sa_unet_tpu.data.loader import (
    BatchLoader,
    binarize_mask_on_device,
    normalize_on_device,
)
from dfc_sa_unet_tpu.losses import compute_loss
from dfc_sa_unet_tpu.metrics import hard_dice_iou, per_sample_hard_dice_iou
from dfc_sa_unet_tpu.train import optim
from dfc_sa_unet_tpu.utils import checkpoint as ckpt_util
from dfc_sa_unet_tpu.utils.profiling import StepTimer
from dfc_sa_unet_tpu.utils.visualization import (
    save_loss_plot,
    save_metrics_plot,
    save_prediction_samples,
)

HISTORY_KEYS = (
    "train_losses", "val_losses", "train_dice_scores", "val_dice_scores",
    "train_iou_scores", "val_iou_scores",
)


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


class Trainer:
    def __init__(
        self,
        model,
        train_loader: BatchLoader,
        val_loader: BatchLoader,
        config: Mapping[str, Any],
        mesh: Optional[jax.sharding.Mesh] = None,
        seed: int = 0,
        compute_dtype=None,
        init_variables: Optional[Mapping[str, Any]] = None,
    ):
        self.model = model
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.config = config
        self.mesh = mesh
        self.compute_dtype = compute_dtype
        # warm-start weights (config['model']['pretrained_path'] via
        # factory.load_pretrained_variables — reference model_factory.py:50-72)
        self.init_variables = init_variables

        tr = config["training"]
        self.num_epochs = tr["num_epochs"]
        self.save_checkpoint_freq = tr.get("save_checkpoint_freq", 100)
        # Gradient accumulation: split each batch into `grad_accum`
        # sequential microbatches inside the jitted step (lax.scan) and
        # apply one averaged update.  This is how batches beyond the
        # remote compiler's memory cap train on this chip (PERF.md:
        # B=256 fails to compile even with remat; 2x128 accumulation
        # compiles like B=128).  BatchNorm stats update per microbatch
        # (same semantics as consecutive smaller torch batches).  Note
        # the loss semantics: batch-coupled losses (the dice/tversky
        # sums) are computed over each microbatch and AVERAGED, which is
        # not identical to one dice over the virtual batch — gradients
        # differ slightly from a true monolithic B=N*M step (BCE terms
        # are exact; the update count is unchanged).  Opt in to
        # ``grad_accum_exact`` for monolithic loss semantics: the loss
        # (and its gradient) is computed over the probs of the WHOLE
        # virtual batch, with the forward scan rematerialized so memory
        # stays at one microbatch (cost: one extra forward per
        # microbatch in the backward pass).  BatchNorm still normalizes
        # per microbatch either way.
        self.grad_accum = int(tr.get("grad_accum", 1))
        self.grad_accum_exact = bool(tr.get("grad_accum_exact", False))
        loss_cfg = tr.get("loss", {}) or {}
        self.loss_type = loss_cfg.get("type", "dice")
        self.loss_params = dict(loss_cfg.get("params", {}) or {})

        self.log_dir = config["logging"]["log_dir"].replace("\\", "/")
        self.images_dir = config["logging"]["images_dir"].replace("\\", "/")
        self.save_k = config["logging"].get("save_best_worst_samples", 0)
        os.makedirs(self.log_dir, exist_ok=True)
        os.makedirs(self.images_dir, exist_ok=True)
        self.checkpoint_dir = os.path.join(self.log_dir, "checkpoints")
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        self.best_model_path = os.path.join(self.log_dir, "best_model")

        self.tx = optim.from_config(config)
        self.base_key = jax.random.key(seed)
        self.history = {k: [] for k in HISTORY_KEYS}
        self.epochs: list = []
        self.best_val_dice = 0.0
        self.best_val_loss = float("inf")
        self.start_epoch = 0
        self.start_time = time.time()
        # Preemption safety: SIGTERM/SIGINT request a checkpoint + clean stop
        # (TPU VMs are preemptible; the reference has no recovery story).
        self._stop_requested = threading.Event()
        self._input_bound_warned = False

        # donate the TrainState: the step returns a new state of identical
        # structure, so XLA can update params/opt/BN stats in place instead
        # of double-buffering them (meaningful at B>=128 on a 16 GB chip)
        self._train_step_jit = jax.jit(partial(self._step_impl, train=True), donate_argnums=(0,))
        self._eval_step = jax.jit(partial(self._step_impl, train=False))
        # opt-in warm start: serialize/reload the compiled train step
        # (training.exe_cache_dir / train.py --exe_cache; utils/exe_cache)
        self.exe_cache_dir = tr.get("exe_cache_dir")
        self._train_step_cached = None

        if self.mesh is not None:
            # 1-D 'data' mesh: batches shard on the batch dim.  A 2-D
            # ('data','spatial') mesh (parallel.mesh.serving_mesh) also
            # shards image ROWS — XLA inserts the conv halo exchanges and
            # all-reduces BN batch statistics across both axes, so large
            # crops whose activations exceed one chip's HBM can train
            # exactly (tests pin 2-D step == single-device).
            self._n_data = self.mesh.shape.get("data", 1)
            self._n_spatial = self.mesh.shape.get("spatial", 1)
            spec = (jax.sharding.PartitionSpec("data", "spatial")
                    if self._n_spatial > 1 else jax.sharding.PartitionSpec("data"))
            self._data_sharding = jax.sharding.NamedSharding(self.mesh, spec)
            # [B]-shaped arrays (validity masks) shard on 'data' only
            self._vec_sharding = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec("data")
            )
            self._replicated = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec()
            )
        else:
            self._data_sharding = None
        # Multi-host (pod) mode: the mesh spans every process's devices;
        # batches arrive as per-process chunks (BatchLoader(shard=...)) and
        # are assembled into global arrays; artifacts/checkpoints are
        # written by process 0 only (parallel/multihost.py).
        self._multihost = jax.process_count() > 1
        self._is_primary = jax.process_index() == 0
        self._warned_replicated = False
        self._warned_spatial = False
        self._warned_accum_replicated = False

    def _replicate_state(self, state):
        """Place a host-local state pytree replicated on the mesh.

        Multi-host: ``device_put`` cannot target non-addressable devices,
        so each process contributes its (identical, seed-deterministic)
        local copy via ``make_array_from_process_local_data``.
        """
        if not self._multihost:
            return jax.device_put(state, self._replicated)
        from dfc_sa_unet_tpu.parallel import multihost as mh

        return mh.global_batch(state, self._replicated)

    def _batch_sharding(self, height: int):
        """Data(-x-spatial) sharding for an image batch.

        When the height doesn't divide the mesh's spatial axis, padding
        rows would perturb the bottom-edge conv math and the BN
        statistics — stay exact and shard the batch dimension only,
        warning once.
        """
        if self._n_spatial > 1 and height % self._n_spatial != 0:
            if not self._warned_spatial:
                self._warned_spatial = True
                print(f"Warning: image height {height} is not divisible "
                      f"by the mesh's spatial axis ({self._n_spatial}); "
                      f"sharding the batch dimension only.")
            return self._vec_sharding
        return self._data_sharding

    def _warn_replicated(self, n: int):
        if not self._warned_replicated:
            self._warned_replicated = True
            print(f"Warning: train batch of {n} is not divisible by the "
                  f"mesh's data axis; running it replicated (exact math, "
                  f"no data-parallel speedup). Size batches to a multiple "
                  f"of the data-axis size to avoid this.")

    # ---------------------------------------------------------------- state

    def init_state(self, sample_batch) -> TrainState:
        if self.init_variables is not None:
            variables = jax.tree.map(jnp.asarray, self.init_variables)
        else:
            x = normalize_on_device(
                jnp.asarray(sample_batch["image"][:1]), self.compute_dtype or jnp.float32
            )
            variables = self.model.init(self.base_key, x, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        state = TrainState(
            params=params, batch_stats=batch_stats, opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
        )
        if self.mesh is not None:
            state = self._replicate_state(state)
        return state

    # ---------------------------------------------------------------- steps

    def _train_step(self, state, imgs, masks):
        """One jitted train step (donates ``state``).  With
        ``training.exe_cache_dir`` set, the compiled executable is
        serialized/reloaded across processes (utils/exe_cache) — the
        tunnel's 380-930 s first compile becomes a ~0.3 s reload."""
        if self.exe_cache_dir is None:
            return self._train_step_jit(state, imgs, masks)
        if self._train_step_cached is None:
            import hashlib
            import json

            from dfc_sa_unet_tpu.utils.exe_cache import cached_compile

            # Everything traced into the step as a constant must be in the
            # key: loss params (tversky alpha/beta, bce_dice weights) and
            # optimizer hyperparameters (lr/momentum/weight_decay) are
            # compile-time constants, so a hyperparameter sweep sharing one
            # cache dir must not reuse the first run's executable.
            tr = dict(self.config.get("training", {}))
            for k in ("exe_cache_dir", "num_workers", "save_checkpoint_freq",
                      "num_epochs", "device"):
                tr.pop(k, None)
            # The model side must be in the key too: pool_size / use_pallas /
            # remat change the compiled math without changing the class name
            # or any argument shape (attention Q/K params are pool-size
            # independent).  repr(module) covers every dataclass field of
            # the unbound flax module, including flags the YAML cannot see.
            hp = hashlib.sha1(
                (json.dumps(tr, sort_keys=True, default=str)
                 + json.dumps(self.config.get("model", {}), sort_keys=True, default=str)
                 + repr(self.model)).encode()
            ).hexdigest()[:12]
            self._train_step_cached = cached_compile(
                self._train_step_jit, self.exe_cache_dir,
                f"train:{type(self.model).__name__}:{self.loss_type}:{self.grad_accum}",
                state, imgs, masks,
                salt=hp, donates=True,
            )
        return self._train_step_cached(state, imgs, masks)

    def _forward(self, params, batch_stats, x, train, rng):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        mutable = ["batch_stats"] if (train and batch_stats) else False
        rngs = {"dropout": rng} if train else None
        out = self.model.apply(variables, x, train=train, mutable=mutable, rngs=rngs)
        if mutable:
            logits, mutated = out
            return logits, mutated.get("batch_stats", batch_stats)
        return out, batch_stats

    def _step_impl(self, state: TrainState, images_u8, masks_u8, valid=None, *, train: bool):
        x = normalize_on_device(images_u8, self.compute_dtype or jnp.float32)
        t = binarize_mask_on_device(masks_u8)
        rng = jax.random.fold_in(self.base_key, state.step)

        if not train:
            logits, _ = self._forward(state.params, state.batch_stats, x, False, rng)
            probs = jax.nn.sigmoid(logits.astype(jnp.float32))
            if valid is not None:
                # zero-padded partial batch (sharded eval): masked probs +
                # mask-aware losses make every metric equal the unpadded
                # value exactly (eval-mode BN -> padding never affects the
                # valid samples' forward)
                probs = probs * valid.reshape(-1, *([1] * (probs.ndim - 1)))
            loss = compute_loss(probs, t, self.loss_type, self.loss_params, sample_mask=valid)
            iou, dice = hard_dice_iou(probs, t)
            ps_iou, ps_dice = per_sample_hard_dice_iou(probs, t)
            return state, {
                "loss": loss, "iou": iou, "dice": dice,
                "per_sample_iou": ps_iou, "per_sample_dice": ps_dice,
            }

        def loss_fn(params, stats, xi, ti, rng_i):
            logits, new_stats = self._forward(params, stats, xi, True, rng_i)
            probs = jax.nn.sigmoid(logits.astype(jnp.float32))
            loss = compute_loss(probs, ti, self.loss_type, self.loss_params)
            return loss, (probs, new_stats)

        accum = self.grad_accum
        if accum > 1 and x.shape[0] % accum == 0:
            bsz = x.shape[0]
            xm = x.reshape(accum, bsz // accum, *x.shape[1:])
            tm = t.reshape(accum, bsz // accum, *t.shape[1:])
            if self.mesh is not None:
                # Pin the microbatch sharding explicitly.  Left to GSPMD
                # propagation, the [B,...] -> [accum, B/accum, ...] reshape
                # of a ('data','spatial')-sharded batch miscompiles on
                # jax/jaxlib 0.9.0: every conv WEIGHT gradient comes out
                # exactly min(accum, data_axis) times the true value
                # (minimal repro: scripts/repro_scan_halo_grad.py; numbers
                # in PERF.md).  An explicit with_sharding_constraint on the
                # reshaped array restores exact gradients — verified for
                # accum 2/4, meshes 4x2/2x4, and through BN-style batch
                # statistics.  Specs mirror _put_batch's divisibility
                # rules (all shapes are static at trace time).
                data_ax = ("data" if self._n_data > 1
                           and (bsz // accum) % self._n_data == 0 else None)
                sp_ax = ("spatial" if self._n_spatial > 1
                         and x.shape[1] % self._n_spatial == 0 else None)
                two_d = self._n_data > 1 and self._n_spatial > 1
                if two_d and data_ax is None:
                    # Microbatch does not divide the data axis.  KEEPING the
                    # row sharding is not an option: a conv weight gradient
                    # whose input is 'spatial'-sharded while a >1 'data'
                    # axis sits idle (batch dim replicated) is double-
                    # counted — exactly min(accum, data)x — in EVERY
                    # formulation measured (micro pin P(None, None,
                    # 'spatial'), batch replicated outside jit, dynamic-
                    # slice instead of reshape, pins on xi/gi/gsum inside
                    # the scan body; see scripts/repro_scan_halo_grad.py's
                    # idle-axis rows).  Plain grads show the same 2x with
                    # in=P(None, 'spatial') on a (2, 4) mesh, so this is an
                    # XLA partitioner bug, not a reshape artifact.  The only
                    # exact fallback is FULL microbatch replication — and
                    # the full-batch mask t must be pinned replicated TOO:
                    # the post-scan metrics consume t with its original
                    # ('data', 'spatial') sharding, and that single
                    # conflicting use is enough to push the resharding
                    # back inside the scan and re-trigger the exact same
                    # 2x (measured; idle-axis rows in the repro script).
                    sp_ax = None
                    rep = jax.sharding.NamedSharding(
                        self.mesh, jax.sharding.PartitionSpec()
                    )
                    t = jax.lax.with_sharding_constraint(t, rep)
                    tm = t.reshape(accum, bsz // accum, *t.shape[1:])
                    if not self._warned_accum_replicated:
                        self._warned_accum_replicated = True
                        print(f"Warning: microbatch {bsz}//{accum} does not "
                              f"divide the data axis ({self._n_data}); "
                              f"running the grad-accum loop fully "
                              f"replicated for exactness (all parallel "
                              f"speedup lost) — pick grad_accum/batch so "
                              f"(B/accum) % data == 0")
                if data_ax is not None or sp_ax is not None or two_d:
                    micro_sh = jax.sharding.NamedSharding(
                        self.mesh, jax.sharding.PartitionSpec(None, data_ax, sp_ax)
                    )
                    xm = jax.lax.with_sharding_constraint(xm, micro_sh)
                    tm = jax.lax.with_sharding_constraint(tm, micro_sh)
                # else: 1-D mesh whose axis does not divide the microbatch —
                # leave GSPMD propagation alone (exact on 1-D meshes, see the
                # repro's PINNED/1-D rows; forcing PartitionSpec(None, None,
                # None) here would silently all-gather the batch and run
                # every device replicated)

            if self.grad_accum_exact:
                # Exact virtual-batch semantics: the batch-coupled
                # dice/tversky/joint sums run over ALL accum*mb samples at
                # once, so gradients equal the monolithic B-sized step's
                # (for BN-free models bitwise; with BN the per-microbatch
                # normalization remains the documented deviation).  The
                # scan body is rematerialized so only one microbatch's
                # activations are live at a time; the backward recomputes
                # each forward (2 fwd + 1 bwd per microbatch — grad-accum
                # memory with monolithic loss semantics).
                def virtual_loss(params):
                    def body(stats, inp):
                        i, xi = inp
                        logits, new_stats = self._forward(
                            params, stats, xi, True, jax.random.fold_in(rng, i)
                        )
                        return new_stats, jax.nn.sigmoid(logits.astype(jnp.float32))

                    new_stats, probs_m = jax.lax.scan(
                        jax.checkpoint(body), state.batch_stats,
                        (jnp.arange(accum), xm),
                    )
                    probs_full = probs_m.reshape(bsz, *probs_m.shape[2:])
                    loss = compute_loss(probs_full, t, self.loss_type, self.loss_params)
                    return loss, (probs_full, new_stats)

                (loss, (probs, new_stats)), grads = jax.value_and_grad(
                    virtual_loss, has_aux=True
                )(state.params)
            else:
                def micro(carry, inp):
                    stats, gacc = carry
                    i, xi, ti = inp
                    (loss_i, (probs_i, new_stats)), grads_i = jax.value_and_grad(
                        loss_fn, has_aux=True
                    )(state.params, stats, xi, ti, jax.random.fold_in(rng, i))
                    gacc = jax.tree.map(lambda a, g: a + g, gacc, grads_i)
                    return (new_stats, gacc), (loss_i, probs_i)

                zero_g = jax.tree.map(jnp.zeros_like, state.params)
                (new_stats, gsum), (losses, probs_m) = jax.lax.scan(
                    micro, (state.batch_stats, zero_g), (jnp.arange(accum), xm, tm)
                )
                loss = losses.mean()
                grads = jax.tree.map(lambda g: g / accum, gsum)
                probs = probs_m.reshape(bsz, *probs_m.shape[2:])
        else:
            (loss, (probs, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, x, t, rng)
        # NaN guard (reference utils/trainer.py:134-139): skip the update.
        # Gate on GRADIENT finiteness too, not just the loss — a batch can
        # produce a finite loss with a NaN/Inf gradient (e.g. a 0*inf in a
        # backward), and one such applied update corrupts params for the
        # rest of the run (observed in the round-5 soak before the _bce
        # endpoint fix; clip_by_global_norm passes NaN through).  The
        # global norm is one extra reduction per leaf — noise next to the
        # conv VJPs.
        finite = jnp.isfinite(loss) & jnp.isfinite(optax.global_norm(grads))
        grads = jax.tree.map(lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        updates, new_opt_state = self.tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + jnp.where(finite, u, 0.0), state.params, updates)
        new_opt_state = jax.tree.map(
            lambda n, o: jnp.where(finite, n, o), new_opt_state, state.opt_state
        )
        # BN running stats must also skip: a non-finite batch's activations
        # would otherwise poison mean/var (used by every later eval) even
        # though the param update was zeroed.
        new_stats = jax.tree.map(
            lambda n, o: jnp.where(finite, n, o), new_stats, state.batch_stats
        )
        iou, dice = hard_dice_iou(probs, t)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, {"loss": loss, "iou": iou, "dice": dice, "finite": finite}

    def _put_batch(self, batch, pad_to_devices: bool = False):
        """Move a batch to device(s).  Returns (imgs, masks, valid).

        Under a mesh, a batch whose size is not a multiple of the device
        count cannot be sharded.  For eval (``pad_to_devices=True``) it is
        zero-padded up to the next multiple and a [B] validity mask is
        returned — the mask-aware eval step reproduces the unpadded
        metrics exactly.  For training, padding would perturb BatchNorm
        batch statistics (and hence the valid samples' gradients), so the
        batch runs replicated instead, with a one-time warning.
        """
        if self._data_sharding is not None and self._multihost:
            return self._put_batch_multihost(batch, pad_to_devices)
        imgs = jnp.asarray(batch["image"])
        masks = jnp.asarray(batch["mask"])
        valid = None
        if self._data_sharding is not None:
            n_dev = self._n_data
            n = imgs.shape[0]
            if n % n_dev != 0:
                if pad_to_devices:
                    pad = (-n) % n_dev
                    imgs = jnp.concatenate(
                        [imgs, jnp.zeros((pad, *imgs.shape[1:]), imgs.dtype)]
                    )
                    masks = jnp.concatenate(
                        [masks, jnp.zeros((pad, *masks.shape[1:]), masks.dtype)]
                    )
                    valid = jnp.concatenate(
                        [jnp.ones((n,), jnp.float32), jnp.zeros((pad,), jnp.float32)]
                    )
                else:
                    self._warn_replicated(n)
                    return imgs, masks, None
            sharding = self._batch_sharding(imgs.shape[1])
            imgs = jax.device_put(imgs, sharding)
            masks = jax.device_put(masks, sharding)
            if valid is not None:
                valid = jax.device_put(valid, self._vec_sharding)
        return imgs, masks, valid

    def _put_batch_multihost(self, batch, pad_to_devices: bool):
        """Assemble per-process loader chunks into global arrays.

        The loader (``BatchLoader(shard=(pid, nproc))``) already did the
        padding arithmetic: every process holds either its contiguous
        chunk of the global batch (plus a ``valid`` mask when padded) or
        the full batch when it chose the replicate policy for a partial
        train batch.  ``make_array_from_process_local_data`` turns the
        chunks into one global jax.Array without any host ever holding
        the full pixel data.

        Unsharded loaders (no ``filename_global`` key — e.g. the mesh's
        data axis is smaller than the process count, see train.py) hand
        every process the FULL batch; it is sliced onto the devices via
        an explicit ``global_shape`` when divisible, else run replicated.
        """
        from dfc_sa_unet_tpu.parallel import multihost as mh

        imgs = np.asarray(batch["image"])
        masks = np.asarray(batch["mask"])
        if "filename_global" not in batch and not batch.get("replicated"):
            n_data = self.mesh.shape.get("data", 1)
            if imgs.shape[0] % n_data == 0:
                sharding = self._batch_sharding(imgs.shape[1])
                put = lambda x: jax.make_array_from_process_local_data(
                    sharding, x, x.shape)  # local IS global: same on every host
                return put(imgs), put(masks), None
            batch = dict(batch, replicated=True)
        if batch.get("replicated"):
            # partial train batch: every process loaded the full batch —
            # run it replicated (exact math, mirrors the single-process
            # mesh fallback; padding would perturb BN batch statistics)
            self._warn_replicated(imgs.shape[0])
            g = mh.global_batch((imgs, masks), self._replicated)
            return g[0], g[1], None
        valid = batch.get("valid")
        if valid is not None and not pad_to_devices:
            raise ValueError(
                "padded multi-host batch reached the train step — build the "
                "train loader with partial='replicate' (padding perturbs "
                "BatchNorm batch statistics)"
            )
        sharding = self._batch_sharding(imgs.shape[1])
        g_imgs = jax.make_array_from_process_local_data(sharding, imgs)
        g_masks = jax.make_array_from_process_local_data(sharding, masks)
        g_valid = None
        if valid is not None:
            g_valid = jax.make_array_from_process_local_data(
                self._vec_sharding, np.asarray(valid, np.float32))
        return g_imgs, g_masks, g_valid

    # ---------------------------------------------------------------- epochs

    def train_epoch(self, state: TrainState, epoch: int):
        self.train_loader.set_epoch(epoch)
        sums = {"loss": 0.0, "iou": 0.0, "dice": 0.0}
        n_used = 0
        timer = StepTimer()
        timer.tick()
        from tqdm import tqdm

        progress = tqdm(
            self.train_loader, total=len(self.train_loader),
            desc=f"Epoch {epoch + 1}/{self.num_epochs} [Train]", leave=False,
            disable=not self._is_primary,
        )
        # input-bound detection: the loader is double-buffered, so any time
        # spent in next() is the host pipeline failing to keep up with the
        # device step (PERF.md round 3: uncached decode feeds ~144 img/s on
        # a 1-core host, below every measured step rate)
        wait_s = 0.0
        epoch_t0 = time.perf_counter()
        batch_iter = iter(progress)
        while True:
            t0 = time.perf_counter()
            batch = next(batch_iter, None)
            wait_s += time.perf_counter() - t0
            if batch is None:
                break
            imgs, masks, _ = self._put_batch(batch)
            state, metrics = self._train_step(state, imgs, masks)
            loss = float(metrics["loss"])
            timer.tick(items=int(imgs.shape[0]))
            if not np.isfinite(loss):
                print(f"Warning: NaN loss detected at step {int(state.step)}; batch skipped")
                continue
            if loss > 100:
                print(f"Warning: very large loss detected: {loss:.6f}")
            sums["loss"] += loss
            sums["iou"] += float(metrics["iou"])
            sums["dice"] += float(metrics["dice"])
            n_used += 1
            progress.set_postfix(
                loss=sums["loss"] / n_used, iou=sums["iou"] / n_used, dice=sums["dice"] / n_used
            )
            if self._check_stop():
                break
        progress.close()
        if timer.steps and self._is_primary:
            print(f"  [epoch {epoch + 1}] {timer.summary()}")
        epoch_wall = time.perf_counter() - epoch_t0
        if (not self._input_bound_warned and n_used >= 2
                and epoch_wall > 0 and wait_s / epoch_wall > 0.3):
            self._input_bound_warned = True
            ds = getattr(self.train_loader, "dataset", None)
            cache_hint = ("" if getattr(ds, "cache", True)
                          else " enable dataset.cache or")
            print(f"  [input-bound] {wait_s / epoch_wall:.0%} of epoch "
                  f"{epoch + 1} was spent waiting on the host loader —"
                  f"{cache_hint} raise training.num_workers")
        n = max(n_used, 1)
        return state, (sums["loss"] / n, sums["iou"] / n, sums["dice"] / n)

    def validate_epoch(self, state: TrainState, loader: Optional[BatchLoader] = None):
        loader = loader or self.val_loader
        sums = {"loss": 0.0, "iou": 0.0, "dice": 0.0}
        n_batches = 0
        sample_records = []  # (dice, iou, filename)
        for batch in loader:
            imgs, masks, valid = self._put_batch(batch, pad_to_devices=True)
            _, metrics = self._eval_step(state, imgs, masks, valid)
            loss = float(metrics["loss"])
            if not np.isfinite(loss):
                print("Warning: NaN loss detected in validation; batch skipped")
                continue
            sums["loss"] += loss
            sums["iou"] += float(metrics["iou"])
            sums["dice"] += float(metrics["dice"])
            n_batches += 1
            if self._multihost and self.mesh is not None:
                # per-sample vectors are batch-sharded across hosts;
                # allgather the real rows so best/worst-K selection stays
                # globally exact (identical on every process)
                from dfc_sa_unet_tpu.parallel import multihost as mh

                names = batch.get("filename_global", batch["filename"])
                ps_dice, ps_iou = mh.gather_rows_many(
                    [metrics["per_sample_dice"], metrics["per_sample_iou"]],
                    len(names))
            else:
                names = batch["filename"]
                ps_dice = np.asarray(metrics["per_sample_dice"])
                ps_iou = np.asarray(metrics["per_sample_iou"])
            for i, fname in enumerate(names):
                sample_records.append((float(ps_dice[i]), float(ps_iou[i]), fname))
        n = max(n_batches, 1)
        sample_records.sort(key=lambda r: r[0])
        k = self.save_k
        return {
            "loss": sums["loss"] / n,
            "iou": sums["iou"] / n,
            "dice": sums["dice"] / n,
            "worst_samples": sample_records[:k] if k else [],
            "best_samples": sample_records[-k:] if k else [],
        }

    # ------------------------------------------------------------ checkpoint

    def _state_to_tree(self, state: TrainState, epoch: int):
        opt_leaves = jax.tree.leaves(state.opt_state)
        return {
            "epoch": np.asarray(epoch),
            "step": np.asarray(state.step),
            "params": jax.tree.map(np.asarray, state.params),
            "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
            "opt_leaves": [np.asarray(l) for l in opt_leaves],
            "history": {k: np.asarray(v, np.float64) for k, v in self.history.items()},
            "best_val_dice": np.asarray(self.best_val_dice),
            "best_val_loss": np.asarray(self.best_val_loss),
        }

    def save_checkpoint(self, state: TrainState, epoch: int, is_best: bool = False):
        if not self._is_primary:
            return  # one writer per cluster; state is replicated anyway
        tree = self._state_to_tree(state, epoch)
        path = os.path.join(self.checkpoint_dir, f"checkpoint_epoch_{epoch + 1}")
        ckpt_util.save_pytree(path, tree)
        if is_best:
            ckpt_util.save_pytree(os.path.join(self.checkpoint_dir, "best_checkpoint"), tree)
            ckpt_util.save_pytree(
                self.best_model_path,
                {"params": tree["params"], "batch_stats": tree["batch_stats"]},
            )

    def load_checkpoint(self, path: str, state: TrainState) -> TrainState:
        """Restore full training state; sets start_epoch to epoch+1."""
        template = self._state_to_tree(state, 0)
        tree = ckpt_util.restore_pytree(path, template)
        if self._multihost:
            # every process restored the same shared-filesystem checkpoint;
            # make that bit-exact by construction (process 0's bytes win)
            from dfc_sa_unet_tpu.parallel import multihost as mh

            tree = mh.broadcast_tree(tree)
        opt_state = jax.tree.unflatten(
            jax.tree.structure(state.opt_state), [jnp.asarray(l) for l in tree["opt_leaves"]]
        )
        self.history = {k: list(np.asarray(v)) for k, v in tree["history"].items()}
        self.epochs = list(range(1, len(self.history["train_losses"]) + 1))
        self.best_val_dice = float(tree["best_val_dice"])
        self.best_val_loss = float(tree["best_val_loss"])
        self.start_epoch = int(tree["epoch"]) + 1
        new_state = TrainState(
            params=jax.tree.map(jnp.asarray, tree["params"]),
            batch_stats=jax.tree.map(jnp.asarray, tree["batch_stats"]),
            opt_state=opt_state,
            step=jnp.asarray(tree["step"], jnp.int32),
        )
        if self.mesh is not None:
            new_state = self._replicate_state(new_state)
        print(f"Resuming from epoch {self.start_epoch}")
        return new_state

    # ---------------------------------------------------------------- train

    def _dump_samples(self, state: TrainState, records, out_dir: str):
        """Re-read the K selected samples and render prediction dumps."""
        if not records:
            return
        os.makedirs(out_dir, exist_ok=True)
        state = state.replace(
            params=jax.tree.map(np.asarray, state.params),
            batch_stats=jax.tree.map(np.asarray, state.batch_stats),
        ) if self._multihost else state  # global arrays -> host (op-by-op
        # forwards below must not mix local inputs with multi-host arrays)
        dataset = self.val_loader.dataset
        by_name = {s[2]: i for i, s in enumerate(dataset.samples)}
        for _, _, fname in records:
            idx = by_name.get(fname)
            if idx is None:
                continue
            sample = dataset.__getitem__(idx)
            img_u8 = sample["image"][None]
            mask_u8 = sample["mask"][None]
            x = normalize_on_device(jnp.asarray(img_u8), self.compute_dtype or jnp.float32)
            logits, _ = self._forward(state.params, state.batch_stats, x, False, self.base_key)
            probs = np.asarray(jax.nn.sigmoid(logits.astype(jnp.float32)))
            img_norm = np.asarray(x)
            mask = (mask_u8 >= 128).astype(np.float32)[..., None]
            save_prediction_samples(img_norm, probs, mask, [fname], out_dir)

    def _check_stop(self) -> bool:
        """Preemption stop flag, agreed on by EVERY process.

        SIGTERM lands on each process at a different moment; a process
        leaving the step loop alone would desynchronize the training
        collectives (the rest would block forever in the next
        all-reduce).  In multihost mode the local flag is OR-reduced
        across processes — checked once per train step and once per
        epoch, at the same program point on every process.
        """
        stop = self._stop_requested.is_set()
        if self._multihost:
            from dfc_sa_unet_tpu.parallel import multihost as mh

            stop = mh.any_flag(stop)
        return stop

    def _install_preemption_handler(self):
        if threading.current_thread() is not threading.main_thread():
            return
        def handler(signum, frame):
            print(f"Signal {signum} received — will checkpoint and stop at the epoch boundary")
            self._stop_requested.set()
        try:
            signal.signal(signal.SIGTERM, handler)
            signal.signal(signal.SIGINT, handler)
        except ValueError:
            pass

    def train(self, resume_from: Optional[str] = None, state: Optional[TrainState] = None):
        first_batch = next(iter(self.val_loader))
        if state is None:
            state = self.init_state(first_batch)
        if resume_from:
            state = self.load_checkpoint(resume_from, state)
        self._install_preemption_handler()

        if self._is_primary:
            print(f"Using loss: {self.loss_type} params={self.loss_params}")
        for epoch in range(self.start_epoch, self.num_epochs):
            if self._check_stop():
                self.save_checkpoint(state, epoch - 1)
                if self._is_primary:
                    print(f"Preemption checkpoint saved at epoch {epoch}; exiting")
                break
            state, (tr_loss, tr_iou, tr_dice) = self.train_epoch(state, epoch)
            val = self.validate_epoch(state)

            self.epochs.append(epoch + 1)
            self.history["train_losses"].append(tr_loss)
            self.history["val_losses"].append(val["loss"])
            self.history["train_dice_scores"].append(tr_dice)
            self.history["val_dice_scores"].append(val["dice"])
            self.history["train_iou_scores"].append(tr_iou)
            self.history["val_iou_scores"].append(val["iou"])

            if self._is_primary:
                print(f"Epoch [{epoch + 1}/{self.num_epochs}]")
                print(f"  Train Loss: {tr_loss:.4f}, Dice: {tr_dice:.4f}, IoU: {tr_iou:.4f}")
                print(f"  Val Loss: {val['loss']:.4f}, Dice: {val['dice']:.4f}, IoU: {val['iou']:.4f}")

            # metrics are replicated scalars, so every process takes the
            # same is_best decision without extra communication
            is_best = val["dice"] > self.best_val_dice
            if is_best:
                self.best_val_dice = val["dice"]
                if self._is_primary:
                    print(f"  Saved best model with validation dice: {self.best_val_dice:.4f}")
            self.best_val_loss = min(self.best_val_loss, val["loss"])

            if (epoch + 1) % self.save_checkpoint_freq == 0 or is_best:
                self.save_checkpoint(state, epoch, is_best)

            if self._is_primary:
                save_loss_plot(
                    self.history["train_losses"], self.history["val_losses"],
                    os.path.join(self.images_dir, "loss_plot.png"),
                )
                save_metrics_plot(
                    self.epochs, self.history["train_dice_scores"], self.history["val_dice_scores"],
                    "Dice", os.path.join(self.images_dir, "dice_plot.png"),
                )
                save_metrics_plot(
                    self.epochs, self.history["train_iou_scores"], self.history["val_iou_scores"],
                    "IoU", os.path.join(self.images_dir, "iou_plot.png"),
                )

            if self.save_k and self._is_primary:
                epoch_dir = os.path.join(self.log_dir, f"epoch_{epoch + 1}")
                self._dump_samples(state, val["best_samples"], os.path.join(epoch_dir, "best_samples"))
                self._dump_samples(state, val["worst_samples"], os.path.join(epoch_dir, "worst_samples"))

        total = time.time() - self.start_time
        h, rem = divmod(total, 3600)
        m, s = divmod(rem, 60)
        if self._is_primary:
            print(f"Training completed in {int(h)}h {int(m)}m {int(s)}s")
            print(f"Best validation dice: {self.best_val_dice:.4f}")
            if os.path.isdir(self.best_model_path):
                print(f"Best model saved to {self.best_model_path}")
            else:  # val dice never exceeded 0.0 — nothing was saved
                print("No best model saved (validation dice never improved)")
        return state
