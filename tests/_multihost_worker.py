"""One process of an N-process CPU test cluster (see test_multihost.py).

Run as a script, this joins a ``jax.distributed`` cluster of ``nproc``
processes x ``local_devices`` virtual CPU devices each and trains the
shared tiny recipe over the global mesh, with per-process data sharding
(``BatchLoader(shard=...)``).  Imported as a module, :func:`train_once`
runs the IDENTICAL recipe single-process — the test compares the two.

Heavy imports live inside functions so the test process can import this
module without touching jax config; the script path sets the platform
env BEFORE importing jax (the image's sitecustomize pins the TPU tunnel,
so both the env var and the config knob are set — tests/conftest.py).
"""

import argparse
import os
import sys


def _config(train_dir, val_dir, log_dir, epochs=2, batch=8, grad_accum=1):
    return {
        "training": {"num_epochs": epochs, "batch_size": batch,
                     "learning_rate": 0.05, "momentum": 0.9,
                     "weight_decay": 1e-4, "num_workers": 1,
                     "save_checkpoint_freq": 100, "device": "auto",
                     "grad_accum": grad_accum,
                     "loss": {"type": "bce_dice",
                              "params": {"weight_bce": 0.5, "weight_dice": 0.5}}},
        "model": {"name": "MiniNet"},
        "dataset": {"train_dir": train_dir, "val_dir": val_dir,
                    "img_size": [16, 16], "augmentation": False,
                    "cache": False},
        "logging": {"log_dir": log_dir, "images_dir": log_dir + "/images",
                    "save_best_worst_samples": 2},
    }


def _mini_net():
    import flax.linen as nn

    from dfc_sa_unet_tpu.nn.layers import BatchNorm, Conv

    class MiniNet(nn.Module):
        """conv+BN+conv: exercises cross-replica BN statistics, grads and
        the donated TrainState with second-scale CPU compiles."""

        @nn.compact
        def __call__(self, x, train: bool = False):
            x = Conv(features=4, kernel_size=3, padding=1, name="c1")(x)
            x = BatchNorm(name="bn1")(x, train=train)
            x = nn.relu(x)
            return Conv(features=1, kernel_size=1, name="c2")(x)

    return MiniNet()


def _preempting_trainer_cls(preempt_at_step):
    """Trainer that SIGTERMs ITSELF at the Nth stop-check — models an
    asynchronous preemption signal reaching only one pod process; the
    collective _check_stop must still stop every process together."""
    import os
    import signal
    import time

    from dfc_sa_unet_tpu.train.trainer import Trainer

    class PreemptingTrainer(Trainer):
        _stop_checks = 0

        def _check_stop(self):
            type(self)._stop_checks += 1
            if type(self)._stop_checks == preempt_at_step:
                signal.raise_signal(signal.SIGTERM)
                time.sleep(0.2)  # let the handler set the event
            return super()._check_stop()

    return PreemptingTrainer


def train_once(train_dir, val_dir, log_dir, shard=None, pad_multiple=1,
               epochs=2, spatial=1, split_resume=False, preempt_at_step=None,
               grad_accum=1):
    """Train the shared recipe; returns comparable host-side results.

    ``shard=None`` is the single-process reference; ``shard=(pid, nproc)``
    is one member of a cluster (jax.distributed must already be up).
    Uses drop_last=False so the partial train batch (20 % 8 = 4) takes the
    replicate policy and the partial val batch (10 % 8 = 2) takes the
    pad+mask policy — both exactness paths run.  ``spatial>1`` builds the
    2-D ('data', 'spatial') mesh instead of the 1-D data mesh.
    ``split_resume`` trains epoch 1, tears the Trainer down, and resumes
    a fresh one from the checkpoint for the rest — the preemption story;
    in a cluster ``log_dir`` must then be shared by every process (the
    primary writes the checkpoint the others restore).
    """
    import jax
    import numpy as np

    from dfc_sa_unet_tpu.data.loader import DataLoaderFactory
    from dfc_sa_unet_tpu.parallel import data_parallel_mesh, serving_mesh
    from dfc_sa_unet_tpu.train.trainer import Trainer

    cfg = _config(train_dir, val_dir, log_dir, epochs=epochs,
                  grad_accum=grad_accum)
    factory = DataLoaderFactory(cfg, seed=0)
    train_loader = factory.get_train_loader(
        drop_last=False, shard=shard, shard_pad_multiple=pad_multiple)
    val_loader = factory.get_val_loader(
        shard=shard, shard_pad_multiple=pad_multiple)
    mesh = serving_mesh(spatial=spatial) if spatial > 1 else data_parallel_mesh()
    if split_resume:
        from dfc_sa_unet_tpu.parallel import multihost as mh
        from dfc_sa_unet_tpu.utils.checkpoint import latest_epoch_checkpoint

        cfg1 = _config(train_dir, val_dir, log_dir, epochs=1,
                       grad_accum=grad_accum)
        Trainer(_mini_net(), train_loader, val_loader, cfg1,
                mesh=mesh, seed=0).train()
        mh.sync("ckpt_written")  # the primary's checkpoint must exist
        ckpt = latest_epoch_checkpoint(os.path.join(log_dir, "checkpoints"))
        assert ckpt is not None, f"no epoch checkpoint under {log_dir}"
    cls = (Trainer if preempt_at_step is None
           else _preempting_trainer_cls(preempt_at_step))
    trainer = cls(_mini_net(), train_loader, val_loader, cfg,
                  mesh=mesh, seed=0)
    state = trainer.train(resume_from=ckpt if split_resume else None)
    trainer.save_k = len(val_loader.dataset)  # final pass returns ALL samples
    val = trainer.validate_epoch(state)
    records = sorted(val["best_samples"])  # (dice, iou, fname) for every sample
    flat = np.concatenate(
        [np.asarray(l, np.float64).ravel() for l in jax.tree.leaves(state.params)])
    return {
        "params_flat": flat,
        "val_loss": np.float64(val["loss"]),
        "val_dice": np.float64(val["dice"]),
        "record_dice": np.asarray([r[0] for r in records], np.float64),
        "record_names": np.asarray([r[2] for r in records]),
        **{f"hist_{k}": np.asarray(v, np.float64)
           for k, v in trainer.history.items()},
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pid", type=int, required=True)
    p.add_argument("--nproc", type=int, required=True)
    p.add_argument("--port", type=int, required=True)
    p.add_argument("--local_devices", type=int, default=4)
    p.add_argument("--train_dir", required=True)
    p.add_argument("--val_dir", required=True)
    p.add_argument("--log_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--spatial", type=int, default=1)
    p.add_argument("--split_resume", action="store_true")
    p.add_argument("--preempt_at_step", type=int, default=None,
                   help="SIGTERM THIS process at its Nth stop-check "
                        "(async-preemption test: pass to one worker only)")
    p.add_argument("--grad_accum", type=int, default=1)
    args = p.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.local_devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from dfc_sa_unet_tpu.parallel import multihost as mh

    mh.initialize(f"localhost:{args.port}", args.nproc, args.pid)
    assert len(jax.devices()) == args.nproc * args.local_devices, (
        f"cluster formed {len(jax.devices())} devices, expected "
        f"{args.nproc * args.local_devices}")
    # mirror train.py's shard decision: per-process loader chunks only
    # when the mesh's data axis divides evenly across processes; else
    # every process loads full batches (the trainer slices on device)
    n_data = len(jax.devices()) // max(args.spatial, 1)
    if n_data % mh.process_count() == 0:
        shard = mh.shard_for_this_process()
        pad_multiple = n_data // mh.process_count()
    else:
        shard, pad_multiple = None, 1
    results = train_once(args.train_dir, args.val_dir, args.log_dir,
                         shard=shard, pad_multiple=pad_multiple,
                         spatial=args.spatial, split_resume=args.split_resume,
                         preempt_at_step=args.preempt_at_step,
                         grad_accum=args.grad_accum)
    import numpy as np

    if mh.is_primary():
        np.savez(args.out, **results)
    else:
        # the async-preemption test compares every process's final state
        np.savez(args.out.replace(".npz", f".p{args.pid}.npz"), **results)
    mh.sync("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
