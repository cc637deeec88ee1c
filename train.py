#!/usr/bin/env python
"""Training entry point — CLI-compatible with the reference train.py.

    python train.py --config configs/config_dfc-sa-res-block.yaml \
        [--resume CKPT] [--loss {dice,tversky,bce_dice,joint}] [--alpha A]
        [--beta B] [--weight_bce W] [--weight_dice W] [--bce_weight W]
        [--dice_weight W] [--contour_weight W] [--augmentation true|false]
        [--bf16] [--data_parallel]

TPU additions over the reference (train.py:98-136): --bf16 runs the model
in bfloat16 compute with f32 params/loss; --data_parallel shards batches
over all visible devices via a 1-D 'data' mesh (a no-op on one chip).
"""

import argparse
import os

import jax

from dfc_sa_unet_tpu.config import apply_overrides, load_config, merge_parallel_flags
from dfc_sa_unet_tpu.data.loader import DataLoaderFactory
from dfc_sa_unet_tpu.models.factory import ModelFactory
from dfc_sa_unet_tpu.train.trainer import Trainer


def main():
    parser = argparse.ArgumentParser(description="Train segmentation model (TPU-native)")
    parser.add_argument("--config", type=str, required=True, help="Path to config file")
    parser.add_argument("--resume", type=str, help="Checkpoint to resume from")
    parser.add_argument("--loss", type=str, choices=["dice", "tversky", "bce_dice", "joint"])
    parser.add_argument("--alpha", type=float, help="Tversky alpha (FP weight)")
    parser.add_argument("--beta", type=float, help="Tversky beta (FN weight)")
    parser.add_argument("--weight_bce", type=float)
    parser.add_argument("--weight_dice", type=float)
    parser.add_argument("--bce_weight", type=float)
    parser.add_argument("--dice_weight", type=float)
    parser.add_argument("--contour_weight", type=float)
    parser.add_argument(
        "--augmentation", type=lambda x: str(x).lower() == "true", default=None,
        help="Enable/disable data augmentation (true/false)",
    )
    parser.add_argument("--bf16", action="store_true", default=None,
                        help="bfloat16 compute (f32 master params)")
    parser.add_argument("--no_bf16", action="store_false", dest="bf16",
                        help="override a config-enabled training.bf16")
    parser.add_argument(
        "--remat", nargs="?", const="all", default=None, choices=["all", "l12", "deep"],
        help="rematerialize blocks in the backward pass for larger batches: "
             "'all' (every block) or 'l12' (only the four largest-activation "
             "blocks — most of the memory saving at a fraction of the recompute). "
             "Transformer families treat any mode as 'all' (every encoder "
             "block / ResNet unit / decoder block)",
    )
    parser.add_argument("--data_parallel", action="store_true", default=None,
                        help="Shard batches over all devices")
    parser.add_argument("--no_data_parallel", action="store_false", dest="data_parallel",
                        help="override a config-enabled training.data_parallel")
    parser.add_argument("--spatial_parallel", type=int, default=None,
                        help="additionally shard image ROWS over this many devices "
                             "(2-D data x spatial mesh) — trains crops whose "
                             "activations exceed one chip's HBM, exactly (XLA "
                             "inserts conv halo exchanges and cross-device BN "
                             "statistic reductions). Height must be divisible "
                             "by this factor")
    parser.add_argument("--use_pallas", action="store_true",
                        help="fused Pallas attention kernels (DFC pooled attention; "
                             "transformer MHA — the MHA falls back to lax when "
                             "attention dropout is active in training). Default ON "
                             "for bf16 TransUNet training (its attention dropout is "
                             "0, measured +14%% at B=128, training dynamics within "
                             "the float-noise floor — docs/validation/)")
    parser.add_argument("--no_pallas", action="store_true",
                        help="disable the bf16 TransUNet fused-MHA training default")
    parser.add_argument("--multihost", action="store_true", default=None,
                        help="join a multi-process (TPU pod) cluster via "
                             "jax.distributed — each process drives its own "
                             "chips and loads its own shard of every batch; "
                             "auto-detects the cluster on Cloud TPU (or pass "
                             "--coordinator/--num_processes/--process_id)")
    parser.add_argument("--no_multihost", action="store_false", dest="multihost",
                        help="override a config-enabled training.multihost")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="coordinator host:port for explicit clusters")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--exe_cache", type=str, default=None,
                        help="directory for compiled train-step caching (skips the "
                             "~6-15 min first TPU compile on warm starts)")
    parser.add_argument("--grad_accum", type=int, default=None,
                        help="split each batch into N sequential microbatches inside the "
                             "jitted step (one averaged update) — trains batches beyond "
                             "the compiler's memory cap (e.g. 256 = 2x128 on one v5e). "
                             "Note: batch-coupled losses (dice/tversky terms) are computed "
                             "per microbatch and averaged, and BN stats thread through the "
                             "microbatches — both slightly differ from a monolithic batch "
                             "(the SGD update is still one step)")
    parser.add_argument("--grad_accum_exact", action="store_true",
                        help="with --grad_accum: compute the loss (and gradient) over "
                             "the WHOLE virtual batch — monolithic semantics for the "
                             "batch-coupled dice/tversky/joint sums — at the cost of one "
                             "extra forward per microbatch (rematerialized scan). "
                             "YAML: training.grad_accum_exact")
    args = parser.parse_args()

    config = load_config(args.config)
    # training.device ('auto'|'cuda'|'cpu', reference train.py:56-59):
    # 'cpu' forces the CPU backend; 'auto' and accelerator names use the
    # default platform (TPU here — JAX_PLATFORMS still overrides both,
    # and dfc_sa_unet_tpu/__init__ re-honors that env var).
    device_cfg = str(config.get("training", {}).get("device", "auto")).lower()
    if device_cfg == "cpu":
        if os.environ.get("JAX_PLATFORMS"):
            print(f"training.device='cpu' ignored: JAX_PLATFORMS="
                  f"{os.environ['JAX_PLATFORMS']} takes precedence")
        else:
            jax.config.update("jax_platforms", "cpu")
            print("training.device='cpu': forcing the CPU backend")
    if args.grad_accum:
        config["training"]["grad_accum"] = args.grad_accum
    if args.grad_accum_exact:
        config["training"]["grad_accum_exact"] = True
    if args.exe_cache:
        config["training"]["exe_cache_dir"] = args.exe_cache
    apply_overrides(
        config, args.loss, args.alpha, args.beta, args.weight_bce, args.weight_dice,
        args.bce_weight, args.dice_weight, args.contour_weight, args.augmentation,
    )
    # training.data_parallel / spatial_parallel / multihost / bf16 from
    # YAML (CLI flags win) — a config fully describes the run
    merge_parallel_flags(args, config, sections=("training",))

    import jax.numpy as jnp

    from dfc_sa_unet_tpu.parallel import multihost as mh

    if args.multihost or args.coordinator:
        mh.initialize(args.coordinator, args.num_processes, args.process_id)
        if not args.data_parallel and args.spatial_parallel <= 1:
            args.data_parallel = True  # a pod without a mesh is pointless
        if mh.is_primary():
            print(f"Multi-host cluster: {mh.process_count()} processes x "
                  f"{mh.local_device_count()} local devices")

    dtype = jnp.bfloat16 if args.bf16 else None
    devices = jax.devices()
    if mh.is_primary():
        print(f"Devices: {devices}")
    mesh = None
    if args.spatial_parallel > 1:
        if len(devices) % args.spatial_parallel == 0 and len(devices) > 1:
            from dfc_sa_unet_tpu.parallel import serving_mesh

            mesh = serving_mesh(spatial=args.spatial_parallel)
            print(f"2-D training mesh: data={mesh.shape['data']} x "
                  f"spatial={args.spatial_parallel} over {len(devices)} devices")
        else:
            # fall through to data parallelism when requested (always in
            # --multihost runs): every pod process training an independent
            # single-chip copy would be silent N-fold redundant work
            fallback = ("falling back to data parallelism"
                        if args.data_parallel and len(devices) > 1
                        else "running single-chip")
            print(f"(--spatial_parallel {args.spatial_parallel}: needs a multiple "
                  f"of {args.spatial_parallel} devices, have {len(devices)}; "
                  f"{fallback})")
    if mesh is None and args.data_parallel and len(devices) > 1:
        mesh = jax.sharding.Mesh(devices, ("data",))
        print(f"Data-parallel over {len(devices)} devices")

    factory = DataLoaderFactory(config, seed=args.seed)
    shard = mh.shard_for_this_process()
    if shard is not None and mesh is not None:
        n_data = mesh.shape.get("data", 1)
        if n_data % mh.process_count() != 0:
            # e.g. --spatial_parallel 8 on 2 hosts x 4 chips: the batch
            # axis spans fewer groups than there are processes, so a
            # per-process contiguous chunk cannot line up with any
            # process's addressable shards — every process loads full
            # batches instead (the trainer slices/replicates on device)
            if mh.is_primary():
                print(f"(multihost: mesh data axis {n_data} is not divisible "
                      f"by {mh.process_count()} processes; every process "
                      f"loads full batches)")
            shard = None
    if shard is not None and mesh is not None:
        # each process loads only its contiguous chunk of every global
        # batch; chunks must be divisible by this process's share of the
        # mesh's data axis so the assembled array shards evenly
        pad_multiple = mesh.shape.get("data", 1) // mh.process_count()
        train_loader = factory.get_train_loader(
            drop_last=True, shard=shard, shard_pad_multiple=pad_multiple)
        val_loader = factory.get_val_loader(
            shard=shard, shard_pad_multiple=pad_multiple)
    else:
        train_loader = factory.get_train_loader(drop_last=mesh is not None)
        val_loader = factory.get_val_loader()

    # bf16 training default for TransUNet: its attention_dropout_rate is 0.0
    # (reference models/transformer_unet.py:318-342), so the fused Pallas MHA
    # stays active in training (+14% at B=128, PERF.md round 3); the 12-epoch
    # dynamics A/B diverges less than a 1e-7 init perturbation of the lax
    # path itself (docs/validation/fused_mha_*.csv).  ViT-seg trains with
    # attention dropout 0.1 (the kernel would fall back to lax anyway) and
    # keeps the lax default; f32 keeps the bit-parity lax path everywhere.
    use_pallas = args.use_pallas or (
        args.bf16
        and not args.no_pallas
        and config["model"].get("name") in ("TransformerUNet", "TransUNet")
    )
    if use_pallas and not args.use_pallas:
        print("Fused Pallas MHA enabled (bf16 TransUNet training default; "
              "--no_pallas disables)")
    model, pretrained = ModelFactory.get_model_and_variables(
        config, dtype=dtype, remat=args.remat, use_pallas=use_pallas)
    if pretrained is not None:
        print(f"Warm-starting from pretrained weights: {config['model']['pretrained_path']}")
    trainer = Trainer(
        model, train_loader, val_loader, config, mesh=mesh, seed=args.seed, compute_dtype=dtype,
        init_variables=pretrained,
    )
    trainer.train(resume_from=args.resume)


if __name__ == "__main__":
    main()
