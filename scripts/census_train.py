#!/usr/bin/env python
"""Training-step census for the flagship: where the bytes of the full
train step (forward + backward + clip + SGD + BN stats) go.

Round-4 follow-through of the serving census methodology
(scripts/_hlo_census.py): compile the REAL Trainer._train_step on the
TPU backend at the production recipe (bf16, B=128, remat mode of
choice), read XLA's cost analysis, and attribute written bytes by
instruction category.  The 185 img/s training disposition (PERF.md)
rests on "conv fwd/bwd at the emitter ceiling is 64% of the step";
this script puts numbers on the other 36%.

    python scripts/census_train.py [--batch 128] [--remat l12]
        [--fp32] [--out /tmp/hlo_train.txt]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = 819.0
TFLOPS = 110.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--remat", default="l12", choices=["none", "l12", "all", "deep"])
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--out", default="/tmp/hlo_train.txt")
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from _hlo_census import print_census, top_shapes
    from dfc_sa_unet_tpu.models.factory import create_model
    from dfc_sa_unet_tpu.train.trainer import Trainer

    dtype = None if args.fp32 else jnp.bfloat16
    cfg = {
        "training": {"num_epochs": 1, "batch_size": args.batch,
                     "learning_rate": 0.01, "momentum": 0.9,
                     "weight_decay": 1e-4, "num_workers": 1,
                     "save_checkpoint_freq": 1000, "device": "auto",
                     "loss": {"type": "bce_dice",
                              "params": {"bce_weight": 0.5, "dice_weight": 0.5}}},
        "model": {"name": "DFC-SA-Res-Block", "in_channels": 3, "out_channels": 1,
                  "features": [64, 128, 256, 512], "pool_size": 8,
                  "remat": False if args.remat == "none" else args.remat},
        "dataset": {"train_dir": "", "val_dir": "", "img_size": [args.size, args.size],
                    "augmentation": False},
        "logging": {"log_dir": "/tmp/census_train", "images_dir": "/tmp/census_train/img",
                    "save_best_worst_samples": 0},
    }
    model = create_model(cfg, dtype=dtype,
                         remat=False if args.remat == "none" else args.remat)
    trainer = Trainer(model, None, None, cfg, compute_dtype=dtype)
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.integers(0, 256, (args.batch, args.size, args.size, 3), dtype=np.uint8),
        "mask": rng.integers(0, 256, (args.batch, args.size, args.size), dtype=np.uint8),
    }
    state = trainer.init_state(batch)
    imgs = jnp.asarray(batch["image"])
    masks = jnp.asarray(batch["mask"])
    print(f"device={jax.devices()[0]} batch={args.batch} remat={args.remat} "
          f"dtype={'f32' if args.fp32 else 'bf16'}; compiling train step...",
          flush=True)
    lowered = trainer._train_step_jit.lower(state, imgs, masks)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    flops = ca.get("flops", 0.0)
    byts = ca.get("bytes accessed", 0.0)
    print(f"cost_analysis: flops={flops/1e12:.2f} TF, bytes accessed={byts/1e9:.2f} GB"
          f" -> HBM stream {byts/(HBM_GBPS*1e9)*1e3:.1f} ms,"
          f" compute {flops/(TFLOPS*1e12)*1e3:.1f} ms", flush=True)
    ma = compiled.memory_analysis()
    if ma is not None:
        print(f"memory: temp {ma.temp_size_in_bytes/2**30:.2f} GiB, "
              f"args {ma.argument_size_in_bytes/2**30:.2f} GiB", flush=True)
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {args.out}")
    print_census(txt)
    print("top copy shapes:")
    for cnt, shape, b in top_shapes(txt, r"copy\(", 8):
        print(f"  {cnt:3d}x {shape[:70]:<72} {b/1e9:6.2f} GB")


if __name__ == "__main__":
    main()
