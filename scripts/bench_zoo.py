#!/usr/bin/env python
"""Inference throughput for the non-DFC model families (MODEL_ZOO.md).

    python scripts/bench_zoo.py [--batch 128] [--k 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.data.loader import normalize_on_device
from dfc_sa_unet_tpu.models.factory import create_model

SIZE = 224

FAMILIES = [
    ("UNet", {}),
    ("VisionTransformerSegmentation",
     {"img_dim": 224, "patch_dim": 16, "embed_dim": 768, "num_layers": 12, "num_heads": 12,
      "mlp_dim": 3072, "dropout": 0.1, "segmentation_head_upsample_layers": 4}),
    ("TransformerUNet", {}),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--use_pallas", action="store_true",
                   help="fused Pallas MHA in the transformer families")
    p.add_argument("--only", default=None, help="substring filter on family name")
    args = p.parse_args()
    print(f"device={jax.devices()[0]} batch={args.batch} bf16 use_pallas={args.use_pallas}")

    x_u8 = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (args.batch, SIZE, SIZE, 3), dtype=np.uint8))

    for name, extra in FAMILIES:
        if args.only and args.only.lower() not in name.lower():
            continue
        cfg = {"model": {"name": name, "in_channels": 3, "out_channels": 1, **extra}}
        try:
            model = create_model(cfg, dtype=jnp.bfloat16, use_pallas=args.use_pallas)
            variables = model.init(jax.random.key(0),
                                   jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16), train=False)

            @jax.jit
            def chained(variables, x_u8, model=model):
                def body(carry, _):
                    x = normalize_on_device(x_u8, jnp.bfloat16) + carry.astype(jnp.bfloat16) * 1e-30
                    return model.apply(variables, x, train=False).astype(jnp.float32).mean(), ()

                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=args.k)
                return c

            float(chained(variables, x_u8))
            dt = min(
                (lambda t0: (float(chained(variables, x_u8)), time.perf_counter() - t0)[1])(
                    time.perf_counter())
                for _ in range(args.repeats)
            ) / args.k
            print(f"{name:<34} {dt*1e3:8.2f} ms -> {args.batch/dt:7.1f} img/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:<34} FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
