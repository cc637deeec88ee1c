#!/usr/bin/env python
"""Chip A/B: per-image vs cross-image-batched sliding-window inference.

N synthetic 512x512 images, tile 224 / overlap 50 (9 tiles per image):
  per-image — predict_sliding per image (each 9-tile chunk padded to the
              batch size; the reference-shaped serving loop)
  stream    — predict_sliding_stream (tiles from consecutive images fill
              shared fixed-size batches)

    python scripts/bench_sliding.py [--n 24] [--batch 128] [--tta]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.infer.predictor import Predictor
from dfc_sa_unet_tpu.models.factory import create_model


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=24)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--tile", type=int, default=224)
    p.add_argument("--overlap", type=int, default=50)
    p.add_argument("--tta", action="store_true")
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    cfg = {"model": {"name": "DFC-SA-Res-Block", "features": [64, 128, 256, 512],
                     "pool_size": 8}}
    model = create_model(cfg, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((1, args.tile, args.tile, 3),
                                                        jnp.bfloat16), train=False)
    pred = Predictor(model, variables, compute_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    images = [rng.integers(0, 256, (args.size, args.size, 3), dtype=np.uint8)
              for _ in range(args.n)]
    print(f"device={jax.devices()[0]} n={args.n} {args.size}px tile={args.tile} "
          f"overlap={args.overlap} batch={args.batch} tta={args.tta}")

    # warm both paths (compile happens once: same [batch, tile, tile, 3] shape)
    pred.predict_sliding(images[0], args.tile, args.overlap, args.batch, tta=args.tta)
    list(pred.predict_sliding_stream(enumerate(images[:2]), args.tile, args.overlap,
                                     args.batch, tta=args.tta))

    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        for img in images:
            pred.predict_sliding(img, args.tile, args.overlap, args.batch, tta=args.tta)
        best = min(best, time.perf_counter() - t0)
    print(f"per-image: {best:6.2f} s -> {args.n / best:6.2f} img/s "
          f"({best / args.n * 1e3:.0f} ms/img)")

    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        for _ in pred.predict_sliding_stream(enumerate(images), args.tile, args.overlap,
                                             args.batch, tta=args.tta):
            pass
        best = min(best, time.perf_counter() - t0)
    print(f"stream   : {best:6.2f} s -> {args.n / best:6.2f} img/s "
          f"({best / args.n * 1e3:.0f} ms/img)")


if __name__ == "__main__":
    main()
