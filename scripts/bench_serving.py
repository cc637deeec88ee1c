#!/usr/bin/env python
"""Serving sweep: Predictor.predict_probs throughput across batch sizes,
policy ON (chunk >128 / pad [64,128)) vs the raw native shape.

Timing is *complete* on the tunneled backend because predict_probs
returns np.asarray(probs) — the D2H copy of the full output cannot
finish before the device does.  BUT on the axon tunnel that D2H is a
~14 MB/s network link, so this script measures the LINK, not the chip
(n=128 -> 3,320 ms ~= 43 MB round trip; every size collapses to
32-46 img/s — PERF.md "chunk policy" entry).  Use it on local-attached
TPU; on the tunnel, per-shape chip truth comes from the scan-chained
scalar-fetch method (bench.py / bench_cliff.py) and the policy cost is
the sum of its chunk shapes.  One warmup call per shape pays the
compile.

    python scripts/bench_serving.py [--sizes 1,8,64,96,128,160,200,256]
                                    [--int8] [--repeats 3]
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

SIZE = 224


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=str, default="1,8,32,64,96,128,160,200,256")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--no-native", action="store_true",
                   help="skip the raw native-shape comparison column")
    args = p.parse_args()

    cfg = {"model": {"name": "DFC-SA-Res-Block", "in_channels": 3, "out_channels": 1,
                     "features": [64, 128, 256, 512], "pool_size": 8}}
    model = create_model(cfg, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16),
                           train=False)
    apply_fn = None
    if args.int8:
        from dfc_sa_unet_tpu.infer.quant import Int8DFCEngine

        eng = Int8DFCEngine(cfg, variables, dtype=jnp.bfloat16, act_scales="timing")
        apply_fn = lambda _, x: eng._forward(x)  # noqa: E731
    predictor = Predictor(model, variables, compute_dtype=jnp.bfloat16, apply_fn=apply_fn)
    print(f"device={jax.devices()[0]}  int8={args.int8}", flush=True)

    rng = np.random.default_rng(0)
    for n in [int(s) for s in args.sizes.split(",")]:
        imgs = rng.integers(0, 256, (n, SIZE, SIZE, 3), dtype=np.uint8)

        predictor.predict_probs(imgs)  # warmup/compile (policy path)
        t_pol = min(
            (lambda t0: (predictor.predict_probs(imgs), time.perf_counter() - t0)[1])(
                time.perf_counter())
            for _ in range(args.repeats)
        )
        line = f"n={n:4d}  policy {t_pol*1e3:8.2f} ms  {n/t_pol:7.1f} img/s"

        if not args.no_native:
            xj = jnp.asarray(imgs)
            np.asarray(predictor._forward_u8(predictor.variables, xj))  # warmup
            t_nat = min(
                (lambda t0: (np.asarray(predictor._forward_u8(predictor.variables, xj)),
                             time.perf_counter() - t0)[1])(time.perf_counter())
                for _ in range(args.repeats)
            )
            line += f"   native {t_nat*1e3:8.2f} ms  {n/t_nat:7.1f} img/s  ({t_nat/t_pol:.2f}x)"
        print(line, flush=True)


if __name__ == "__main__":
    main()
