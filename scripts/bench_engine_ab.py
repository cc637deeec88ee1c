#!/usr/bin/env python
"""End-to-end A/B: DFCEngine with vs without the fused Pallas DFC tail,
plus the plain module path, all in ONE process (one tunnel warm-up).

    python scripts/bench_engine_ab.py [--batch 128] [--k 8] [--variants ...]
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
from dfc_sa_unet_tpu.infer.engine import DFCEngine
from dfc_sa_unet_tpu.models.factory import create_model

SIZE = 224


def time_chained(apply_fn, x_u8, k, repeats, batch):
    @jax.jit
    def chained(x_u8):
        def body(carry, _):
            x = normalize_on_device(x_u8, jnp.bfloat16) + carry.astype(jnp.bfloat16) * 1e-30
            logits = apply_fn(x)
            return logits.astype(jnp.float32).mean(), ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return c

    float(chained(x_u8))  # compile
    best = min(
        (lambda t0: (float(chained(x_u8)), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(repeats)
    )
    return best / k


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--variants", type=str, default="engine_lax,module")
    args = p.parse_args()

    cfg = {"model": {"name": "DFC-SA-Res-Block", "in_channels": 3, "out_channels": 1,
                     "features": [64, 128, 256, 512], "pool_size": 8}}
    model = create_model(cfg, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16),
                           train=False)
    x_u8 = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (args.batch, SIZE, SIZE, 3), dtype=np.uint8)
    )
    print(f"device={jax.devices()[0]} batch={args.batch}")

    fns = {}
    for v in args.variants.split(","):
        if v == "module":
            fns[v] = lambda x: model.apply(variables, x, train=False)
        elif v.startswith("int8"):
            # int8 = auto per-op set; int8:down4+up_conv1 = full ops on a
            # level subset; int8_3x3 = auto minus the down1-3 1x1 extras
            from dfc_sa_unet_tpu.infer.quant import AUTO_INT8_LEVELS, Int8DFCEngine

            if ":" in v:
                levels = set(v.split(":", 1)[1].split("+"))
            elif v == "int8_3x3":
                levels = set(AUTO_INT8_LEVELS)
            else:
                levels = "auto"
            eng = Int8DFCEngine(cfg, variables, dtype=jnp.bfloat16,
                                int8_levels=levels, act_scales="timing")
            fns[v] = (lambda e: (lambda x: e._build_forward()(x)))(eng)
        elif v.startswith("engine_conv"):
            # engine_conv = all supported levels; engine_conv:down2+up_conv1 = subset
            levels = "auto" if ":" not in v else set(v.split(":", 1)[1].split("+"))
            eng = DFCEngine(cfg, variables, dtype=jnp.bfloat16,
                            pallas_conv_levels=levels)
            fns[v] = (lambda e: (lambda x: e._build_forward()(x)))(eng)
        else:  # engine_lax: the plain folded engine
            eng = DFCEngine(cfg, variables, dtype=jnp.bfloat16)
            fns[v] = (lambda e: (lambda x: e._build_forward()(x)))(eng)

    for name, fn in fns.items():
        dt = time_chained(fn, x_u8, args.k, args.repeats, args.batch)
        print(f"{name:<14} {dt * 1e3:8.2f} ms -> {args.batch / dt:7.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
