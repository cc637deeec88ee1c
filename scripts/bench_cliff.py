#!/usr/bin/env python
"""Batch-shape cliff experiments (PERF.md: B=64/96/160/192 run at ~40% of
B=128/256; profiler shows 7x more relayout copies per image at B=64).

Variants, timed scan-chained on the real chip:
  base      — model.apply at the given batch
  pad128    — pad the batch to 128, forward, count only the real images
              (the serving mitigation if the cliff is a compiler behavior)
  barrier   — lax.optimization_barrier between U-Net stages to pin values
              and stop cross-block layout propagation choices
  pinned    — jax.experimental.layout.with_layout_constraint (row-major
              major_to_minor) on every block output: forces one
              consistent layout at block boundaries

    python scripts/bench_cliff.py [--batches 64,96,128] [--variants base,pad128,barrier]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.models.factory import create_model
from dfc_sa_unet_tpu.data.loader import normalize_on_device

SIZE = 224


def build_model(mode: str):
    cfg = {"model": {"name": "DFC-SA-Res-Block", "features": [64, 128, 256, 512],
                     "pool_size": 8}}
    model = create_model(cfg, dtype=jnp.bfloat16)
    if mode == "base":
        return model

    # monkey-layer: wrap unet block outputs in optimization_barrier by
    # patching the module call path via interceptors
    from flax.linen import intercept_methods

    if mode == "pinned":
        from jax.experimental import layout as jlayout

        def constrain(t):
            lo = jlayout.Layout(tuple(range(t.ndim - 1, -1, -1)))
            return jlayout.with_layout_constraint(t, lo)
    else:
        constrain = jax.lax.optimization_barrier

    def interceptor(next_fn, args, kwargs, context):
        out = next_fn(*args, **kwargs)
        name = getattr(context.module, "name", "") or ""
        if name.startswith(("down", "up_conv", "bottleneck")) and hasattr(out, "dtype"):
            out = constrain(out)
        return out

    class Wrapped:
        def init(self, *a, **k):
            with intercept_methods(interceptor):
                return model.init(*a, **k)

        def apply(self, *a, **k):
            with intercept_methods(interceptor):
                return model.apply(*a, **k)

    return Wrapped()


def time_forward(model, variables, batch, k=8, repeats=3, pad_to=None):
    x_u8 = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (batch, SIZE, SIZE, 3), dtype=np.uint8)
    )

    @jax.jit
    def chained(variables, x_u8):
        def body(carry, _):
            x = normalize_on_device(x_u8, jnp.bfloat16) + carry.astype(jnp.bfloat16) * 1e-30
            if pad_to and pad_to > batch:
                x = jnp.concatenate(
                    [x, jnp.zeros((pad_to - batch, SIZE, SIZE, 3), x.dtype)], axis=0
                )
            logits = model.apply(variables, x, train=False)
            return logits[:batch].astype(jnp.float32).mean(), ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return c

    float(chained(variables, x_u8))
    best = min(
        (lambda t0: (float(chained(variables, x_u8)), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(repeats)
    )
    return best / k


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=str, default="64,96,128")
    p.add_argument("--variants", type=str, default="base,pad128,barrier")
    p.add_argument("--k", type=int, default=8)
    args = p.parse_args()
    variants = args.variants.split(",")

    plain = build_model("base")
    variables = plain.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16),
                           train=False)
    print(f"device={jax.devices()[0]}")
    for b in [int(x) for x in args.batches.split(",")]:
        for v in variants:
            if v == "pad128" and b >= 128:
                continue
            model = build_model(v if v in ("barrier", "pinned") else "base")
            try:
                dt = time_forward(model, variables, b, k=args.k,
                                  pad_to=128 if v == "pad128" else None)
                print(f"B={b:<4} {v:<8} {dt * 1e3:8.2f} ms -> {b / dt:7.1f} img/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"B={b:<4} {v:<8} FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
