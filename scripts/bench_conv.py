#!/usr/bin/env python
"""Chip A/B: Pallas fused conv3x3+BN+ReLU vs XLA, per flagship level.

Also times a two-conv chain (XLA->XLA vs Pallas->Pallas) to verify that
Pallas-to-Pallas boundaries stay relayout-free (the round-2 lesson: a
pallas_call CONSUMING an XLA conv output pays a full-map relayout copy;
if the producer is also Pallas the tensors keep default layouts).

    python scripts/bench_conv.py [--batch 128] [--k 8] [--levels all]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.ops.pallas_conv import conv3x3_bn_relu

# (name, H, Cin, Cout) for the flagship's DFC levels at 224
LEVELS = [
    ("down1", 224, 3, 64),
    ("down2", 112, 64, 128),
    ("down3", 56, 128, 256),
    ("down4", 28, 256, 512),
    ("up4", 28, 1024, 512),
    ("up3", 56, 512, 256),
    ("up2", 112, 256, 128),
    ("up1", 224, 128, 64),
]


def xla_conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jnp.maximum(y + b, 0.0).astype(x.dtype)


def timeit(fn, args, k, repeats=3):
    @jax.jit
    def chained(*args):
        def body(carry, _):
            out = fn(args[0] + carry.astype(args[0].dtype) * 1e-30, *args[1:])
            return out.astype(jnp.float32).mean().astype(jnp.float32), ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return c

    float(chained(*args))  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / k


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--chain", action="store_true", help="also run the 2-conv chain test")
    args = p.parse_args()
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0]} batch={args.batch} bf16")
    print(f"{'level':<8}{'H':>5}{'Cin':>6}{'Cout':>6}{'XLA ms':>9}{'Pallas ms':>11}{'speedup':>9}")

    for name, h, cin, cout in LEVELS:
        x = jnp.asarray(rng.standard_normal((args.batch, h, h, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, jnp.float32)
        b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
        t_x = timeit(xla_conv, (x, w, b), args.k)
        t_p = timeit(lambda x, w, b: conv3x3_bn_relu(x, w, b), (x, w, b), args.k)
        print(f"{name:<8}{h:>5}{cin:>6}{cout:>6}{t_x*1e3:>9.2f}{t_p*1e3:>11.2f}{t_x/t_p:>9.2f}x",
              flush=True)

    if args.chain:
        # chain: conv(Cin->C) -> conv(C->C), both formulations
        for name, h, cin, cout in [("down2", 112, 64, 128), ("down3", 56, 128, 256)]:
            x = jnp.asarray(rng.standard_normal((args.batch, h, h, cin)), jnp.bfloat16)
            w1 = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, jnp.float32)
            w2 = jnp.asarray(rng.standard_normal((3, 3, cout, cout)) * 0.05, jnp.float32)
            b1 = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
            b2 = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
            t_x = timeit(lambda x, w1, b1, w2, b2: xla_conv(xla_conv(x, w1, b1), w2, b2),
                         (x, w1, b1, w2, b2), args.k)
            t_p = timeit(lambda x, w1, b1, w2, b2: conv3x3_bn_relu(conv3x3_bn_relu(x, w1, b1), w2, b2),
                         (x, w1, b1, w2, b2), args.k)
            t_m = timeit(lambda x, w1, b1, w2, b2: conv3x3_bn_relu(xla_conv(x, w1, b1), w2, b2),
                         (x, w1, b1, w2, b2), args.k)
            print(f"chain {name}: XLA->XLA {t_x*1e3:.2f} ms, "
                  f"Pallas->Pallas {t_p*1e3:.2f} ms, XLA->Pallas {t_m*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
