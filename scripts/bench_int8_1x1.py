#!/usr/bin/env python
"""Int8 probe, part 2: the flagship's 1x1 convs + bottleneck conv3x3.

bench_int8.py showed s8 conv + dequant/requant chains win 1.12-1.41x on
the conv3x3 levels with Cin>=256 and lose below.  The DFC block's other
MXU work is 1x1 convs (attn proj Cin->C, gate 2C->C, fusion 3C->C,
residual Cin->C) — this probe times those shapes (B=128, bf16 vs
s8+deq chain) plus the bottleneck 3x3s to decide which ops the
quantized serving engine should cover.

    python scripts/bench_int8_1x1.py [--k 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from scripts.bench_int8 import timeit_f, timeit_i8, B

# (name, H, Cin, Cout) — 1x1 shapes per level (level: Cin_x -> C):
# attn/residual take Cin_x, gate takes 2C, fusion takes 3C.
SHAPES = []
for lvl, h, cin_x, c in [
    ("down1", 224, 3, 64), ("down2", 112, 64, 128), ("down3", 56, 128, 256),
    ("down4", 28, 256, 512), ("bneck", 14, 512, 1024),
    ("up4", 28, 1024, 512), ("up3", 56, 512, 256), ("up2", 112, 256, 128),
    ("up1", 224, 128, 64),
]:
    SHAPES.append((f"{lvl}.attn", h, cin_x, c))
    SHAPES.append((f"{lvl}.gate", h, 2 * c, c))
    SHAPES.append((f"{lvl}.fuse", h, 3 * c, c))


def conv1_bf16(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((0, 0), (0, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv1_s8_chain(x, w, scale, bias):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((0, 0), (0, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * scale + bias
    y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y * 4.0), -128, 127).astype(jnp.int8)


def conv3_bf16(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv3_s8_chain(x, w, scale, bias):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * scale + bias
    y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y * 4.0), -128, 127).astype(jnp.int8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--only", type=str, default=None,
                   help="comma-separated shape names (e.g. down2.fuse,down3.gate); "
                        "also skips the bottleneck 3x3 unless listed as bneck3x3")
    args = p.parse_args()
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0]}", flush=True)

    only = set(args.only.split(",")) if args.only else None

    # bottleneck conv3x3: 512->1024 at 14x14 (the one level bench_int8 skipped)
    for name, h, cin, cout in [("bneck3x3", 14, 512, 1024)]:
        if only is not None and name not in only:
            continue
        gflop = 2 * B * h * h * 9 * cin * cout / 1e9
        xf = jnp.asarray(rng.standard_normal((B, h, h, cin)), jnp.bfloat16)
        wf = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, jnp.bfloat16)
        t_bf = timeit_f(conv3_bf16, (xf, wf), args.k)
        x8 = jnp.asarray(rng.integers(-127, 128, (B, h, h, cin)), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 128, (3, 3, cin, cout)), jnp.int8)
        scale = jnp.asarray(rng.uniform(0.01, 0.02, (cout,)), jnp.float32)
        bias = jnp.asarray(rng.uniform(-0.1, 0.1, (cout,)), jnp.float32)
        t_s8 = timeit_i8(conv3_s8_chain, (x8, w8, scale, bias), args.k)
        print(f"{name:11s} {h:3d} {cin:4d}->{cout:4d}  bf16 {t_bf*1e3:7.2f} ms "
              f"({gflop/t_bf/1e3:5.1f} TF/s)  s8+deq {t_s8*1e3:7.2f} ms  "
              f"{t_bf/t_s8:.2f}x", flush=True)

    for name, h, cin, cout in SHAPES:
        if only is not None and name not in only:
            continue
        gflop = 2 * B * h * h * cin * cout / 1e9
        if only is None and gflop < 3:  # skip sub-ms shapes (down1/down2 attn etc.)
            continue
        xf = jnp.asarray(rng.standard_normal((B, h, h, cin)), jnp.bfloat16)
        wf = jnp.asarray(rng.standard_normal((1, 1, cin, cout)) * 0.05, jnp.bfloat16)
        t_bf = timeit_f(conv1_bf16, (xf, wf), args.k)
        x8 = jnp.asarray(rng.integers(-127, 128, (B, h, h, cin)), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 128, (1, 1, cin, cout)), jnp.int8)
        scale = jnp.asarray(rng.uniform(0.01, 0.02, (cout,)), jnp.float32)
        bias = jnp.asarray(rng.uniform(-0.1, 0.1, (cout,)), jnp.float32)
        t_s8 = timeit_i8(conv1_s8_chain, (x8, w8, scale, bias), args.k)
        print(f"{name:11s} {h:3d} {cin:4d}->{cout:4d}  bf16 {t_bf*1e3:7.2f} ms "
              f"({gflop/t_bf/1e3:5.1f} TF/s)  s8+deq {t_s8*1e3:7.2f} ms  "
              f"{t_bf/t_s8:.2f}x", flush=True)


if __name__ == "__main__":
    main()
