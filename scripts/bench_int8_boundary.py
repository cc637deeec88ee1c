#!/usr/bin/env python
"""Int8 boundary probe: the probe-vs-in-model asymmetry, isolated.

bench_int8.py's `s8+deq` chain measured 1.35-1.41x at the up levels —
but its input was ALREADY s8 (steady-state int8 dataflow).  In the real
engine, activations between blocks are bf16 (attention/gate/bilinear are
precision-critical), so each quantized conv actually runs:

    bf16 x -> quantize(s8) -> conv s8xs8->s32 -> dequant+bias+relu -> bf16

This probe times exactly that chain vs the plain bf16 conv at the same
shapes, settling whether the end-to-end loss (809-866 img/s int8 vs
module, scripts/bench_engine_ab.py) is fully explained by the
quantize/dequant boundary cost.

    python scripts/bench_int8_boundary.py [--k 8] [--levels up3,up1]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from scripts.bench_int8 import timeit_f, B

LEVELS = [
    ("up4", 28, 1024, 512),
    ("up3", 56, 512, 256),
    ("up1", 224, 128, 64),
]


def conv_bf16(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.maximum(y.astype(jnp.float32) + b, 0.0).astype(x.dtype)


def conv_int8_boundary(x, w8, scale, b):
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) * 20.0), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        x8, w8, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return jnp.maximum(y.astype(jnp.float32) * scale + b, 0.0).astype(x.dtype)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--levels", type=str, default=None)
    args = p.parse_args()
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0]}", flush=True)
    sel = set(args.levels.split(",")) if args.levels else None

    for name, h, cin, cout in LEVELS:
        if sel and name not in sel:
            continue
        x = jnp.asarray(rng.standard_normal((B, h, h, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, jnp.bfloat16)
        w8 = jnp.asarray(rng.integers(-127, 128, (3, 3, cin, cout)), jnp.int8)
        scale = jnp.asarray(rng.uniform(0.01, 0.02, (cout,)), jnp.float32)
        b = jnp.asarray(rng.uniform(-0.1, 0.1, (cout,)), jnp.float32)
        t_bf = timeit_f(conv_bf16, (x, w, b), args.k)
        print(f"{name:5s} {h:3d} {cin:4d}->{cout:4d}  bf16 conv          : "
              f"{t_bf*1e3:7.2f} ms", flush=True)
        t_q = timeit_f(conv_int8_boundary, (x, w8, scale, b), args.k)
        print(f"{name:5s} {h:3d} {cin:4d}->{cout:4d}  quant+s8conv+deq   : "
              f"{t_q*1e3:7.2f} ms  ({t_bf/t_q:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
