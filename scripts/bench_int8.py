#!/usr/bin/env python
"""Int8 serving probe: does the MXU's 2x int8 rate survive XLA's lowering?

The bf16 inference ceiling is ~871 img/s at B=128 (PERF.md: five
formulations tie; XLA's conv emitter sustains ~100 TF/s in-model and the
north star needs ~135).  v5e markets int8 at ~2x the bf16 MXU rate
(394 TOPS vs 197 TF/s), and the north-star gate is end-metric Dice delta
<=1e-3 (BASELINE.json), not bitwise parity — so int8 convs are the one
untried precision lever.  Per the round-2 method: measure the primitive
FIRST, build the engine only if the probe says >=1.5x.

Times, per flagship conv level (B=128, scan-chained timing — see PERF.md
header; block_until_ready lies on this tunnel):
  bf16    — lax.conv_general_dilated bf16xbf16->bf16 (today's path)
  s8      — lax.conv s8xs8 -> preferred s32 (raw MXU int8 question)
  s8+deq  — s8 conv -> s32 -> per-channel scale+bias (f32) -> ReLU ->
            requant to s8 (the realistic per-level serving chain)
Plus 8192^2 matmuls (bf16 vs s8) for the chip's headline int8 rate.

    python scripts/bench_int8.py [--k 8] [--levels down3,up1]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

# (name, H=W, Cin, Cout) at B=128 — the 8 flagship conv3x3 levels
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
B = 128


def timeit_f(fn, args, k, repeats=3):
    """Scan-chained timing for float inputs (carry*1e-30 perturbation)."""
    @jax.jit
    def chained(*args):
        def body(carry, _):
            out = fn(args[0] + carry.astype(args[0].dtype) * 1e-30, *args[1:])
            return out.astype(jnp.float32).mean(), ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return c

    float(chained(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / k


def timeit_i8(fn, args, k, repeats=3):
    """Scan-chained timing for int8 inputs.

    The input perturbation must be runtime-dependent so XLA cannot hoist
    the conv out of the scan; ``carry >> 30`` of the int32 running sum is
    unprovable at compile time (and ~always 0 at runtime).
    """
    @jax.jit
    def chained(*args):
        def body(carry, _):
            x = args[0] + (carry >> 30).astype(args[0].dtype)
            out = fn(x, *args[1:])
            return out.astype(jnp.int32).sum() + carry, ()

        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=k)
        return c

    int(chained(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        int(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / k


def timeit_i8_to_f(fn, args, k, repeats=3):
    """Int8 input, float output (the s8+dequant chain)."""
    @jax.jit
    def chained(*args):
        def body(carry, _):
            x = args[0] + (carry >> 30).astype(args[0].dtype)
            out = fn(x, *args[1:])
            return carry + out.astype(jnp.float32).sum().astype(jnp.int32), ()

        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=k)
        return c

    int(chained(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        int(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / k


def conv_bf16(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_s8(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def conv_s8_chain(x, w, scale, bias):
    """s8 conv -> dequant (per-Cout scale) -> bias -> ReLU -> requant s8."""
    y = conv_s8(x, w).astype(jnp.float32) * scale + bias
    y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y * 4.0), -128, 127).astype(jnp.int8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--levels", type=str, default=None)
    p.add_argument("--skip-matmul", action="store_true")
    args = p.parse_args()
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0]}  jax={jax.__version__}", flush=True)

    if not args.skip_matmul:
        n = 8192
        gflop = 2 * n ** 3 / 1e9
        a16 = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
        b16 = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
        t = timeit_f(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.bfloat16),
                     (a16, b16), args.k)
        print(f"matmul {n}^2 bf16 : {t*1e3:8.2f} ms  {gflop/t/1e3:6.1f} TF/s", flush=True)
        a8 = jnp.asarray(rng.integers(-127, 128, (n, n)), jnp.int8)
        b8 = jnp.asarray(rng.integers(-127, 128, (n, n)), jnp.int8)
        t = timeit_i8(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.int32),
                      (a8, b8), args.k)
        print(f"matmul {n}^2 s8   : {t*1e3:8.2f} ms  {gflop/t/1e3:6.1f} TOP/s", flush=True)

    sel = set(args.levels.split(",")) if args.levels else None
    for name, h, cin, cout in LEVELS:
        if sel and name not in sel:
            continue
        gflop = 2 * B * h * h * 9 * cin * cout / 1e9
        xf = jnp.asarray(rng.standard_normal((B, h, h, cin)), jnp.bfloat16)
        wf = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, jnp.bfloat16)
        t_bf = timeit_f(conv_bf16, (xf, wf), args.k)
        print(f"{name:6s} {h:3d} {cin:4d}->{cout:4d}  bf16   : {t_bf*1e3:7.2f} ms  "
              f"{gflop/t_bf/1e3:6.1f} TF/s", flush=True)

        x8 = jnp.asarray(rng.integers(-127, 128, (B, h, h, cin)), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 128, (3, 3, cin, cout)), jnp.int8)
        try:
            t_s8 = timeit_i8(conv_s8, (x8, w8), args.k)
            print(f"{name:6s} {h:3d} {cin:4d}->{cout:4d}  s8     : {t_s8*1e3:7.2f} ms  "
                  f"{gflop/t_s8/1e3:6.1f} TOP/s  ({t_bf/t_s8:.2f}x bf16)", flush=True)
        except Exception as e:  # noqa: BLE001 — probe: record and continue
            print(f"{name:6s} s8 FAILED: {type(e).__name__}: {e}", flush=True)
            continue

        scale = jnp.asarray(rng.uniform(0.01, 0.02, (cout,)), jnp.float32)
        bias = jnp.asarray(rng.uniform(-0.1, 0.1, (cout,)), jnp.float32)
        try:
            t_ch = timeit_i8(conv_s8_chain, (x8, w8, scale, bias), args.k)
            print(f"{name:6s} {h:3d} {cin:4d}->{cout:4d}  s8+deq : {t_ch*1e3:7.2f} ms  "
                  f"{gflop/t_ch/1e3:6.1f} TOP/s  ({t_bf/t_ch:.2f}x bf16)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:6s} s8+deq FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
