#!/usr/bin/env python
"""Isolate where the Pallas conv kernel loses: MXU ceiling vs tap cost.

Times, at down3-like shapes (B=128, 56x56, Cin=128, Cout=256), bf16:
  xla_matmul   — jnp.einsum [M, K] @ [K, N] (the clean-MXU reference)
  pl_matmul    — same matmul as a Pallas kernel (grid over M)
  pl_conv_cat  — conv3x3 kernel, dx taps lane-concatenated (current impl)
  pl_conv_9dot — conv3x3 kernel, 9 separate K=Cin dots (no lane concat)
  xla_conv     — lax.conv_general_dilated 3x3

    python scripts/bench_mxu.py [--k 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, CIN, COUT = 128, 56, 56, 128, 256
R = 28  # rows per block


def timeit(fn, args, k, repeats=3):
    @jax.jit
    def chained(*args):
        def body(carry, _):
            out = fn(args[0] + carry.astype(args[0].dtype) * 1e-30, *args[1:])
            return out.astype(jnp.float32).mean().astype(jnp.float32), ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return c

    float(chained(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / k


def _mm_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jnp.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@jax.jit
def pl_matmul(x, w):
    m, kk = x.shape
    n = w.shape[-1]
    tile = 2048
    return pl.pallas_call(
        _mm_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=(m // tile,),
        in_specs=[pl.BlockSpec((tile, kk), lambda i: (i, 0)),
                  pl.BlockSpec((kk, n), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((tile, n), lambda i: (i, 0)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(x, w)


def _shift_w(s, dx):
    if dx == 1:
        return s
    z = jnp.zeros_like(s[:, :1])
    if dx == 0:
        return jnp.concatenate([z, s[:, :-1]], axis=1)
    return jnp.concatenate([s[:, 1:], z], axis=1)


def _conv_cat_kernel(x_ref, w_ref, o_ref):
    _, rp2, width, cin = x_ref.shape
    r = rp2 - 2
    cout = o_ref.shape[-1]
    xe = x_ref[:].reshape(rp2, width, cin)
    acc = jnp.zeros((r * width, cout), jnp.float32)
    for dy in range(3):
        s = xe[dy : dy + r]
        taps = jnp.concatenate([_shift_w(s, dx) for dx in range(3)], axis=-1)
        acc += jnp.dot(taps.reshape(r * width, 3 * cin), w_ref[dy],
                       preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype).reshape(1, r, width, cout)


def _conv_9dot_kernel(x_ref, w_ref, o_ref):
    _, rp2, width, cin = x_ref.shape
    r = rp2 - 2
    cout = o_ref.shape[-1]
    xe = x_ref[:].reshape(rp2, width, cin)
    acc = jnp.zeros((r * width, cout), jnp.float32)
    for dy in range(3):
        s = xe[dy : dy + r]
        for dx in range(3):
            acc += jnp.dot(_shift_w(s, dx).reshape(r * width, cin), w_ref[dy * 3 + dx],
                           preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype).reshape(1, r, width, cout)


def _pl_conv(x, w, kernel_fn, w_shape):
    bsz, h, width, cin = x.shape
    cout = w_shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct((bsz, h, width, cout), x.dtype),
        grid=(bsz, h // R),
        in_specs=[
            pl.BlockSpec((pl.Element(1), pl.Element(R + 2), pl.Element(width), pl.Element(cin)),
                         lambda i, j: (i, j * R, 0, 0)),
            pl.BlockSpec(w_shape, lambda i, j: (0,) * len(w_shape)),
        ],
        out_specs=pl.BlockSpec((1, R, width, cout), lambda i, j: (i, j, 0, 0)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(xp, w)


@jax.jit
def pl_conv_cat(x, w):  # w: [3, 3Cin, Cout]
    return _pl_conv(x, w, _conv_cat_kernel, (3, 3 * CIN, COUT))


@jax.jit
def pl_conv_9dot(x, w):  # w: [9, Cin, Cout]
    return _pl_conv(x, w, _conv_9dot_kernel, (9, CIN, COUT))


@jax.jit
def xla_conv(x, w):  # w: [3, 3, Cin, Cout]
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=8)
    args = p.parse_args()
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0]}  B={B} {H}x{W} {CIN}->{COUT} bf16")

    m = B * H * W
    gflop_mm = 2 * m * 3 * CIN * COUT / 1e9
    x2 = jnp.asarray(rng.standard_normal((m, 3 * CIN)), jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((3 * CIN, COUT)), jnp.bfloat16)
    t = timeit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.bfloat16), (x2, w2), args.k)
    print(f"xla_matmul   [{m}x{3*CIN}]@[{3*CIN}x{COUT}]: {t*1e3:7.2f} ms  {gflop_mm/t/1e3:6.1f} TF/s")
    t = timeit(pl_matmul, (x2, w2), args.k)
    print(f"pl_matmul    [{m}x{3*CIN}]@[{3*CIN}x{COUT}]: {t*1e3:7.2f} ms  {gflop_mm/t/1e3:6.1f} TF/s")

    gflop = 2 * m * 9 * CIN * COUT / 1e9
    x = jnp.asarray(rng.standard_normal((B, H, W, CIN)), jnp.bfloat16)
    w4 = jnp.asarray(rng.standard_normal((3, 3, CIN, COUT)) * 0.05, jnp.bfloat16)
    t = timeit(xla_conv, (x, w4), args.k)
    print(f"xla_conv     : {t*1e3:7.2f} ms  {gflop/t/1e3:6.1f} TF/s")
    t = timeit(pl_conv_cat, (x, w4.reshape(3, 3 * CIN, COUT)), args.k)
    print(f"pl_conv_cat  : {t*1e3:7.2f} ms  {gflop/t/1e3:6.1f} TF/s")
    t = timeit(pl_conv_9dot, (x, w4.reshape(9, CIN, COUT)), args.k)
    print(f"pl_conv_9dot : {t*1e3:7.2f} ms  {gflop/t/1e3:6.1f} TF/s")


if __name__ == "__main__":
    main()
