#!/usr/bin/env python
"""Per-level microbenchmark: fused Pallas DFC tail vs the XLA tail.

Both variants compute the identical function from (y3, attn, x):
    local = ReLU(y3 + bc); g = sigmoid(1x1([local‖a]));
    fused = g*local+(1-g)*a; out = ReLU(1x1([fused‖local‖a])) + 1x1(x)

Shapes are the DFC-SA-Res 224x224 levels at batch 128 (PERF.md).  Timing
is scan-chained inside one jit with a scalar fetch (block_until_ready
lies on the tunneled backend — CLAUDE.md).

    python scripts/bench_tail.py [--batch 128] [--k 8] [--fp32] [--levels down2,...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.ops.pallas_dfc_tail import fused_dfc_tail, tail_supported

# name -> (H, C, Cin) at 224x224, features [64,128,256,512]
LEVELS = {
    "down1": (224, 64, 3),
    "down2": (112, 128, 64),
    "down3": (56, 256, 128),
    "down4": (28, 512, 256),
    "bottleneck": (14, 1024, 512),
    "up_conv4": (28, 512, 1024),
    "up_conv3": (56, 256, 512),
    "up_conv2": (112, 128, 256),
    "up_conv1": (224, 64, 128),
}


def xla_tail(y3, a, x, bc, wg, bg, wf, bf, wr):
    """The fast lax.conv formulation (engine._tail_lax + 3x3 epilogue)."""
    c = y3.shape[-1]

    def conv1x1(t, w2d, bias=None):
        y = jax.lax.conv_general_dilated(
            t, w2d[None, None].astype(t.dtype), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=jnp.float32,
        )
        return y if bias is None else y + bias

    local = jnp.maximum(y3.astype(jnp.float32) + bc, 0.0).astype(y3.dtype)
    combined = jnp.concatenate([local, a], axis=-1)
    g = jax.nn.sigmoid(conv1x1(combined, wg, bg).astype(jnp.float32))
    fused = (g * local.astype(jnp.float32) + (1.0 - g) * a.astype(jnp.float32)).astype(y3.dtype)
    o = conv1x1(jnp.concatenate([fused, combined], axis=-1), wf, bf)
    o = jnp.maximum(o.astype(jnp.float32), 0.0)
    o = o + conv1x1(x, wr)
    return o.astype(y3.dtype)


def make_args(h, c, cin, batch, dtype, seed=0):
    rng = np.random.default_rng(seed)
    t = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1, dtype)  # noqa: E731
    f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)  # noqa: E731
    return (t(batch, h, h, c), t(batch, h, h, c), t(batch, h, h, cin),
            f(c), t(2 * c, c), f(c), t(3 * c, c), f(c), t(cin, c))


def time_fn(fn, args, k, repeats=3):
    @jax.jit
    def chained(args):
        def body(carry, _):
            y3 = args[0] + carry.astype(args[0].dtype) * 1e-30
            out = fn(y3, *args[1:])
            return out.astype(jnp.float32).mean(), ()

        cout, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return cout

    float(chained(args))  # compile
    best = min(
        (lambda t0: (float(chained(args)), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(repeats)
    )
    return best / k


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--levels", type=str, default=",".join(LEVELS))
    p.add_argument("--check", action="store_true", help="compare outputs too")
    args = p.parse_args()
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16

    print(f"device={jax.devices()[0]} batch={args.batch} dtype={dtype.__name__}")
    tot_x, tot_p = 0.0, 0.0
    for name in args.levels.split(","):
        h, c, cin = LEVELS[name]
        a = make_args(h, c, cin, args.batch, dtype)
        traffic = args.batch * h * h * (3 * c + cin) * a[0].dtype.itemsize / 1e9  # GB in+out
        dt_x = time_fn(xla_tail, a, args.k)
        line = f"{name:<11} H={h:<4} C={c:<5} Cin={cin:<5} xla {dt_x * 1e3:7.2f} ms ({traffic / dt_x:6.0f} GB/s)"
        tot_x += dt_x
        if tail_supported(args.batch, h, h, c, cin):
            dt_p = time_fn(lambda *t: fused_dfc_tail(*t), a, args.k)
            tot_p += dt_p
            line += f" | pallas {dt_p * 1e3:7.2f} ms ({traffic / dt_p:6.0f} GB/s) | {dt_x / dt_p:4.2f}x"
            if args.check:
                err = float(jnp.max(jnp.abs(
                    fused_dfc_tail(*a).astype(jnp.float32) - xla_tail(*a).astype(jnp.float32))))
                line += f" maxerr={err:.3e}"
        else:
            tot_p += dt_x
            line += " | pallas     n/a (falls back)"
        print(line, flush=True)
    print(f"TOTAL xla {tot_x * 1e3:.2f} ms | pallas-mix {tot_p * 1e3:.2f} ms | {tot_x / tot_p:4.2f}x")


if __name__ == "__main__":
    main()
