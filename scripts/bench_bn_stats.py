#!/usr/bin/env python
"""Training BN-stat probe: can a conv3x3 kernel with a stats epilogue
beat XLA's conv + separate mean/mean^2 reduction?

Context (PERF.md round 2): the train-step profile is 64% conv fwd/bwd
(at the emitter ceiling) + 20% `convert_reduce` passes = BatchNorm
train-mode statistics.  Reformulating the stat sums as ones-matmuls was
exactly neutral (XLA canonicalizes back).  The remaining idea is fusing
the stat accumulation INTO the conv kernel so the conv output is never
re-read from HBM for the reduction — which requires the conv to live in
the kernel (round-2 boundary finding), and round 2 measured Pallas
conv3x3 at 0.2-0.92x of XLA's conv emitter per level.  This probe
measures the combined contest directly, fwd-only, at the levels where
the stat traffic lives:

  xla   — one jit: y = conv3x3(x)+b (bf16 out), mean = y.mean(NHW),
          mean2 = (y*y).mean(NHW)  (the trainer's fwd pattern)
  plas  — one Pallas kernel: same conv, y written once, per-tile f32
          partial sums/sumsq written alongside (tiny [grid, C] arrays),
          reduced outside (negligible)

    python scripts/bench_bn_stats.py [--k 8] [--levels down1,down2]
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False

from dfc_sa_unet_tpu.ops.pallas_conv import _conv3x3_acc, _pick_rows
from scripts.bench_int8 import timeit_f, B

LEVELS = [
    ("down1", 224, 3, 64),
    ("down2", 112, 64, 128),
    ("down3", 56, 128, 256),
    ("down4", 28, 256, 512),
]


def _kernel(x_ref, w_ref, b_ref, o_ref, s_ref, q_ref):
    _, rp2, width, cin = x_ref.shape
    r = rp2 - 2
    cout = o_ref.shape[-1]
    xe = x_ref[:].reshape(rp2, width, cin)
    acc = _conv3x3_acc(xe, w_ref, r, width, cin, cout) + b_ref[:]
    o_ref[:] = acc.astype(o_ref.dtype).reshape(1, r, width, cout)
    # stats epilogue: per-tile partial sum / sum-of-squares (f32), so the
    # conv output never makes a second HBM round trip for the reduction
    s_ref[:] = jnp.sum(acc, axis=0).reshape(1, 1, cout)
    q_ref[:] = jnp.sum(acc * acc, axis=0).reshape(1, 1, cout)


@functools.partial(jax.jit, static_argnames=())
def xla_conv_stats(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + b
    yb = y.astype(x.dtype)
    mean = jnp.mean(y, axis=(0, 1, 2))
    mean2 = jnp.mean(y * y, axis=(0, 1, 2))
    return yb, mean, mean2


def make_pallas(h, width, cin, cout, r):
    wp_shape = (3, 3 * cin, cout)

    def fn(x, wp, b):
        bsz = x.shape[0]
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
        grid = (bsz, h // r)
        kwargs = {}
        if _HAS_PLTPU:
            kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
        y, ps, pq = pl.pallas_call(
            _kernel,
            out_shape=[
                jax.ShapeDtypeStruct((bsz, h, width, cout), x.dtype),
                # partial stats flattened to (grid, 1, C) so the block's
                # last-two dims equal the array's (Mosaic tiling rule)
                jax.ShapeDtypeStruct((bsz * (h // r), 1, cout), jnp.float32),
                jax.ShapeDtypeStruct((bsz * (h // r), 1, cout), jnp.float32),
            ],
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (pl.Element(1), pl.Element(r + 2), pl.Element(width), pl.Element(cin)),
                    lambda i, j: (i, j * r, 0, 0),
                ),
                pl.BlockSpec(wp_shape, lambda i, j: (0, 0, 0)),
                pl.BlockSpec((cout,), lambda i, j: (0,)),
            ],
            out_specs=[
                pl.BlockSpec((1, r, width, cout), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, cout), lambda i, j, _g=h // r: (i * _g + j, 0, 0)),
                pl.BlockSpec((1, 1, cout), lambda i, j, _g=h // r: (i * _g + j, 0, 0)),
            ],
            **kwargs,
        )(xp, wp, b)
        n = x.shape[0] * h * width
        return y, jnp.sum(ps, axis=(0, 1)) / n, jnp.sum(pq, axis=(0, 1)) / n

    return jax.jit(fn)


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
        b = jnp.asarray(rng.uniform(-0.1, 0.1, (cout,)), jnp.float32)

        def xla_scalar(x, w, b):
            y, m, m2 = xla_conv_stats(x, w, b)
            return y.astype(jnp.float32).mean() + m.sum() + m2.sum()

        t_x = timeit_f(xla_scalar, (x, w, b), args.k)
        print(f"{name:6s} {h:3d} {cin:4d}->{cout:4d}  xla conv+stats : {t_x*1e3:7.2f} ms",
              flush=True)

        r = _pick_rows(h, h, cin, cout)
        if not r:
            print(f"{name:6s} pallas: no feasible row split", flush=True)
            continue
        pfn = make_pallas(h, h, cin, cout, r)

        def pl_scalar(x, wp, b):
            y, m, m2 = pfn(x, wp, b)
            return y.astype(jnp.float32).mean() + m.sum() + m2.sum()

        wp = w.reshape(3, 3 * cin, cout)
        # correctness spot check before timing
        ym, mm, mm2 = xla_conv_stats(x, w, b)
        yp, mp, mp2 = pfn(x, wp, b)
        np.testing.assert_allclose(np.asarray(mm), np.asarray(mp), rtol=2e-2, atol=2e-2)
        t_p = timeit_f(pl_scalar, (x, wp, b), args.k)
        print(f"{name:6s} {h:3d} {cin:4d}->{cout:4d}  pallas conv+st : {t_p*1e3:7.2f} ms  "
              f"({t_x/t_p:.2f}x xla)", flush=True)


if __name__ == "__main__":
    main()
