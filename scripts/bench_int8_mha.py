#!/usr/bin/env python
"""Int8 probe for the TRANSFORMER serving path (ViT-seg / TransUNet).

Round 3 closed the DFC int8 line at +2.3% (PERF.md): conv levels only
win below 56 px and boundary quantize passes eat half the win.  The
transformer families are a different regime — their serving time is
MATMULS (ViT-seg runs at 91.5% of the chip's sustained bf16 matmul
ceiling, PERF.md roofline), and this chip measures s8 matmuls at 1.44x
bf16 on 8192^2 (166 TOP/s vs 115 TF/s, scripts/bench_int8.py).  Both
families share the exact ViT-B block: D=768, mlp 3072, 196 tokens at
224 px -> M = B*196 = 25088 rows at B=128.

Per-matmul rows (bf16 vs the realistic s8 serving chain: quantize the
bf16 activation per-tensor -> s8xs8->s32 -> per-out-column f32 scale +
bias [+ GELU for fc1] -> bf16 out):

  qkv   (25088, 768)  x (768, 2304)
  out   (25088, 768)  x (768, 768)
  fc1   (25088, 768)  x (768, 3072) + GELU
  fc2   (25088, 3072) x (3072, 768)

Plus a composite "block linear stack" (qkv -> out -> fc1 -> fc2, the
per-block work minus attention itself, which stays bf16 in the fused
Pallas kernel either way) — the number that decides whether an int8
transformer engine is worth building.  Per the round-2/3 method:
measure first, build only on evidence (>= ~1.2x composite).

    python scripts/bench_int8_mha.py [--k 8] [--batch 128]

Reference model anchor: /root/reference/models/vision_transformer.py
(ViT-B dims), /root/reference/models/trans_unet.py:1-40 (R50-ViT-B/16).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

D, MLP, QKV = 768, 3072, 2304
T = 196  # (224/16)^2 tokens


def timeit_f(fn, args, k, repeats=3):
    """Scan-chained timing (see PERF.md header: block_until_ready lies
    on the tunneled backend; the carry perturbation forces sequential
    dispatch and the final float() fetch bounds completion)."""
    @jax.jit
    def chained(*args):
        def body(carry, _):
            x = args[0] + carry.astype(args[0].dtype) * 1e-30
            out = fn(x, *args[1:])
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


def mm_bf16(x, w, b):
    return jnp.dot(x, w, preferred_element_type=jnp.bfloat16) + b


def mm_bf16_gelu(x, w, b):
    return jax.nn.gelu(mm_bf16(x, w, b))


def _quant(x, scale):
    return jnp.clip(jnp.round(x.astype(jnp.float32) * scale), -127, 127).astype(jnp.int8)


def mm_s8_chain(x, w8, col_scale, b, gelu=False):
    """The realistic serving chain for one linear: per-tensor activation
    quantize (static scale) -> s8 matmul -> s32 -> per-out-column f32
    dequant + bias [+ GELU] -> bf16."""
    x8 = _quant(x, 8.0)
    y = jnp.dot(x8, w8, preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * col_scale + b
    if gelu:
        y = jax.nn.gelu(y)
    return y.astype(jnp.bfloat16)


def mm_s8_to_s8(x8, w8, col_scale, b, gelu=False):
    """s8 in -> s8 out: the epilogue requantizes in-register, so the
    intermediate activation tensor lands in HBM at 1 byte instead of 2
    (the [M, 3072] GELU output is 154 MB in bf16 at B=128)."""
    y = jnp.dot(x8, w8, preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * col_scale + b
    if gelu:
        y = jax.nn.gelu(y)
    return jnp.clip(jnp.round(y * 8.0), -127, 127).astype(jnp.int8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--batch", type=int, default=128)
    args = p.parse_args()
    rng = np.random.default_rng(0)
    M = args.batch * T
    print(f"device={jax.devices()[0]}  jax={jax.__version__}  M={M}", flush=True)

    shapes = [("qkv", D, QKV, False), ("out", D, D, False),
              ("fc1", D, MLP, True), ("fc2", MLP, D, False)]

    weights = {}
    for name, kin, kout, gelu in shapes:
        w16 = jnp.asarray(rng.standard_normal((kin, kout)) * 0.02, jnp.bfloat16)
        w8 = jnp.asarray(rng.integers(-127, 128, (kin, kout)), jnp.int8)
        cs = jnp.asarray(rng.uniform(1e-4, 2e-4, (kout,)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((kout,)) * 0.01, jnp.float32)
        weights[name] = (w16, w8, cs, b)
        x = jnp.asarray(rng.standard_normal((M, kin)), jnp.bfloat16)
        gflop = 2 * M * kin * kout / 1e9

        t16 = timeit_f(
            (lambda x_, w_, b_: mm_bf16_gelu(x_, w_, b_)) if gelu else mm_bf16,
            (x, w16, b.astype(jnp.bfloat16)), args.k)
        t8 = timeit_f(lambda x_, w_, c_, b_, g=gelu: mm_s8_chain(x_, w_, c_, b_, g),
                      (x, w8, cs, b), args.k)
        print(f"{name:4s} ({kin:4d}->{kout:4d}){' +gelu' if gelu else '      '}: "
              f"bf16 {t16*1e3:7.2f} ms ({gflop/t16/1e3:6.1f} TF/s)   "
              f"s8+chain {t8*1e3:7.2f} ms ({gflop/t8/1e3:6.1f} TOP/s)   "
              f"ratio {t16/t8:5.2f}x", flush=True)

    # Composite: the full per-block linear stack (minus attention).
    x0 = jnp.asarray(rng.standard_normal((M, D)), jnp.bfloat16)

    def stack_bf16(x, wq, bq, wo, bo, w1, b1, w2, b2):
        y = mm_bf16(x, wq, bq)[:, :D]          # qkv, keep one head-width slice
        o = mm_bf16(y, wo, bo) + x             # out proj + residual
        h = mm_bf16_gelu(o, w1, b1)            # fc1 + gelu
        return mm_bf16(h, w2, b2) + o          # fc2 + residual

    def stack_s8(x, wq, cq, bq, wo, co, bo, w1, c1, b1, w2, c2, b2):
        y = mm_s8_chain(x, wq, cq, bq)[:, :D]
        o = mm_s8_chain(y, wo, co, bo) + x
        h = mm_s8_chain(o, w1, c1, b1, gelu=True)
        return mm_s8_chain(h, w2, c2, b2) + o

    def stack_s8_noout(x, wq, cq, bq, wo, bo, w1, c1, b1, w2, c2, b2):
        # per-op selection: out_proj stays bf16 (isolated 0.95x loser)
        y = mm_s8_chain(x, wq, cq, bq)[:, :D]
        o = mm_bf16(y, wo, bo) + x
        h = mm_s8_chain(o, w1, c1, b1, gelu=True)
        return mm_s8_chain(h, w2, c2, b2) + o

    def stack_s8_linked(x, wq, cq, bq, wo, co, bo, w1, c1, b1, w2, c2, b2):
        # fc1 requantizes in-epilogue -> the [M, 3072] GELU intermediate
        # lands in HBM as s8 (77 MB instead of 154); fc2 consumes it raw
        y = mm_s8_chain(x, wq, cq, bq)[:, :D]
        o = mm_s8_chain(y, wo, co, bo) + x
        h8 = mm_s8_to_s8(_quant(o, 8.0), w1, c1, b1, gelu=True)
        z = jnp.dot(h8, w2, preferred_element_type=jnp.int32)
        return (z.astype(jnp.float32) * c2 + b2).astype(jnp.bfloat16) + o

    (wq16, wq8, cq, bq) = weights["qkv"]
    (wo16, wo8, co, bo) = weights["out"]
    (w116, w18, c1, b1) = weights["fc1"]
    (w216, w28, c2, b2) = weights["fc2"]
    gflop = 2 * M * (D * QKV + D * D + D * MLP + MLP * D) / 1e9
    t16 = timeit_f(stack_bf16, (x0, wq16, bq.astype(jnp.bfloat16), wo16,
                                bo.astype(jnp.bfloat16), w116,
                                b1.astype(jnp.bfloat16), w216,
                                b2.astype(jnp.bfloat16)), args.k)
    rows = [
        ("s8 all four", stack_s8,
         (x0, wq8, cq, bq, wo8, co, bo, w18, c1, b1, w28, c2, b2)),
        ("s8, out bf16", stack_s8_noout,
         (x0, wq8, cq, bq, wo16, bo.astype(jnp.bfloat16), w18, c1, b1,
          w28, c2, b2)),
        ("s8 linked fc1->fc2", stack_s8_linked,
         (x0, wq8, cq, bq, wo8, co, bo, w18, c1, b1, w28, c2, b2)),
    ]
    print(f"BLOCK bf16 baseline       : {t16*1e3:7.2f} ms ({gflop/t16/1e3:6.1f} TF/s)",
          flush=True)
    for name, fn, fargs in rows:
        t8 = timeit_f(fn, fargs, args.k)
        print(f"BLOCK {name:19s} : {t8*1e3:7.2f} ms ({gflop/t8/1e3:6.1f} TOP/s)  "
              f"ratio {t16/t8:5.2f}x   x12 saving {(t16-t8)*12*1e3:6.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
