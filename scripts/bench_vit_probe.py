#!/usr/bin/env python
"""Probe: are ViT-seg's projection matmuls running at the slow TPU dot
emitter rate, and does reformulating them as 1x1 convs over the 14x14
token grid recover the conv emitter's speed?

Context (PERF.md round 3): ViT-seg profiles at 69.6 ms/iter at B=128 vs
a 12.4 ms compute floor (1.37 TF @ 110 TF/s) — 5.6x off the roof, 89%
in dot-rooted fusions.  Round 2 measured XLA dots at ~20 TF/s at model
shapes where the conv emitter streams 50-110 TF/s; 1.37 TF / 20 TF/s =
68 ms — exactly the measured time.  The DFC engine already uses
lax.conv for its 1x1s for this reason (engine.py).

Per-op A/B at the real ViT-B shapes (B=128, 196 tokens, E=768):

  dot     y = einsum('bne,ef->bnf', x[128,196,768], w)   (the model's op)
  conv    y = conv1x1(x[128,14,14,768], w[1,1,E,F])      (same math)

    python scripts/bench_vit_probe.py [--k 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from scripts.bench_int8 import timeit_f

B, N, GRID = 128, 196, 14

SHAPES = [
    ("qkv_proj", 768, 2304),
    ("out_proj", 768, 768),
    ("mlp_in", 768, 3072),
    ("mlp_out", 3072, 768),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=8)
    args = p.parse_args()
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0]} B={B} N={N}", flush=True)

    for name, e, f in SHAPES:
        x = jnp.asarray(rng.standard_normal((B, N, e)), jnp.bfloat16)
        xg = x.reshape(B, GRID, GRID, e)
        w = jnp.asarray(rng.standard_normal((e, f)) * 0.02, jnp.bfloat16)
        wc = w.reshape(1, 1, e, f)
        flops = 2 * B * N * e * f

        def dot_fn(x, w):
            y = jnp.einsum("bne,ef->bnf", x, w, preferred_element_type=jnp.bfloat16)
            return y.astype(jnp.float32).mean()

        def conv_fn(xg, wc):
            y = jax.lax.conv_general_dilated(
                xg, wc, (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16,
            )
            return y.astype(jnp.float32).mean()

        t_d = timeit_f(dot_fn, (x, w), args.k)
        t_c = timeit_f(conv_fn, (xg, wc), args.k)
        print(f"{name:9s} {e:4d}->{f:4d}: dot {t_d*1e3:7.3f} ms ({flops/t_d/1e12:5.1f} TF/s)"
              f" | conv1x1 {t_c*1e3:7.3f} ms ({flops/t_c/1e12:5.1f} TF/s)"
              f" | conv/dot {t_d/t_c:.2f}x", flush=True)

    # the attention core at ViT-B shapes: scores + softmax + AV
    nh, hd = 12, 64
    q = jnp.asarray(rng.standard_normal((B, nh, N, hd)), jnp.bfloat16)
    k_ = jnp.asarray(rng.standard_normal((B, nh, N, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, nh, N, hd)), jnp.bfloat16)

    def attn_fn(q, k, v):
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
        a = jax.nn.softmax(s / np.sqrt(hd), axis=-1).astype(q.dtype)
        o = jnp.einsum("bhnm,bhmd->bhnd", a, v, preferred_element_type=jnp.bfloat16)
        return o.astype(jnp.float32).mean()

    t_a = timeit_f(attn_fn, (q, k_, v), args.k)
    fl_a = 2 * B * nh * N * N * hd * 2
    print(f"attention core (scores+softmax+AV): {t_a*1e3:7.3f} ms "
          f"({fl_a/t_a/1e12:5.1f} TF/s equiv)", flush=True)

    # head split/merge transposes
    xq = jnp.asarray(rng.standard_normal((B, N, 768)), jnp.bfloat16)

    def heads_fn(x):
        y = x.reshape(B, N, nh, hd).transpose(0, 2, 1, 3)
        return y.astype(jnp.float32).mean()

    t_h = timeit_f(heads_fn, (xq,), args.k)
    print(f"head-split transpose [B,N,E]->[B,h,N,d]: {t_h*1e3:7.3f} ms", flush=True)

    # fused Pallas MHA (packed qkv -> merged heads, scores VMEM-resident)
    # vs the full lax chain it replaces (split + head transposes + scores +
    # softmax + AV + merge transpose)
    from dfc_sa_unet_tpu.ops.pallas_attention import fused_mha, _mha_reference

    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * 768)), jnp.bfloat16)

    def lax_chain(t):
        return _mha_reference(t, nh).astype(jnp.float32).mean()

    def pallas_chain(t):
        return fused_mha(t, nh).astype(jnp.float32).mean()

    t_l = timeit_f(lax_chain, (qkv,), args.k)
    t_p = timeit_f(pallas_chain, (qkv,), args.k)
    print(f"MHA qkv->out  lax {t_l*1e3:7.3f} ms | pallas fused {t_p*1e3:7.3f} ms "
          f"| lax/pallas {t_l/t_p:.2f}x", flush=True)

    # int8 projection GEMMs: the realistic serving chain at each shape —
    # quantize bf16 activations -> s8xs8 dot (s32 accum) -> per-channel
    # dequant + bias in f32 -> bf16 out — vs the plain bf16 dot.  8192^2
    # measured 1.44x (PERF.md round 3); does it survive at [25088, E] x
    # [E, F] with the boundary passes included?
    for name, e, f in SHAPES:
        xb = jnp.asarray(rng.standard_normal((B, N, e)), jnp.bfloat16)
        w8 = jnp.asarray(rng.integers(-127, 128, (e, f)), jnp.int8)
        wscale = jnp.asarray(rng.uniform(1e-3, 2e-3, (f,)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((f,)), jnp.float32)
        flops = 2 * B * N * e * f

        def s8_chain(x, w8=w8, wscale=wscale, bias=bias):
            x8 = jnp.clip(jnp.round(x.astype(jnp.float32) * 127.0), -127, 127
                          ).astype(jnp.int8)
            y = jax.lax.dot_general(
                x8.reshape(-1, x.shape[-1]), w8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = y.astype(jnp.float32) * (wscale / 127.0) + bias
            return y.astype(jnp.float32).mean()

        t8 = timeit_f(s8_chain, (xb,), args.k)
        td = timeit_f(
            lambda x, w=jnp.asarray(np.asarray(w8, np.float32) * 1e-3, jnp.bfloat16):
            (jnp.einsum("bne,ef->bnf", x, w, preferred_element_type=jnp.float32)
             + bias).astype(jnp.float32).mean(),
            (xb,), args.k)
        print(f"{name:9s} {e:4d}->{f:4d}: bf16+bias {td*1e3:7.3f} ms ({flops/td/1e12:5.1f} TF/s)"
              f" | q+s8dot+deq {t8*1e3:7.3f} ms ({flops/t8/1e12:5.1f} TOP/s)"
              f" | bf16/s8 {td/t8:.2f}x", flush=True)


if __name__ == "__main__":
    main()
