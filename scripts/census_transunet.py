#!/usr/bin/env python
"""TransUNet serving census: accessed-bytes accounting vs the analytic
ideal (the DFC methodology from scripts/speed_of_light.py + the round-3
HLO census), closing VERDICT r3 item 3.

Two parts:

  1. ANALYTIC IDEAL (no chip): for every op of R50-ViT-B/16 TransUNet at
     224x224 — backbone convs, encoder matmuls (fused-MHA attention IO),
     decoder convs, upsamples — the unavoidable HBM bytes (read input
     once, write output once, weights resident) and MXU flops, with
     per-op max(io, compute) floors at the measured chip rates (819
     GB/s HBM, 110 TF/s sustained bf16).
  2. COMPILED CENSUS (--compile, runs on the real TPU backend): lower +
     compile the fused bf16 serving forward, read XLA's cost analysis
     (total bytes accessed / flops), and attribute every fusion's and
     copy's WRITTEN bytes by category: rooted in a convolution/dot
     (compute fusions) vs standalone elementwise fusions vs copies —
     the structural-traffic split that closed the DFC case (88.75 GB
     accessed vs 51.3 GB ideal; the excess was elementwise+copy writes).

    python scripts/census_transunet.py [--batch 128] [--compile]
        [--variant module|engine|int8] [--out /tmp/hlo_tu.txt]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = 819.0
TFLOPS = 110.0
B_DT = 2  # bf16


def ideal_ops(B):
    """(name, io_bytes, flops) per op, ideal fusion, bf16 storage."""
    ops = []

    def conv(name, h_in, h_out, k, cin, cout, b=B_DT):
        io = B * (h_in * h_in * cin + h_out * h_out * cout) * b
        fl = 2 * B * h_out * h_out * k * k * cin * cout
        ops.append((name, io, fl))

    def io_only(name, h_in, cin, h_out, cout, b=B_DT):
        ops.append((name, B * (h_in * h_in * cin + h_out * h_out * cout) * b, 0))

    # ---- ResNetV2 backbone (models/transunet.py:79-156), width 64
    conv("root_7x7s2", 224, 112, 7, 3, 64)
    io_only("root_maxpool", 112, 64, 56, 64)
    # block1: 56px, cmid 64, cout 256; unit1 cin 64 (+proj), units 2-3 cin 256
    conv("b1u1_proj", 56, 56, 1, 64, 256)
    conv("b1u1_c1", 56, 56, 1, 64, 64)
    conv("b1u1_c2", 56, 56, 3, 64, 64)
    conv("b1u1_c3", 56, 56, 1, 64, 256)
    for u in (2, 3):
        conv(f"b1u{u}_c1", 56, 56, 1, 256, 64)
        conv(f"b1u{u}_c2", 56, 56, 3, 64, 64)
        conv(f"b1u{u}_c3", 56, 56, 1, 64, 256)
    # block2: 28px (stride on the 3x3 of unit1), cmid 128, cout 512
    conv("b2u1_proj", 56, 28, 1, 256, 512)
    conv("b2u1_c1", 56, 56, 1, 256, 128)
    conv("b2u1_c2_s2", 56, 28, 3, 128, 128)
    conv("b2u1_c3", 28, 28, 1, 128, 512)
    for u in range(2, 5):
        conv(f"b2u{u}_c1", 28, 28, 1, 512, 128)
        conv(f"b2u{u}_c2", 28, 28, 3, 128, 128)
        conv(f"b2u{u}_c3", 28, 28, 1, 128, 512)
    # block3: 14px, cmid 256, cout 1024
    conv("b3u1_proj", 28, 14, 1, 512, 1024)
    conv("b3u1_c1", 28, 28, 1, 512, 256)
    conv("b3u1_c2_s2", 28, 14, 3, 256, 256)
    conv("b3u1_c3", 14, 14, 1, 256, 1024)
    for u in range(2, 10):
        conv(f"b3u{u}_c1", 14, 14, 1, 1024, 256)
        conv(f"b3u{u}_c2", 14, 14, 3, 256, 256)
        conv(f"b3u{u}_c3", 14, 14, 1, 256, 1024)

    # ---- embeddings + 12 encoder blocks (hidden 768, mlp 3072, n=196)
    conv("patch_embed_1x1", 14, 14, 1, 1024, 768)
    n, E, M = 196, 768, 3072

    def mm(name, cin, cout):
        ops.append((name, B * n * (cin + cout) * B_DT, 2 * B * n * cin * cout))

    for i in range(12):
        mm(f"L{i}_qkv", E, 3 * E)
        # fused MHA: read qkv, write attn-out; flops = scores + AV
        ops.append((f"L{i}_mha", B * n * (3 * E + E) * B_DT, 4 * B * n * n * E))
        mm(f"L{i}_out", E, E)
        mm(f"L{i}_fc1", E, M)
        mm(f"L{i}_fc2", M, E)

    # ---- DecoderCup (models/transunet.py:329-366): channels (256,128,64,16),
    # skips [512@28, 256@56, 64@112, none]
    conv("conv_more", 14, 14, 3, 768, 512)
    dec = [(28, 512, 512, 256), (56, 256, 256, 128), (112, 128, 64, 64),
           (224, 64, 0, 16)]
    for h, cin, skip, cout in dec:
        io_only(f"up_x2_{h}", h // 2, cin, h, cin)
        conv(f"dec{h}_c1", h, h, 3, cin + skip, cout)
        conv(f"dec{h}_c2", h, h, 3, cout, cout)
    conv("head_3x3", 224, 224, 3, 16, 1)
    return ops


def print_ideal(B):
    ops = ideal_ops(B)
    tot_io = sum(o[1] for o in ops)
    tot_fl = sum(o[2] for o in ops)
    t_floor = sum(max(io / (HBM_GBPS * 1e9), fl / (TFLOPS * 1e12)) for _, io, fl in ops)
    print(f"IDEAL (B={B}, bf16, perfect fusion): {tot_io/1e9:.2f} GB IO, "
          f"{tot_fl/1e12:.2f} TF")
    print(f"  pure-HBM floor {tot_io/(HBM_GBPS*1e9)*1e3:.1f} ms, "
          f"pure-compute floor {tot_fl/(TFLOPS*1e12)*1e3:.1f} ms, "
          f"per-op max(io,compute) floor {t_floor*1e3:.1f} ms "
          f"-> ceiling {B/t_floor:.0f} img/s")
    groups = {"backbone": 0.0, "encoder": 0.0, "decoder": 0.0}
    for name, io, fl in ops:
        t = max(io / (HBM_GBPS * 1e9), fl / (TFLOPS * 1e12))
        g = ("encoder" if name.startswith(("L", "patch")) else
             "decoder" if name.startswith(("dec", "up_x2", "conv_more", "head")) else
             "backbone")
        groups[g] += t
    for g, t in groups.items():
        print(f"  {g:<9} floor {t*1e3:6.1f} ms")
    return tot_io, tot_fl


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--compile", action="store_true",
                   help="compile the serving forward on the current backend "
                        "and run the HLO census (slow on the tunnel)")
    p.add_argument("--variant", default="module", choices=["module", "int8"])
    p.add_argument("--no_pallas", action="store_true")
    p.add_argument("--out", default="/tmp/hlo_tu.txt")
    args = p.parse_args()

    print_ideal(args.batch)
    if not args.compile:
        return

    from _hlo_census import print_census

    import numpy as np
    import jax
    import jax.numpy as jnp

    from dfc_sa_unet_tpu.models.factory import create_model

    cfg = {"model": {"name": "TransformerUNet", "in_channels": 3, "out_channels": 1},
           "dataset": {"img_size": [224, 224]}}
    use_pallas = not args.no_pallas
    model = create_model(cfg, dtype=jnp.bfloat16, use_pallas=use_pallas)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.bfloat16),
                           train=False)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (args.batch, 224, 224, 3)), jnp.bfloat16)
    if args.variant == "int8":
        from dfc_sa_unet_tpu.infer.quant_transunet import Int8TransUNetEngine

        eng = Int8TransUNetEngine(cfg, variables, dtype=jnp.bfloat16,
                                  act_scales="timing", use_pallas=use_pallas)
        fn = jax.jit(eng._build_forward())
        lowered = fn.lower(x)
    else:
        # variables must be an ARGUMENT: baked-in as constants the 105M
        # params blow the tunnel's compile-request size limit (HTTP 413)
        fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
        lowered = fn.lower(variables, x)
    print(f"device={jax.devices()[0]} batch={args.batch} variant={args.variant} "
          f"pallas={use_pallas}; compiling...", flush=True)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    flops = ca.get("flops", 0.0)
    byts = ca.get("bytes accessed", 0.0)
    print(f"cost_analysis: flops={flops/1e12:.2f} TF, bytes accessed={byts/1e9:.2f} GB "
          f"-> HBM stream {byts/(HBM_GBPS*1e9)*1e3:.1f} ms, "
          f"compute {flops/(TFLOPS*1e12)*1e3:.1f} ms", flush=True)
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {args.out}")
    print_census(txt)


if __name__ == "__main__":
    main()
