#!/usr/bin/env python
"""Dump the TPU-compiled HLO of a serving forward to a file, plus a
summary of every fusion computation's root chain and operand/result
shapes — used to attribute the per-conv elementwise passes seen in the
profiler (PERF.md round 3: add_convert + maximum_convert fusions are
~2/3 of device time at B=128).

    python scripts/dump_hlo.py [--batch 128] [--variant engine_lax] [--out /tmp/hlo.txt]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

SIZE = 224


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--variant", type=str, default="engine_lax")
    p.add_argument("--out", type=str, default="/tmp/hlo_engine.txt")
    args = p.parse_args()

    from dfc_sa_unet_tpu.infer.engine import DFCEngine
    from dfc_sa_unet_tpu.models.factory import create_model

    cfg = {"model": {"name": "DFC-SA-Res-Block", "in_channels": 3, "out_channels": 1,
                     "features": [64, 128, 256, 512], "pool_size": 8}}
    model = create_model(cfg, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16),
                           train=False)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((args.batch, SIZE, SIZE, 3)), jnp.bfloat16
    )

    if args.variant == "module":
        fn = jax.jit(lambda x: model.apply(variables, x, train=False))
    elif args.variant.startswith("int8"):
        from dfc_sa_unet_tpu.infer.quant import Int8DFCEngine

        levels = "auto" if ":" not in args.variant else set(
            args.variant.split(":", 1)[1].split("+"))
        eng = Int8DFCEngine(cfg, variables, dtype=jnp.bfloat16,
                            int8_levels=levels, act_scales="timing")
        fn = jax.jit(eng._build_forward())
    else:
        eng = DFCEngine(cfg, variables, dtype=jnp.bfloat16)
        fn = jax.jit(eng._build_forward())

    print(f"device={jax.devices()[0]} batch={args.batch}", flush=True)
    compiled = fn.lower(x).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else None
    if ca:
        flops = ca.get("flops", 0.0)
        byts = ca.get("bytes accessed", 0.0)
        print(f"cost_analysis: flops={flops/1e12:.2f} TF  bytes={byts/1e9:.2f} GB  "
              f"-> HBM floor {byts/819e9*1e3:.1f} ms, "
              f"compute floor @110TF/s {flops/110e12*1e3:.1f} ms", flush=True)
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {args.out}", flush=True)

    # summary: every fusion computation with its root op chain + shapes
    n_fus = 0
    for m in re.finditer(r"^(%?fused_computation[^\s]*|.*_fusion[^\s]*) \{", txt, re.M):
        n_fus += 1
    counts = {}
    for m in re.finditer(r"= (\S+) fusion\(", txt):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    print(f"fusion result shapes ({sum(counts.values())} fusions):")
    for shape, c in sorted(counts.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {c:3d}x {shape}")
    print(f"convolutions: {len(re.findall(r'convolution', txt))}")


if __name__ == "__main__":
    main()
