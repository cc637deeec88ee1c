#!/usr/bin/env python
"""Profile the transformer zoo members (ViT-seg, TransUNet) on the chip:
per-op device-time table from the jax.profiler trace, plus XLA cost
analysis, to locate where their throughput sits vs the compute/HBM roof.

Motivation (PERF.md round 3): ViT-seg measures 1,744 img/s but its
analytic compute floor is ~4,400 (ViT-B encoder 2.2 TF + seg head ~1 TF
per 128-batch at 110 TF/s) — a 2.5x gap, far more headroom than the
flagship's 1.18x.  This locates the gap before any optimization.

    python scripts/profile_zoo.py [--models VisionTransformerSegmentation,TransUNet]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

SIZE = 224


def analyze(trace_dir: str, label: str, k: int):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        print(f"[{label}] no trace files under {trace_dir}")
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    by_name = collections.Counter()
    total = 0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        args = ev.get("args") or {}
        if not any(key in args for key in ("long_name", "hlo_op", "hlo_module")):
            continue
        name = ev.get("name", "")
        if "while" in name.lower() or "scan" in name.lower():
            continue
        by_name[name] += ev["dur"]
        total += ev["dur"]
    print(f"\n[{label}] device op time {total / 1e3 / k:.2f} ms/iter, top individual ops:")
    for name, us in by_name.most_common(30):
        print(f"  {name[:70]:<70} {us / 1e3 / k:8.2f} ms {100*us/total:5.1f}%", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--models", type=str,
                   default="VisionTransformerSegmentation,TransUNet")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--use_pallas", action="store_true")
    args = p.parse_args()

    from dfc_sa_unet_tpu.data.loader import normalize_on_device
    from dfc_sa_unet_tpu.models.factory import create_model

    x_u8 = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (args.batch, SIZE, SIZE, 3), dtype=np.uint8)
    )
    print(f"device={jax.devices()[0]} batch={args.batch}", flush=True)

    for name in args.models.split(","):
        cfg = {"model": {"name": name, "in_channels": 3, "out_channels": 1},
               "dataset": {"img_size": [SIZE, SIZE]}}
        model = create_model(cfg, dtype=jnp.bfloat16, use_pallas=args.use_pallas)
        variables = model.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16),
                               train=False)

        @jax.jit
        def chained(x_u8, variables, model=model):
            def body(carry, _):
                x = normalize_on_device(x_u8, jnp.bfloat16) + carry.astype(jnp.bfloat16) * 1e-30
                return model.apply(variables, x, train=False).astype(jnp.float32).mean(), ()

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=args.k)
            return c

        lowered = chained.lower(x_u8, variables)
        compiled = lowered.compile()
        with open(f"/tmp/hlo_{name}.txt", "w") as f:
            f.write(compiled.as_text())
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else None
        if ca:
            # cost_analysis counts the scan BODY once (verified against the
            # unchained flagship: 8.65 TF = 67.5 GFLOP/img x 128), so these
            # are already per-iteration numbers — do NOT divide by k.
            fl, by = ca.get("flops", 0.0), ca.get("bytes accessed", 0.0)
            print(f"[{name}] cost/iter: {fl/1e12:.2f} TF, {by/1e9:.2f} GB -> floors "
                  f"compute {fl/110e12*1e3:.1f} ms, HBM {by/819e9*1e3:.1f} ms", flush=True)
        float(compiled(x_u8, variables))  # warm up
        trace_dir = f"/tmp/trace_zoo_{name}"
        jax.profiler.start_trace(trace_dir)
        float(compiled(x_u8, variables))
        jax.profiler.stop_trace()
        analyze(trace_dir, name, args.k)


if __name__ == "__main__":
    main()
