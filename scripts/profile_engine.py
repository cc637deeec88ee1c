#!/usr/bin/env python
"""Profile engine variants on the chip and print a per-op-category time
breakdown parsed from the jax.profiler trace (trace.json.gz).

    python scripts/profile_engine.py [--variants engine_lax,engine_conv]
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

from dfc_sa_unet_tpu.data.loader import normalize_on_device
from dfc_sa_unet_tpu.infer.engine import DFCEngine
from dfc_sa_unet_tpu.models.factory import create_model

SIZE = 224


def categorize(name: str) -> str:
    n = name.lower()
    if "while" in n or "scan" in n:
        return "loop-wrapper"  # contains everything else; excluded from total
    if "fused_dfc_tail" in n or "custom-call" in n or "pallas" in n:
        return "pallas"
    if "reshape" in n:
        return "reshape"
    if "copy" in n or "transpose" in n:
        return "copy/relayout"
    if "convolution" in n:
        return "conv"
    if "convert_fusion" in n or "_convert" in n:
        return "epilogue-fusion"
    if "fusion" in n:
        return "fusion"
    if "dot" in n or "einsum" in n:
        return "dot"
    if "concatenate" in n or "pad" in n:
        return "concat/pad"
    return "other"


def analyze(trace_dir: str, label: str, k: int):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        print(f"[{label}] no trace files under {trace_dir}")
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    by_cat = collections.Counter()
    by_name = collections.Counter()
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        # keep device (TensorCore) lanes only: those pid names carry XLA ops
        name = ev.get("name", "")
        args = ev.get("args") or {}
        hlo = args.get("long_name") or args.get("hlo_op") or name
        if not any(key in args for key in ("long_name", "hlo_op", "hlo_module")):
            continue
        cat = categorize(str(name) + " " + str(hlo))
        by_cat[cat] += ev["dur"]
        by_name[name.split(".")[0]] += ev["dur"]
    total = sum(us for cat, us in by_cat.items() if cat != "loop-wrapper")
    print(f"\n[{label}] device op time {total / 1e3 / k:.2f} ms/iter over {k} iters, by category:")
    for cat, us in by_cat.most_common():
        print(f"  {cat:<16} {us / 1e3 / k:8.2f} ms  {100 * us / total:5.1f}%")
    print(f"[{label}] top ops:")
    for name, us in by_name.most_common(14):
        print(f"  {name[:70]:<70} {us / 1e3 / k:8.2f} ms")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variants", type=str, default="engine_lax")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--k", type=int, default=4)
    args = p.parse_args()

    cfg = {"model": {"name": "DFC-SA-Res-Block", "in_channels": 3, "out_channels": 1,
                     "features": [64, 128, 256, 512], "pool_size": 8}}
    model = create_model(cfg, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16),
                           train=False)
    x_u8 = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (args.batch, SIZE, SIZE, 3), dtype=np.uint8)
    )
    print(f"device={jax.devices()[0]} batch={args.batch}")

    for v in args.variants.split(","):
        if v.startswith("int8"):
            from dfc_sa_unet_tpu.infer.quant import Int8DFCEngine

            levels = "auto" if ":" not in v else set(v.split(":", 1)[1].split("+"))
            eng = Int8DFCEngine(cfg, variables, dtype=jnp.bfloat16,
                                int8_levels=levels, act_scales="timing")
        else:
            eng = DFCEngine(cfg, variables, dtype=jnp.bfloat16,
                            pallas_conv_levels="auto" if v == "engine_conv" else None)

        @jax.jit
        def chained(x_u8, eng=eng):
            def body(carry, _):
                x = normalize_on_device(x_u8, jnp.bfloat16) + carry.astype(jnp.bfloat16) * 1e-30
                return eng._build_forward()(x).astype(jnp.float32).mean(), ()

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=args.k)
            return c

        float(chained(x_u8))  # compile outside the trace
        trace_dir = f"/tmp/trace_{v}"
        jax.profiler.start_trace(trace_dir)
        float(chained(x_u8))
        jax.profiler.stop_trace()
        analyze(trace_dir, v, args.k)


if __name__ == "__main__":
    main()
