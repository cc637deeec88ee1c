#!/usr/bin/env python
"""HBM roofline for the serving forward: compare XLA's own cost analysis
(bytes accessed / flops of the compiled executable) against the measured
wall time, to decide whether the ~871 img/s ceiling is bandwidth- or
compute-bound in-model.

Context: PERF.md round 3 — isolated int8 convs win 1.1-1.4x but no int8
slice composes to an in-model win; the profiler shows ~2/3 of device
time in elementwise epilogue fusions.  If total HBM traffic / 819 GB/s
(v5e peak) ≈ measured time, the model is at the bandwidth roof and conv
compute wins cannot show up end-to-end.

    python scripts/roofline.py [--batch 128] [--variants module,engine_lax,int8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

SIZE = 224
HBM_GBPS = 819.0   # TPU v5e spec
MXU_TFLOPS_MEAS = 110.0  # measured bf16 ceiling on this chip (PERF.md)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--variants", type=str, default="module,engine_lax,int8:up_conv4+up_conv3")
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
    print(f"device={jax.devices()[0]} batch={args.batch}", flush=True)

    for v in args.variants.split(","):
        if v == "module":
            fn = jax.jit(lambda x: model.apply(variables, x, train=False))
        elif v.startswith("int8"):
            from dfc_sa_unet_tpu.infer.quant import Int8DFCEngine

            levels = "auto" if ":" not in v else set(v.split(":", 1)[1].split("+"))
            eng = Int8DFCEngine(cfg, variables, dtype=jnp.bfloat16,
                                int8_levels=levels, act_scales="timing")
            fn = jax.jit(eng._build_forward())
        else:
            eng = DFCEngine(cfg, variables, dtype=jnp.bfloat16)
            fn = jax.jit(eng._build_forward())

        compiled = fn.lower(x).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if not ca:
            print(f"[{v}] no cost analysis available on this backend")
            continue
        flops = ca.get("flops", 0.0)
        byts = ca.get("bytes accessed", 0.0)
        out_b = ca.get("bytes accessed output", 0.0)
        t_bw_ms = byts / (HBM_GBPS * 1e9) * 1e3
        t_fl_ms = flops / (MXU_TFLOPS_MEAS * 1e12) * 1e3
        print(f"[{v}] flops={flops/1e12:.2f} TF  bytes={byts/1e9:.2f} GB "
              f"(out {out_b/1e9:.2f} GB)")
        print(f"[{v}] roofline: HBM floor {t_bw_ms:.1f} ms | "
              f"compute floor @{MXU_TFLOPS_MEAS:.0f}TF/s {t_fl_ms:.1f} ms | "
              f"arith intensity {flops/max(byts,1):.1f} flop/byte", flush=True)


if __name__ == "__main__":
    main()
