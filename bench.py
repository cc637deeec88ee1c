#!/usr/bin/env python
"""Throughput benchmark: DFC-SA-Res inference at 224x224 on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 2000 (the BASELINE.json north-star of >=2,000
224x224 images/sec/chip on TPU v5e; the reference publishes no numbers).

Timing method: K forward passes are chained inside a single jit via
lax.scan with a data dependency between iterations, and the wall clock
includes a scalar device->host fetch.  This is robust to async-dispatch
runtimes where block_until_ready returns before device completion
(observed on tunneled backends).

Flags: --batch N (sweep default), --fp32, --pallas, --k N, --model NAME
"""

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_IMG_PER_SEC = 2000.0


def build_chained(
    model_name: str, dtype, use_pallas: bool, batch: int, k: int, size: int = 224,
    engine: bool = False, int8: bool = False,
):
    from dfc_sa_unet_tpu.models.factory import create_model
    from dfc_sa_unet_tpu.data.loader import normalize_on_device

    cfg = {"model": {"name": model_name, "in_channels": 3, "out_channels": 1,
                     "features": [64, 128, 256, 512], "pool_size": 8},
           "dataset": {"img_size": [size, size]}}
    model = create_model(cfg, dtype=dtype, use_pallas=use_pallas)
    cdtype = dtype or jnp.float32
    x_u8 = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, size=(batch, size, size, 3), dtype=np.uint8)
    )
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, size, size, 3), cdtype), train=False
    )

    if int8:
        # act_scales="timing" keeps the exact serving graph (scales are
        # same-shape baked constants) without the calibration forward's
        # extra tunnel compile; the accuracy gates are pinned separately
        # in tests/test_quant.py and tests/test_quant_vit.py.
        if model_name == "VisionTransformerSegmentation":
            from dfc_sa_unet_tpu.infer.quant_vit import Int8ViTEngine

            # fused Pallas MHA inside the int8 engine mirrors the bf16
            # serving default for the transformer families
            eng = Int8ViTEngine(cfg, variables, dtype=cdtype,
                                act_scales="timing",
                                use_pallas=cdtype == jnp.bfloat16)
        elif model_name in ("TransformerUNet", "TransUNet"):
            from dfc_sa_unet_tpu.infer.quant_transunet import Int8TransUNetEngine

            eng = Int8TransUNetEngine(cfg, variables, dtype=cdtype,
                                      act_scales="timing",
                                      use_pallas=cdtype == jnp.bfloat16)
        else:
            from dfc_sa_unet_tpu.infer.quant import Int8DFCEngine

            eng = Int8DFCEngine(cfg, variables, dtype=cdtype, act_scales="timing")

        def apply_fn(_, x):
            return eng._forward(x)

        variables = {}
    elif engine:
        from dfc_sa_unet_tpu.infer.engine import DFCEngine

        eng = DFCEngine(cfg, variables, dtype=cdtype)

        def apply_fn(_, x):
            return eng._forward(x)

        variables = {}
    else:
        def apply_fn(variables, x):
            return model.apply(variables, x, train=False)

    @jax.jit
    def chained(variables, x_u8):
        def body(carry, _):
            # the tiny carry-dependent perturbation forces sequential execution
            x = normalize_on_device(x_u8, cdtype) + carry.astype(cdtype) * 1e-30
            logits = apply_fn(variables, x)
            return logits.astype(jnp.float32).mean(), ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return c

    return chained, variables, x_u8


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=None, help="fixed batch (default: sweep)")
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--pallas", action="store_true", help="use the Pallas fused attention kernel")
    p.add_argument("--engine", action="store_true",
                   help="use the folded+fused inference engine (DFC-SA only)")
    p.add_argument("--int8", action="store_true",
                   help="use the int8 quantized serving engine "
                        "(DFC-SA / ViT-seg / TransUNet)")
    p.add_argument("--module", action="store_true",
                   help="force the plain module path (no serving engine)")
    p.add_argument("--k", type=int, default=8, help="chained steps per timing call")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--model", type=str, default="DFC-SA-Res-Block")
    args = p.parse_args()

    dtype = None if args.fp32 else jnp.bfloat16
    # Default serving path: the int8-composed engine (the <=56 px levels
    # down4+bottleneck+up_conv4+up_conv3 in s8) — the fastest
    # gate-passing config measured on v5e (890.6 vs 870.7 img/s, PERF.md
    # round 3).  Falls back to the plain module path if the quantized
    # engine fails (non-flagship --model, etc.).
    use_int8 = args.int8 or not (
        args.module or args.engine or args.fp32 or args.pallas
        or args.model != "DFC-SA-Res-Block"
    )
    # batch 128 is the measured sweet spot on v5e (64/96/160/192 fall to
    # ~40% of its throughput — XLA picks a slower conv strategy; 256 ties)
    batches = [args.batch] if args.batch else [128]
    best_ips, best_batch = 0.0, 0
    for b in batches:
        try:
            dt = None
            while True:  # at most two passes: int8-composed, then module fallback
                try:
                    fn, variables, x = build_chained(
                        args.model, dtype, args.pallas, b, args.k, engine=args.engine,
                        int8=use_int8,
                    )
                    float(fn(variables, x))  # compile + first run
                except Exception as e:
                    # the default int8 path must never zero the headline —
                    # fall back to the plain module path on ANY failure
                    # (build, compile, or first run), unless int8 was forced
                    if not use_int8 or args.int8:
                        raise
                    print(f"# int8 engine failed ({type(e).__name__}: {e}); "
                          "falling back to module path", file=sys.stderr)
                    use_int8 = False
                    continue
                break
            dt = min(
                (lambda t0: (float(fn(variables, x)), time.perf_counter() - t0)[1])(time.perf_counter())
                for _ in range(args.repeats)
            ) / args.k
        except Exception as e:  # OOM etc.
            print(f"# batch {b} failed: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        ips = b / dt
        print(f"# batch {b}: {dt * 1e3:.2f} ms/step -> {ips:.1f} img/s", file=sys.stderr)
        if ips > best_ips:
            best_ips, best_batch = ips, b

    print(json.dumps({
        "metric": f"{args.model} 224x224 inference images/sec/chip"
                  + (" (bf16)" if dtype else " (f32)")
                  + (" (pallas)" if args.pallas else "")
                  + (" (engine)" if args.engine else "")
                  + (" (int8-composed engine)" if use_int8 else ""),
        "value": round(best_ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(best_ips / BASELINE_IMG_PER_SEC, 4),
        "batch": best_batch,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
