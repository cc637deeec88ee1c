#!/usr/bin/env python
"""Profile the jitted train step on the chip: per-op-category breakdown.

    python scripts/profile_train.py [--batch 128] [--remat l12] [--k 2]
"""

import argparse
import functools
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.losses import compute_loss
from dfc_sa_unet_tpu.models.factory import create_model
from dfc_sa_unet_tpu.train import optim

SIZE = 224


def analyze(trace_dir: str, label: str, k: int):
    import glob
    import gzip
    import json

    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    assert files, trace_dir
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    by_name = Counter()
    total = 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        args = ev.get("args") or {}
        if not any(key in args for key in ("long_name", "hlo_op", "hlo_module")):
            continue
        name = str(ev.get("name", ""))
        if "jit_step" in name or "while" in name:
            continue
        by_name[name.split(".")[0]] += ev["dur"]
        total += ev["dur"]
    print(f"\n[{label}] device op time {total / 1e3 / k:.2f} ms/step over {k} steps; top ops:")
    for name, us in by_name.most_common(20):
        print(f"  {name[:70]:<70} {us / 1e3 / k:8.2f} ms {100 * us / total:5.1f}%")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--remat", type=str, default="l12")
    p.add_argument("--k", type=int, default=2)
    args = p.parse_args()

    cfg = {"model": {"name": "DFC-SA-Res-Block", "in_channels": 3, "out_channels": 1,
                     "features": [64, 128, 256, 512], "pool_size": 8}}
    model = create_model(cfg, dtype=jnp.bfloat16, remat=args.remat)
    tx = optim.sgd_with_clip(0.01, 0.9, 1e-4, clip_norm=1.0)

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (args.batch, SIZE, SIZE, 3)), jnp.bfloat16)
    t = jnp.asarray(np.random.default_rng(1).integers(
        0, 2, (args.batch, SIZE, SIZE, 1)).astype(np.float32))
    variables = model.init(jax.random.key(0), x[:1], train=False)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    opt_state = tx.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, batch_stats, opt_state, x, t):
        def loss_fn(params):
            out, mut = model.apply({"params": params, "batch_stats": batch_stats},
                                   x, train=True, mutable=["batch_stats"])
            probs = jax.nn.sigmoid(out.astype(jnp.float32))
            return compute_loss(probs, t, "bce_dice", {}), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = jax.tree.map(lambda p, u: p + u, params, updates)
        return new_params, new_stats, new_opt, loss

    params, batch_stats, opt_state, _ = step(params, batch_stats, opt_state, x, t)  # compile
    jax.block_until_ready(params)
    trace_dir = "/tmp/trace_train"
    jax.profiler.start_trace(trace_dir)
    for _ in range(args.k):
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state, x, t)
    print("loss", float(loss))  # forces completion inside the trace
    jax.profiler.stop_trace()
    analyze(trace_dir, f"train B={args.batch} remat={args.remat}", args.k)


if __name__ == "__main__":
    main()
