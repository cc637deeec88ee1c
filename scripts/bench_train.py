#!/usr/bin/env python
"""Training-step throughput on the real chip: batch x remat-mode sweep.

Times the full jitted train step (forward + backward + clip + SGD update
+ BN stats) on synthetic data, scan-chained like bench.py (the tunneled
backend's block_until_ready returns early — CLAUDE.md).

    python scripts/bench_train.py [--batches 64,128,256] [--remat l12]
        [--fp32] [--k 4] [--loss bce_dice]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.losses import compute_loss
from dfc_sa_unet_tpu.models.factory import create_model
from dfc_sa_unet_tpu.train import optim


def build_step(model, tx, loss_type, dtype, accum=1, accum_exact=False):
    def fwd(params, stats, x):
        out, mut = model.apply(
            {"params": params, "batch_stats": stats}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.key(1)},
        )
        return jax.nn.sigmoid(out.astype(jnp.float32)), mut.get("batch_stats", {})

    def loss_fn(params, stats, x, t):
        probs, new_stats = fwd(params, stats, x)
        return compute_loss(probs, t, loss_type, {}), new_stats

    def step(params, batch_stats, opt_state, x, t):
        if accum > 1 and accum_exact:
            # mirror trainer.py grad_accum_exact: loss over the whole
            # virtual batch, rematerialized forward scan
            b = x.shape[0]
            xm = x.reshape(accum, b // accum, *x.shape[1:])

            def virtual_loss(params):
                def body(stats, xi):
                    probs_i, new_stats = fwd(params, stats, xi)
                    return new_stats, probs_i

                new_stats, probs_m = jax.lax.scan(
                    jax.checkpoint(body), batch_stats, xm)
                probs = probs_m.reshape(b, *probs_m.shape[2:])
                return compute_loss(probs, t, loss_type, {}), new_stats

            (loss, new_stats), grads = jax.value_and_grad(
                virtual_loss, has_aux=True)(params)
        elif accum > 1:
            b = x.shape[0]
            xm = x.reshape(accum, b // accum, *x.shape[1:])
            tm = t.reshape(accum, b // accum, *t.shape[1:])

            def micro(carry, xt):
                stats, gacc = carry
                (loss_i, new_stats), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, stats, xt[0], xt[1])
                return (new_stats, jax.tree.map(lambda a, gi: a + gi, gacc, g)), loss_i

            zero = jax.tree.map(jnp.zeros_like, params)
            (new_stats, gsum), losses = jax.lax.scan(micro, (batch_stats, zero), (xm, tm))
            loss = losses.mean()
            grads = jax.tree.map(lambda g: g / accum, gsum)
        else:
            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, x, t)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = jax.tree.map(lambda p, u: p + u, params, updates)
        return new_params, new_stats, new_opt, loss

    return step


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=str, default="128,256")
    p.add_argument("--remat", type=str, default="l12", choices=["none", "l12", "all", "deep"])
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--loss", type=str, default="bce_dice")
    p.add_argument("--accum", type=int, default=1,
                   help="gradient-accumulation microbatches per step")
    p.add_argument("--accum_exact", action="store_true",
                   help="exact virtual-batch loss (trainer grad_accum_exact mirror)")
    p.add_argument("--no_chain", action="store_true",
                   help="time python-side sequential steps instead of an outer lax.scan "
                        "(steps serialize through the param data dependency; use when the "
                        "nested scan+remat graph breaks the remote compile helper)")
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--model", type=str, default="DFC-SA-Res-Block",
                   help="any factory name; transformer families accept --use_pallas")
    p.add_argument("--use_pallas", action="store_true",
                   help="fused Pallas attention in the train step (transformer MHA "
                        "stays fused only when attention dropout is 0 — TransUNet's "
                        "R50-ViT-B/16 config has attention_dropout_rate=0.0)")
    args = p.parse_args()
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    remat = False if args.remat == "none" else args.remat

    if args.model == "DFC-SA-Res-Block":
        cfg = {"model": {"name": args.model, "features": [64, 128, 256, 512],
                         "pool_size": 8, "remat": remat}}
    else:
        cfg = {"model": {"name": args.model, "in_channels": 3, "out_channels": 1},
               "dataset": {"img_size": [args.size, args.size]}}
    model = create_model(cfg, dtype=None if args.fp32 else jnp.bfloat16,
                         use_pallas=args.use_pallas, remat=remat)
    tx = optim.sgd_with_clip(0.01, 0.9, 1e-4, clip_norm=1.0)
    step = build_step(model, tx, args.loss, dtype, accum=args.accum,
                      accum_exact=args.accum_exact)

    s = args.size
    variables = model.init(jax.random.key(0), jnp.zeros((1, s, s, 3), dtype), train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    opt_state = tx.init(params)
    print(f"device={jax.devices()[0]} remat={args.remat} dtype={dtype.__name__} accum={args.accum} exact={args.accum_exact}")

    for b in [int(x) for x in args.batches.split(",")]:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((b, s, s, 3)).astype(np.float32), dtype)
        t = jnp.asarray((rng.random((b, s, s, 1)) > 0.5).astype(np.float32))

        if args.no_chain:
            jstep = jax.jit(step, donate_argnums=(0, 1, 2))
            # donation invalidates inputs -- work on copies so the next
            # batch size in the sweep still has the originals
            p0, s0, o0 = jax.tree.map(jnp.array, (params, batch_stats, opt_state))
            p_, s_, o_, loss = jstep(p0, s0, o0, x, t)  # compile
            float(loss)
            best = float("inf")
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                pp, ss, oo = p_, s_, o_
                for _ in range(args.k):
                    pp, ss, oo, loss = jstep(pp, ss, oo, x, t)
                float(loss)
                best = min(best, (time.perf_counter() - t0) / args.k)
                p_, s_, o_ = pp, ss, oo
            print(f"batch {b:>4}: {best * 1e3:8.1f} ms/step -> {b / best:7.1f} img/s (no-chain)",
                  flush=True)
            continue

        @jax.jit
        def chained(params, batch_stats, opt_state, x, t):
            def body(carry, _):
                params, batch_stats, opt_state = carry
                params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state, x, t)
                return (params, batch_stats, opt_state), loss

            (params, batch_stats, opt_state), losses = jax.lax.scan(
                body, (params, batch_stats, opt_state), None, length=args.k
            )
            return losses[-1]

        try:
            float(chained(params, batch_stats, opt_state, x, t))  # compile
            dt = min(
                (lambda t0: (float(chained(params, batch_stats, opt_state, x, t)),
                             time.perf_counter() - t0)[1])(time.perf_counter())
                for _ in range(args.repeats)
            ) / args.k
            print(f"batch {b:>4}: {dt * 1e3:8.1f} ms/step -> {b / dt:7.1f} img/s", flush=True)
        except Exception as e:  # noqa: BLE001 — remote-compile OOM etc.
            print(f"batch {b:>4}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
