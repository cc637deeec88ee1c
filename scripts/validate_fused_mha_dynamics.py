#!/usr/bin/env python
"""20-epoch training-dynamics A/B: TransUNet fused Pallas MHA vs lax attention.

Gate for flipping the bf16 training default to the fused kernel (NEXT.md
round-4 candidate #1).  TransUNet's attention_dropout_rate is 0.0
(reference models/transformer_unet.py:318-342 config), so the fused MHA
stays active in training; its custom VJP recomputes the lax math, so the
only possible drift is forward-value float noise.  The 3-step f32 test
(tests/test_pallas_attention.py::test_transunet_fused_mha_training_dynamics_match_lax)
proves step-level equality; this script proves END-METRIC equality over a
real 20-epoch bf16+remat run at 224x224 — the mode users actually train in.

Both variants train in ONE process (second compile reuses the tunnel
session), from identical init and identical precomputed batches.

    python scripts/validate_fused_mha_dynamics.py [--epochs 20 --batch 16]

Artifacts: docs/validation/fused_mha_{lax,pallas}.csv + FUSED_MHA_AB.md.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "validation")

LR, MOMENTUM, WD, CLIP = 0.01, 0.9, 1e-4, 1.0


def _hard_dice(probs, t):
    pb = (probs > 0.5).astype(np.float64)
    inter = (pb * t).sum()
    return 2 * inter / (pb.sum() + t.sum() + 1e-7)


def make_data(size, n_train, n_val, seed=11):
    from PIL import Image
    import tempfile

    from dfc_sa_unet_tpu.data.synthetic import generate
    from dfc_sa_unet_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    with tempfile.TemporaryDirectory() as td:
        root = generate(td, n=n_train + n_val, size=size, seed=seed)
        imgs, masks = [], []
        for f in sorted(os.listdir(os.path.join(root, "original"))):
            img = np.asarray(Image.open(os.path.join(root, "original", f)), np.float32) / 255.0
            m = (np.asarray(Image.open(os.path.join(root, "mask", f)), np.float32) / 255.0 > 0.5)
            imgs.append((img - IMAGENET_MEAN) / IMAGENET_STD)
            masks.append(m.astype(np.float32)[..., None])
    x = np.stack(imgs).astype(np.float32)
    t = np.stack(masks).astype(np.float32)
    return x[:n_train], t[:n_train], x[n_train:], t[n_train:]


def run_variant(use_pallas, data, batch, epochs, remat, csv_path):
    import jax
    import jax.numpy as jnp

    from dfc_sa_unet_tpu.losses import compute_loss
    from dfc_sa_unet_tpu.models.factory import create_model
    from dfc_sa_unet_tpu.train import optim

    x_tr, t_tr, x_va, t_va = data
    size = x_tr.shape[1]
    cfg = {"model": {"name": "TransUNet", "in_channels": 3, "out_channels": 1},
           "dataset": {"img_size": [size, size]}}
    model = create_model(cfg, dtype=jnp.bfloat16, use_pallas=use_pallas,
                         remat="all" if remat else False)

    variables = model.init(jax.random.key(0), jnp.zeros((1, size, size, 3), jnp.bfloat16),
                           train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optim.sgd_with_clip(LR, MOMENTUM, WD, clip_norm=CLIP)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, x, t, key):
        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"], rngs={"dropout": key})
            probs = jax.nn.sigmoid(out.astype(jnp.float32))
            loss = compute_loss(probs, t, "bce_dice",
                                {"weight_bce": 0.5, "weight_dice": 0.5})
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), new_stats, new_opt, loss

    @jax.jit
    def eval_probs(params, batch_stats, x):
        out = model.apply({"params": params, "batch_stats": batch_stats}, x, train=False)
        return jax.nn.sigmoid(out.astype(jnp.float32))

    n_train = len(x_tr)
    rows, t0 = [], time.perf_counter()
    step_times = []
    for e in range(epochs):
        order = np.random.default_rng(500 + e).permutation(n_train)
        losses = []
        for lo in range(0, n_train - batch + 1, batch):
            idx = order[lo : lo + batch]
            key = jax.random.key(e * 1000 + lo)  # identical dropout streams both sides
            ts = time.perf_counter()
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state,
                jnp.asarray(x_tr[idx], jnp.bfloat16), jnp.asarray(t_tr[idx]), key)
            losses.append(float(loss))  # D2H sync => wall time is step time
            step_times.append(time.perf_counter() - ts)
        dices = []
        for lo in range(0, len(x_va), batch):
            probs = np.asarray(eval_probs(params, batch_stats,
                                          jnp.asarray(x_va[lo : lo + batch], jnp.bfloat16)))
            dices.append(_hard_dice(probs, t_va[lo : lo + batch]))
        rows.append((e + 1, float(np.mean(losses)), float(np.mean(dices))))
        tag = "pallas" if use_pallas else "lax"
        print(f"[{tag}] epoch {e + 1}: loss {rows[-1][1]:.4f} val_dice {rows[-1][2]:.4f}"
              f" ({time.perf_counter() - t0:.0f}s)", flush=True)
        np.savetxt(csv_path, np.asarray(rows), delimiter=",",
                   header="epoch,train_loss,val_dice", comments="")
    # steady-state step time: median of post-compile steps
    steady = float(np.median(np.asarray(step_times[2:]))) if len(step_times) > 2 else float("nan")
    return rows, steady


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--n_train", type=int, default=64)
    p.add_argument("--n_val", type=int, default=16)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--no_remat", action="store_true")
    args = p.parse_args()

    os.makedirs(OUT, exist_ok=True)
    data = make_data(args.size, args.n_train, args.n_val)
    remat = not args.no_remat

    lax_rows, lax_step = run_variant(
        False, data, args.batch, args.epochs, remat, os.path.join(OUT, "fused_mha_lax.csv"))
    pl_rows, pl_step = run_variant(
        True, data, args.batch, args.epochs, remat, os.path.join(OUT, "fused_mha_pallas.csv"))

    max_dd = max(abs(a[2] - b[2]) for a, b in zip(lax_rows, pl_rows))
    max_dl = max(abs(a[1] - b[1]) for a, b in zip(lax_rows, pl_rows))
    lines = [
        "# Fused-MHA training-dynamics A/B (TransUNet, bf16"
        + (", remat=all" if remat else "") + f", {args.size}px, batch {args.batch})",
        "",
        "Same init (seed 0), same synthetic batches and dropout streams; only the",
        "attention implementation differs (fused Pallas MHA vs lax).  Generated by",
        "scripts/validate_fused_mha_dynamics.py.",
        "",
        "| epoch | lax loss | pallas loss | lax val Dice | pallas val Dice | ΔDice |",
        "|---|---|---|---|---|---|",
    ]
    for a, b in zip(lax_rows, pl_rows):
        lines.append(f"| {a[0]} | {a[1]:.4f} | {b[1]:.4f} | {a[2]:.4f} | {b[2]:.4f}"
                     f" | {abs(a[2] - b[2]):.4f} |")
    lines += [
        "",
        f"Max |ΔDice| over {args.epochs} epochs: **{max_dd:.4f}**;"
        f" max |Δtrain loss|: {max_dl:.4f}.",
        f"Median step time: lax {lax_step * 1e3:.0f} ms, fused {pl_step * 1e3:.0f} ms"
        f" (batch {args.batch}).",
        "",
    ]
    with open(os.path.join(OUT, "FUSED_MHA_AB.md"), "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines[-5:]))


if __name__ == "__main__":
    main()
