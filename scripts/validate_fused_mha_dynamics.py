#!/usr/bin/env python
"""20-epoch training-dynamics A/B: TransUNet fused Pallas MHA vs lax attention.

Gate for making the fused kernel the bf16 *training* default for TransUNet
(it is already the bf16 serving default): train the SAME model from the SAME
init on the SAME batches with use_pallas=False and use_pallas=True and
compare per-epoch train-loss / val-Dice curves, the same protocol
docs/validation/ used to qualify bf16 itself vs the PyTorch reference
(reference recipe: SGD lr=0.01/momentum=0.9/wd=1e-4, grad-clip 1.0,
bce_dice on sigmoid probs — /root/reference/configs/config_transformer_unet.yaml,
/root/reference/utils/trainer.py:105-170).

TransUNet's attention_dropout_rate is 0.0 (reference
models/transformer_unet.py:318-342), so the fused kernel is active in
training; its custom VJP recomputes the lax math for backward, so any drift
is forward-value float noise only.  MLP/embedding dropout (rate 0.1) uses
identical rng keys on both sides.

    python scripts/validate_fused_mha_dynamics.py [--epochs 20] [--img 224]
        [--batch 8] [--f32] [--out docs/validation/fused_mha_dynamics.csv]

Writes one CSV with both curves and prints the max per-epoch deltas.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LR, MOMENTUM, WD, CLIP = 0.01, 0.9, 1e-4, 1.0


def make_batches(img, n_train, n_val, epochs, seed=7):
    from dfc_sa_unet_tpu.data.synthetic import generate
    from dfc_sa_unet_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
    from PIL import Image
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        root = generate(td, n=n_train + n_val, size=img, seed=seed)
        imgs, masks = [], []
        for f in sorted(os.listdir(os.path.join(root, "original"))):
            a = np.asarray(Image.open(os.path.join(root, "original", f)), np.float32) / 255.0
            m = (np.asarray(Image.open(os.path.join(root, "mask", f)), np.float32) / 255.0 > 0.5)
            imgs.append((a - IMAGENET_MEAN) / IMAGENET_STD)
            masks.append(m.astype(np.float32)[..., None])
    x = np.stack(imgs).astype(np.float32)
    t = np.stack(masks).astype(np.float32)
    orders = np.stack([np.random.default_rng(100 + e).permutation(n_train) for e in range(epochs)])
    return x[:n_train], t[:n_train], x[n_train:], t[n_train:], orders


def _hard_dice(probs, t):
    pb = (probs > 0.5).astype(np.float64)
    inter = (pb * t).sum()
    return 2 * inter / (pb.sum() + t.sum() + 1e-7)


def run(use_pallas, data, img, batch, epochs, f32, perturb=0.0):
    import jax
    import jax.numpy as jnp

    from dfc_sa_unet_tpu.losses import compute_loss
    from dfc_sa_unet_tpu.models.factory import create_model
    from dfc_sa_unet_tpu.train import optim

    x_tr, t_tr, x_va, t_va, orders = data
    cfg = {"model": {"name": "TransUNet", "in_channels": 3, "out_channels": 1},
           "dataset": {"img_size": [img, img]}}
    dtype = jnp.float32 if f32 else jnp.bfloat16
    model = create_model(cfg, dtype=None if f32 else jnp.bfloat16, use_pallas=use_pallas)

    # identical init on both sides: same key, and use_pallas does not change
    # the param structure (only the apply math)
    variables = model.init(jax.random.key(0), jnp.zeros((1, img, img, 3), dtype), train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    if perturb:
        # noise-floor calibration: same math (lax side), init nudged by a
        # relative epsilon — the divergence this produces over E epochs is
        # the chaotic-SGD noise floor any forward-value change (e.g. the
        # fused kernel's accumulation order) is compared against
        params = jax.tree.map(lambda p: p * (1.0 + perturb), params)
    tx = optim.sgd_with_clip(LR, MOMENTUM, WD, clip_norm=CLIP)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, x, t, step_i):
        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(jax.random.key(11), step_i)},
            )
            probs = jax.nn.sigmoid(out.astype(jnp.float32))
            loss = compute_loss(probs, t, "bce_dice", {"weight_bce": 0.5, "weight_dice": 0.5})
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), new_stats, new_opt, loss

    @jax.jit
    def eval_probs(params, batch_stats, x):
        out = model.apply({"params": params, "batch_stats": batch_stats}, x, train=False)
        return jax.nn.sigmoid(out.astype(jnp.float32))

    tag = "fused" if use_pallas else "lax"
    rows, step_i = [], 0
    for e in range(epochs):
        losses = []
        for lo in range(0, len(x_tr) - batch + 1, batch):
            idx = orders[e][lo : lo + batch]
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state,
                jnp.asarray(x_tr[idx], dtype), jnp.asarray(t_tr[idx]), step_i)
            losses.append(float(loss))
            step_i += 1
        dices = []
        for lo in range(0, len(x_va), batch):
            probs = np.asarray(eval_probs(params, batch_stats, jnp.asarray(x_va[lo : lo + batch], dtype)))
            dices.append(_hard_dice(probs, t_va[lo : lo + batch]))
        rows.append((e + 1, float(np.mean(losses)), float(np.mean(dices))))
        print(f"[{tag}] epoch {e + 1}: loss {rows[-1][1]:.4f} val_dice {rows[-1][2]:.4f}", flush=True)
    return np.asarray(rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n_train", type=int, default=64)
    ap.add_argument("--n_val", type=int, default=16)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--side", choices=["both", "lax", "fused"], default="both",
                    help="run one side only (smoke tests; CPU interpret-mode "
                         "Pallas is too slow for the fused side)")
    ap.add_argument("--perturb", type=float, default=0.0,
                    help="noise-floor mode: run the LAX side twice — exact "
                         "init vs init*(1+eps) — to calibrate how far chaotic "
                         "SGD drifts from a forward perturbation of this size")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "validation", "fused_mha_dynamics.csv"))
    args = ap.parse_args()

    data = make_batches(args.img, args.n_train, args.n_val, args.epochs)
    if args.perturb:
        lax_rows = run(False, data, args.img, args.batch, args.epochs, args.f32)
        fused_rows = run(False, data, args.img, args.batch, args.epochs, args.f32,
                         perturb=args.perturb)
    elif args.side != "both":
        rows = run(args.side == "fused", data, args.img, args.batch, args.epochs, args.f32)
        print(f"[{args.side}] final: loss {rows[-1, 1]:.4f} val_dice {rows[-1, 2]:.4f}")
        return
    else:
        lax_rows = run(False, data, args.img, args.batch, args.epochs, args.f32)
        fused_rows = run(True, data, args.img, args.batch, args.epochs, args.f32)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    combined = np.column_stack([lax_rows, fused_rows[:, 1:]])
    b_tag = f"lax_perturbed{args.perturb:g}" if args.perturb else "fused"
    np.savetxt(args.out, combined, delimiter=",",
               header=f"epoch,lax_loss,lax_val_dice,{b_tag}_loss,{b_tag}_val_dice",
               comments="")
    d_loss = np.abs(lax_rows[:, 1] - fused_rows[:, 1]).max()
    d_dice = np.abs(lax_rows[:, 2] - fused_rows[:, 2]).max()
    print(f"max |Δtrain_loss| = {d_loss:.6f}   max |Δval_dice| = {d_dice:.6f}")
    print(f"wrote {args.out}")
    print("GATE " + ("PASS" if d_dice <= 1e-3 else "FAIL") + " (|ΔDice| <= 1e-3)")


if __name__ == "__main__":
    main()
