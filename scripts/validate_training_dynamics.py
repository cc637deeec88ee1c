#!/usr/bin/env python
"""Multi-epoch training-dynamics validation vs the PyTorch reference.

Trains the SAME model (identical converted initial weights) on the SAME
precomputed batches with the reference recipe (SGD lr/momentum/wd,
grad-clip 1.0, sigmoid->bce_dice loss — configs/config_dfc-sa-res-block
.yaml + utils/trainer.py:105-170) in torch and in this framework, and
records per-epoch train loss + val Dice curves.  Agreement of the curves
is the strongest training-parity evidence short of bit-exactness
(tests/test_training_dynamics_parity.py proves 4 steps bit-close; this
proves trajectories at real resolution over N epochs).

Run each side (any order; JAX side may run on TPU, torch on CPU):

    python scripts/validate_training_dynamics.py --side data
    python scripts/validate_training_dynamics.py --side torch
    python scripts/validate_training_dynamics.py --side jax [--f32]
    python scripts/validate_training_dynamics.py --side report

Artifacts land in docs/validation/ (curves CSV per side + combined PNG
+ VALIDATION.md table).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "validation")
DATA = os.path.join(OUT, "dyn_data.npz")

# the reference recipe (configs/config_dfc-sa-res-block.yaml) at reduced
# epoch count; features/img_size configurable for runtime
LR, MOMENTUM, WD, CLIP = 0.01, 0.9, 1e-4, 1.0
W_BCE = W_DICE = 0.5


def make_data(size, n_train, n_val, batch, epochs, seed=7):
    """Precompute normalized batches (identical bytes for both sides)."""
    from dfc_sa_unet_tpu.data.synthetic import generate
    from dfc_sa_unet_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
    from PIL import Image
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        root = generate(td, n=n_train + n_val, size=size, seed=seed)
        imgs, masks = [], []
        names = sorted(os.listdir(os.path.join(root, "original")))
        for f in names:
            img = np.asarray(Image.open(os.path.join(root, "original", f)), np.float32) / 255.0
            m = (np.asarray(Image.open(os.path.join(root, "mask", f)), np.float32) / 255.0 > 0.5)
            imgs.append((img - IMAGENET_MEAN) / IMAGENET_STD)
            masks.append(m.astype(np.float32)[..., None])
    x = np.stack(imgs).astype(np.float32)  # [N,H,W,3] normalized
    t = np.stack(masks).astype(np.float32)  # [N,H,W,1]
    x_tr, t_tr = x[:n_train], t[:n_train]
    x_va, t_va = x[n_train:], t[n_train:]
    # per-epoch shuffled batch order, fixed for both sides
    orders = np.stack([np.random.default_rng(100 + e).permutation(n_train) for e in range(epochs)])
    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(DATA, x_tr=x_tr, t_tr=t_tr, x_va=x_va, t_va=t_va,
                        orders=orders, batch=batch, epochs=epochs)
    print(f"wrote {DATA}: train {x_tr.shape}, val {x_va.shape}, {epochs} epochs, batch {batch}")


def _bce_dice_np(probs, t):
    p = np.clip(probs.astype(np.float64), 0, 1)
    logp = np.clip(np.log(np.maximum(p, 1e-300)), -100, None)
    log1p = np.clip(np.log1p(-np.minimum(p, 1.0 - 1e-16)), -100, None)
    bce = -np.mean(t * logp + (1 - t) * log1p)
    inter = np.sum(p * t)
    dice = 1.0 - (2 * inter + 1.0) / (np.sum(p) + np.sum(t) + 1.0)
    return W_BCE * bce + W_DICE * dice


def _hard_dice_np(probs, t):
    pb = (probs > 0.5).astype(np.float64)
    inter = (pb * t).sum()
    return 2 * inter / (pb.sum() + t.sum() + 1e-7)


def run_torch(features, pool_size, csv_path):
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from _reference import load_ref_module

    ref = load_ref_module("unet_dfc_sa_res")
    torch.manual_seed(42)
    model = ref.UNetDFCSARes(in_channels=3, out_channels=1, features=list(features),
                             pool_size=pool_size)
    torch.save(model.state_dict(), os.path.join(OUT, "dyn_init.pth"))
    opt = torch.optim.SGD(model.parameters(), lr=LR, momentum=MOMENTUM, weight_decay=WD)

    d = np.load(DATA)
    x_tr, t_tr, x_va, t_va = d["x_tr"], d["t_tr"], d["x_va"], d["t_va"]
    orders, batch, epochs = d["orders"], int(d["batch"]), int(d["epochs"])

    def to_t(a):  # NHWC -> NCHW
        return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)))

    rows = []
    for e in range(epochs):
        model.train()
        losses = []
        for lo in range(0, len(x_tr) - batch + 1, batch):
            idx = orders[e][lo : lo + batch]
            xb, tb = to_t(x_tr[idx]), to_t(t_tr[idx])
            opt.zero_grad()
            probs = torch.sigmoid(model(xb))
            # reference loss semantics (utils/metrics.py:52-78 on probs)
            bce = torch.nn.functional.binary_cross_entropy(probs, tb)
            inter = (probs * tb).sum()
            dice_l = 1 - (2 * inter + 1.0) / (probs.sum() + tb.sum() + 1.0)
            loss = W_BCE * bce + W_DICE * dice_l
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP)
            opt.step()
            losses.append(float(loss))
        model.eval()
        dices = []
        with torch.no_grad():
            for lo in range(0, len(x_va), batch):
                xb = to_t(x_va[lo : lo + batch])
                probs = torch.sigmoid(model(xb)).numpy().transpose(0, 2, 3, 1)
                dices.append(_hard_dice_np(probs, t_va[lo : lo + batch]))
        rows.append((e + 1, float(np.mean(losses)), float(np.mean(dices))))
        print(f"[torch] epoch {e + 1}: loss {rows[-1][1]:.4f} val_dice {rows[-1][2]:.4f}", flush=True)
        np.savetxt(csv_path, np.asarray(rows), delimiter=",", header="epoch,train_loss,val_dice",
                   comments="")


def run_jax(features, pool_size, csv_path, f32=True):
    import jax
    import jax.numpy as jnp

    from dfc_sa_unet_tpu.losses import compute_loss
    from dfc_sa_unet_tpu.models.factory import create_model
    from dfc_sa_unet_tpu.train import optim
    from dfc_sa_unet_tpu.utils.torch_convert import load_torch_checkpoint

    cfg = {"model": {"name": "DFC-SA-Res-Block", "features": list(features),
                     "pool_size": pool_size}}
    dtype = jnp.float32 if f32 else jnp.bfloat16
    model = create_model(cfg, dtype=None if f32 else jnp.bfloat16)

    d = np.load(DATA)
    x_tr, t_tr, x_va, t_va = d["x_tr"], d["t_tr"], d["x_va"], d["t_va"]
    orders, batch, epochs = d["orders"], int(d["batch"]), int(d["epochs"])

    template = model.init(jax.random.key(0), jnp.zeros((1, *x_tr.shape[1:3], 3), dtype), train=False)
    init_pth = os.path.join(OUT, "dyn_init.pth")
    assert os.path.exists(init_pth), "run --side torch first (it writes the shared init)"
    variables = load_torch_checkpoint(init_pth, template)
    params = jax.tree.map(jnp.asarray, variables["params"])
    batch_stats = jax.tree.map(jnp.asarray, variables["batch_stats"])
    tx = optim.sgd_with_clip(LR, MOMENTUM, WD, clip_norm=CLIP)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, x, t):
        def loss_fn(params):
            out, mut = model.apply({"params": params, "batch_stats": batch_stats},
                                   x, train=True, mutable=["batch_stats"])
            probs = jax.nn.sigmoid(out.astype(jnp.float32))
            loss = compute_loss(probs, t, "bce_dice", {"weight_bce": W_BCE, "weight_dice": W_DICE})
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), new_stats, new_opt, loss

    @jax.jit
    def eval_probs(params, batch_stats, x):
        out = model.apply({"params": params, "batch_stats": batch_stats}, x, train=False)
        return jax.nn.sigmoid(out.astype(jnp.float32))

    rows = []
    for e in range(epochs):
        losses = []
        for lo in range(0, len(x_tr) - batch + 1, batch):
            idx = orders[e][lo : lo + batch]
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state,
                jnp.asarray(x_tr[idx], dtype), jnp.asarray(t_tr[idx]))
            losses.append(float(loss))
        dices = []
        for lo in range(0, len(x_va), batch):
            probs = np.asarray(eval_probs(params, batch_stats, jnp.asarray(x_va[lo : lo + batch], dtype)))
            dices.append(_hard_dice_np(probs, t_va[lo : lo + batch]))
        rows.append((e + 1, float(np.mean(losses)), float(np.mean(dices))))
        print(f"[jax] epoch {e + 1}: loss {rows[-1][1]:.4f} val_dice {rows[-1][2]:.4f}", flush=True)
        np.savetxt(csv_path, np.asarray(rows), delimiter=",", header="epoch,train_loss,val_dice",
                   comments="")


def report():
    import csv

    def load(path):
        with open(path) as f:
            r = list(csv.DictReader(f))
        return r

    tr = load(os.path.join(OUT, "dyn_torch.csv"))
    jx = load(os.path.join(OUT, "dyn_jax.csv"))
    n = min(len(tr), len(jx))
    lines = [
        "# Training-dynamics validation (torch reference vs this framework)",
        "",
        "Identical initial weights (converted), identical precomputed batches,",
        "reference recipe (SGD lr=0.01 momentum=0.9 wd=1e-4, clip 1.0, bce_dice",
        "0.5/0.5 on sigmoid probs).  Generated by scripts/validate_training_dynamics.py.",
        "",
        "| epoch | torch loss | jax loss | torch val Dice | jax val Dice | ΔDice |",
        "|---|---|---|---|---|---|",
    ]
    max_d = 0.0
    for i in range(n):
        dd = abs(float(tr[i]["val_dice"]) - float(jx[i]["val_dice"]))
        max_d = max(max_d, dd)
        lines.append(
            f"| {int(float(tr[i]['epoch']))} | {float(tr[i]['train_loss']):.4f} | {float(jx[i]['train_loss']):.4f}"
            f" | {float(tr[i]['val_dice']):.4f} | {float(jx[i]['val_dice']):.4f} | {dd:.4f} |"
        )
    lines += ["", f"Max |ΔDice| over {n} epochs: **{max_d:.4f}** (f32 parity mode, one real TPU v5e chip vs torch CPU)", ""]
    with open(os.path.join(OUT, "VALIDATION.md"), "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        ep = [int(float(r["epoch"])) for r in tr[:n]]
        fig, ax = plt.subplots(1, 2, figsize=(11, 4))
        ax[0].plot(ep, [float(r["train_loss"]) for r in tr[:n]], "o-", label="torch")
        ax[0].plot(ep, [float(r["train_loss"]) for r in jx[:n]], "x--", label="jax/tpu")
        ax[0].set_title("train loss"), ax[0].set_xlabel("epoch"), ax[0].legend()
        ax[1].plot(ep, [float(r["val_dice"]) for r in tr[:n]], "o-", label="torch")
        ax[1].plot(ep, [float(r["val_dice"]) for r in jx[:n]], "x--", label="jax/tpu")
        ax[1].set_title("val Dice"), ax[1].set_xlabel("epoch"), ax[1].legend()
        fig.savefig(os.path.join(OUT, "dynamics_curves.png"), bbox_inches="tight", dpi=120)
        print(f"curves -> {os.path.join(OUT, 'dynamics_curves.png')}")
    except Exception as e:  # noqa: BLE001
        print(f"(plot skipped: {e})")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--side", required=True, choices=["data", "torch", "jax", "report"])
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--n_train", type=int, default=32)
    p.add_argument("--n_val", type=int, default=8)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--features", type=str, default="64,128,256,512")
    p.add_argument("--pool_size", type=int, default=8)
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args()
    features = [int(x) for x in args.features.split(",")]

    os.makedirs(OUT, exist_ok=True)
    if args.side == "data":
        make_data(args.size, args.n_train, args.n_val, args.batch, args.epochs)
    elif args.side == "torch":
        run_torch(features, args.pool_size, os.path.join(OUT, "dyn_torch.csv"))
    elif args.side == "jax":
        run_jax(features, args.pool_size, os.path.join(OUT, "dyn_jax.csv"), f32=not args.bf16)
    else:
        report()


if __name__ == "__main__":
    main()
