#!/usr/bin/env python
"""Long-horizon soak analysis (VERDICT r4 item 2).

Inputs: two completed train.py runs on the hard synthetic set
(scripts/soak_dataset.py) — a 200-epoch bf16 run that took a mid-run
SIGTERM + --resume, and an f32 control — plus their stdout logs.

Checks / artifacts:
  1. History continuity across preemption: every epoch line printed by
     the PRE-preemption process must reappear (same values to the
     printed 4 decimals) in the post-resume CSV history — resume
     restored, not restarted, the curves (reference defect #3 fixed).
  2. bf16-vs-f32 trajectory: per-epoch val-Dice curves over the common
     horizon + final/best deltas.
  3. BN running-stat drift: relative L2 distance between the two runs'
     batch_stats (mean / var separately) at a common epoch checkpoint —
     the quantity that silently decays in long low-precision training.
  4. docs/validation/soak_curves_r5.png with both trajectories.

Usage:
  python scripts/soak_report.py --bf16_dir .soak/logs_bf16 \
      --f32_dir .soak/logs_f32 --pre_log .soak/soak_bf16.log \
      --epoch 100 --png docs/validation/soak_curves_r5.png
"""

import argparse
import csv
import os
import re
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def read_csv_series(log_dir, name="dice_plot.csv"):
    path = os.path.join(log_dir, "images", name)
    epochs, train, val = [], [], []
    with open(path) as f:
        for row in csv.DictReader(f):
            epochs.append(int(row["Epoch"]))
            keys = [k for k in row if k != "Epoch"]
            train.append(float(row[keys[0]]))
            val.append(float(row[keys[1]]))
    return np.asarray(epochs), np.asarray(train), np.asarray(val)


def parse_log_epochs(path):
    """Epoch summaries from a train.py stdout log:
    'Epoch [N/M]' then 'Train Loss: a, Dice: b, IoU: c' / 'Val Loss: ...'."""
    out = {}
    cur = None
    pat_e = re.compile(r"Epoch \[(\d+)/\d+\]")
    pat_t = re.compile(r"Train Loss: ([\d.eE+-]+), Dice: ([\d.eE+-]+)")
    pat_v = re.compile(r"Val Loss: ([\d.eE+-]+), Dice: ([\d.eE+-]+)")
    for line in open(path, errors="replace"):
        m = pat_e.search(line)
        if m:
            cur = int(m.group(1))
            out[cur] = {}
        m = pat_t.search(line)
        if m and cur is not None:
            out[cur]["train_loss"], out[cur]["train_dice"] = map(float, m.groups())
        m = pat_v.search(line)
        if m and cur is not None:
            out[cur]["val_loss"], out[cur]["val_dice"] = map(float, m.groups())
    return {e: d for e, d in out.items() if "val_dice" in d}


def bn_drift(ck_a, ck_b):
    """Relative L2 drift between two checkpoints' batch_stats, split by
    mean/var, plus param drift for context."""
    from dfc_sa_unet_tpu.utils import checkpoint as ckpt_util
    import jax

    a = ckpt_util.restore_pytree(ck_a)
    b = ckpt_util.restore_pytree(ck_b)

    def cat(tree, want):
        leaves = []
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
            key = "/".join(str(getattr(p, "key", p)) for p in path)
            if key.rsplit("/", 1)[-1] == want:
                leaves.append(np.asarray(leaf, np.float64).ravel())
        return np.concatenate(leaves)

    out = {}
    for stat in ("mean", "var"):
        va = cat(a["batch_stats"], stat)
        vb = cat(b["batch_stats"], stat)
        out[f"bn_{stat}_rel_l2"] = float(np.linalg.norm(va - vb) / np.linalg.norm(vb))
        out[f"bn_{stat}_max_abs"] = float(np.abs(va - vb).max())
    pa = np.concatenate([np.asarray(l, np.float64).ravel()
                         for l in jax.tree_util.tree_leaves(a["params"])])
    pb = np.concatenate([np.asarray(l, np.float64).ravel()
                         for l in jax.tree_util.tree_leaves(b["params"])])
    out["param_rel_l2"] = float(np.linalg.norm(pa - pb) / np.linalg.norm(pb))
    out["epochs"] = (int(a["epoch"]), int(b["epoch"]))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bf16_dir", default=".soak/logs_bf16")
    p.add_argument("--f32_dir", default=".soak/logs_f32")
    p.add_argument("--pre_log", default=".soak/soak_bf16.log")
    p.add_argument("--epoch", type=int, default=100,
                   help="common checkpoint epoch for the BN-drift comparison")
    p.add_argument("--png", default="docs/validation/soak_curves_r5.png")
    args = p.parse_args()

    ep16, tr16, va16 = read_csv_series(args.bf16_dir)
    print(f"bf16 run: {len(ep16)} epochs in history "
          f"(continuous={list(ep16) == list(range(1, len(ep16) + 1))}), "
          f"best val dice {va16.max():.4f} @ epoch {ep16[va16.argmax()]}, "
          f"final {va16[-1]:.4f}")

    # 1. preemption continuity: pre-SIGTERM printed values vs final CSV
    pre = parse_log_epochs(args.pre_log)
    _, _, val_l = read_csv_series(args.bf16_dir, "loss_plot.csv")
    mism = 0
    for e, d in sorted(pre.items()):
        if e > len(va16):
            continue
        if abs(va16[e - 1] - d["val_dice"]) > 5.1e-5 or \
           abs(val_l[e - 1] - d["val_loss"]) > 5.1e-5:
            mism += 1
            print(f"  CONTINUITY MISMATCH epoch {e}: csv dice {va16[e-1]:.6f} "
                  f"vs pre-log {d['val_dice']:.4f}")
    print(f"continuity: {len(pre)} pre-preemption epochs checked against the "
          f"resumed history, {mism} mismatches "
          f"({'EXACT to printed precision' if mism == 0 else 'FAIL'})")

    have_f32 = os.path.isdir(os.path.join(args.f32_dir, "images"))
    if have_f32:
        ep32, _, va32 = read_csv_series(args.f32_dir)
        n = min(len(va16), len(va32))
        d = np.abs(va16[:n] - va32[:n])
        print(f"f32 control: {len(ep32)} epochs, best val dice {va32.max():.4f}")
        print(f"bf16-vs-f32 val-Dice over epochs 1..{n}: "
              f"max |delta| {d.max():.4f} @ epoch {d.argmax() + 1}, "
              f"mean |delta| {d.mean():.4f}, final-epoch delta {d[n-1]:.4f}, "
              f"best-dice delta {abs(va16[:n].max() - va32[:n].max()):.4f}")

        ck16 = os.path.join(args.bf16_dir, "checkpoints", f"checkpoint_epoch_{args.epoch}")
        ck32 = os.path.join(args.f32_dir, "checkpoints", f"checkpoint_epoch_{args.epoch}")
        if os.path.isdir(ck16) and os.path.isdir(ck32):
            drift = bn_drift(ck16, ck32)
            print(f"BN drift @ epoch {args.epoch} (bf16 vs f32 control): "
                  f"mean rel-L2 {drift['bn_mean_rel_l2']:.4f} "
                  f"(max|d| {drift['bn_mean_max_abs']:.4f}), "
                  f"var rel-L2 {drift['bn_var_rel_l2']:.4f} "
                  f"(max|d| {drift['bn_var_max_abs']:.4f}); "
                  f"param rel-L2 {drift['param_rel_l2']:.4f}")
        else:
            print(f"(no common epoch-{args.epoch} checkpoints; skipping BN drift)")

    if args.png:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(9, 4.5))
        ax.plot(ep16, va16, label="bf16 val Dice (200 ep, SIGTERM@91 + resume)", lw=1.2)
        ax.plot(ep16, tr16, label="bf16 train Dice", lw=0.8, alpha=0.5)
        if have_f32:
            ax.plot(ep32, va32, label="f32 control val Dice", lw=1.2)
        ax.axvline(91, color="gray", ls=":", lw=1, label="preemption + resume")
        ax.set_xlabel("epoch"); ax.set_ylabel("Dice")
        ax.set_title("Long-horizon soak: reference recipe on the hard synthetic set")
        ax.legend(loc="lower right", fontsize=8); ax.grid(alpha=0.3)
        os.makedirs(os.path.dirname(args.png), exist_ok=True)
        fig.savefig(args.png, dpi=120, bbox_inches="tight")
        print(f"curves -> {args.png}")


if __name__ == "__main__":
    main()
