#!/usr/bin/env python
"""Harder synthetic segmentation set for the long-horizon training soak.

The basic ``data.synthetic.generate`` set (bright ellipse on dark
background) saturates the flagship at val Dice 1.000 within 2 epochs —
useless for a 200-epoch trajectory comparison.  This variant makes the
task genuinely learnable-but-hard so bf16-vs-f32 drift, BN running-stat
drift and overfitting dynamics are visible:

  * 1-3 low-contrast filled target ellipses (labelled) per image;
  * 1-3 hollow distractor rings at the SAME brightness (not labelled) —
    the model must learn shape, not intensity;
  * a random illumination gradient + heavy pixel noise;
  * target/background brightness distributions overlap.

Soak protocol (VERDICT r4 item 2): reference recipe, 200 epochs bf16 +
f32 control, mid-run SIGTERM + resume; see docs/validation/SOAK.md.
"""

import argparse
import os

import numpy as np
from PIL import Image


def _ellipse(yy, xx, cy, cx, ry, rx, theta):
    ys, xs = yy - cy, xx - cx
    c, s = np.cos(theta), np.sin(theta)
    u = (c * xs + s * ys) / rx
    v = (-s * xs + c * ys) / ry
    return u * u + v * v


def generate_hard(root: str, n: int = 200, size: int = 224, seed: int = 0) -> str:
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "original")
    mask_dir = os.path.join(root, "mask")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    for i in range(n):
        base = rng.uniform(70, 110)
        # illumination gradient: up to +-25 across the image, random axis
        gtheta = rng.uniform(0, 2 * np.pi)
        grad = ((np.cos(gtheta) * xx + np.sin(gtheta) * yy) / size) * rng.uniform(-25, 25)
        img = np.full((size, size), base, np.float32) + grad
        mask = np.zeros((size, size), bool)

        def rand_geom():
            cy, cx = rng.uniform(0.15 * size, 0.85 * size, size=2)
            ry, rx = rng.uniform(0.06 * size, 0.18 * size, size=2)
            return cy, cx, ry, rx, rng.uniform(0, np.pi)

        # filled targets (labelled): only ~15-30 gray levels above base
        for _ in range(rng.integers(1, 4)):
            cy, cx, ry, rx, th = rand_geom()
            d = _ellipse(yy, xx, cy, cx, ry, rx, th)
            inside = d <= 1.0
            img[inside] += rng.uniform(15, 30)
            mask |= inside
        # hollow distractor rings (NOT labelled): same brightness lift
        for _ in range(rng.integers(1, 4)):
            cy, cx, ry, rx, th = rand_geom()
            d = _ellipse(yy, xx, cy, cx, ry, rx, th)
            ring = (d <= 1.0) & (d >= rng.uniform(0.35, 0.55))
            img[ring] += rng.uniform(15, 30)
        img = img[..., None] + rng.normal(0, 12, size=(size, size, 3))
        # mild per-channel tint so the 3 channels are not identical
        img = img + rng.uniform(-8, 8, size=3)
        img = np.clip(img, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, f"sample_{i:03d}.png"))
        Image.fromarray((mask * 255).astype(np.uint8)).save(
            os.path.join(mask_dir, f"sample_{i:03d}.png"))
    return root


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("root")
    p.add_argument("--n", type=int, default=200)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    generate_hard(a.root, a.n, a.size, a.seed)
    print(f"wrote {a.n} hard samples under {a.root}")
