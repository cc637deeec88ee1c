#!/usr/bin/env python
"""Host input-pipeline throughput: can the loader feed the training step?

The chip-side training rates (PERF.md: flagship 185 img/s, TransUNet 291,
ViT-seg 290 at B=128) are step-only numbers with precomputed device
batches.  Real training overlaps the BatchLoader (PIL decode + resize +
augment + stack, reference utils/data_loader.py semantics) with the step;
if the host pipeline is slower than the step, training is input-bound and
kernel work is irrelevant.  This measures the host side alone, on disk,
at a realistic source resolution (CVC-ClinicDB ships 384x288; the
Mapping Challenge crops 300x300).

    python scripts/bench_loader.py [--n 256] [--src 384] [--batch 128]

No TPU needed (pure host).  Writes nothing outside --tmp.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_epoch(loader):
    n, t0 = 0, time.perf_counter()
    for batch in loader:
        n += batch["image"].shape[0]
    return n / (time.perf_counter() - t0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--src", type=int, default=384, help="source image size on disk")
    p.add_argument("--img", type=int, default=224, help="training resolution")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--workers", type=int, nargs="*", default=[1, 2, 4])
    p.add_argument("--epochs", type=int, default=2, help="per config; first is cold")
    args = p.parse_args()

    import tempfile

    from dfc_sa_unet_tpu.data.dataset import SegmentationDataset
    from dfc_sa_unet_tpu.data.loader import BatchLoader
    from dfc_sa_unet_tpu.data.synthetic import generate
    from dfc_sa_unet_tpu.data.transforms import build_transforms

    with tempfile.TemporaryDirectory() as td:
        root = generate(td, n=args.n, size=args.src, seed=3)
        print(f"# {args.n} samples at {args.src}px -> {args.img}px, batch {args.batch}, "
              f"host cpus={os.cpu_count()}")
        rows = []
        for augment in (False, True):
            tf = build_transforms((args.img, args.img), augment=augment)
            for cache in (False, True, "disk"):
                ds = SegmentationDataset(root, tf, (args.img, args.img), cache=cache) \
                    if cache else SegmentationDataset(root, tf, (args.img, args.img))
                for w in args.workers:
                    loader = BatchLoader(ds, args.batch, shuffle=True, num_workers=w)
                    rates = []
                    for e in range(args.epochs):
                        loader.set_epoch(e)
                        rates.append(run_epoch(loader))
                    best = max(rates)
                    rows.append((augment, cache, w, best))
                    print(f"augment={augment!s:5} cache={cache!s:5} workers={w}: "
                          + " ".join(f"{r:7.1f}" for r in rates) + " img/s")
        print("\n| augment | cache | workers | img/s |\n|---|---|---|---|")
        for a, c, w, r in rows:
            print(f"| {a} | {c} | {w} | {r:.1f} |")


if __name__ == "__main__":
    main()
