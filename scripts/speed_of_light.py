#!/usr/bin/env python
"""Analytic speed-of-light floor for UNetDFCSA(Res) serving at 224x224.

For every op in the flagship forward, counts the UNAVOIDABLE work under
an idealized executor that fuses every elementwise epilogue into the
producing conv (zero elementwise passes, zero copies):

  * HBM bytes: each conv reads its input once and writes its output once
    (weights are negligible: ~8 MB total, resident);
  * MXU flops: 2 * N * H * W * kh * kw * Cin * Cout per conv.

Floors are additive (TPU executes one op stream; conv compute and its
own HBM streaming overlap *within* an op on this emitter — we take
max(io, compute) per op, the true per-op floor) and evaluated against:

  * measured sustained conv-emitter rate (PERF.md: 50-110 TF/s, use 110
    best-case) and measured HBM (~819 GB/s spec, v5e);
  * bf16 (2 B) vs s8 (1 B) activation storage.

This bounds ANY implementation of this architecture on this chip —
including perfect Pallas kernels — so it settles whether the 2,000
img/s north star is reachable at all.  No chip needed: pure arithmetic.

    python scripts/speed_of_light.py [--batch 128]
"""

import argparse

HBM_GBPS = 819.0
RATES = {"bf16": 110.0, "s8": 166.0}  # best measured sustained (PERF.md)
POOL = 8


def convs_of_block(H, Cin, C):
    """(name, H, kh*kw, in_ch, out_ch) for one DFC block's convs."""
    p = POOL
    return [
        ("conv3x3", H, 9, Cin, C),
        ("attn0_1x1", H, 1, Cin, C),
        # LSA: pool read (C at HxW -> p*p), qkv at p*p (negligible),
        # upsample write (C at HxW) — count the full-res read+write
        ("lsa_io", H, 0, C, C),
        ("gate_1x1", H, 1, 2 * C, C),
        ("fusion_1x1", H, 1, 3 * C, C),
        ("res_1x1", H, 1, Cin, C),
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    B = args.batch
    F = [64, 128, 256, 512]
    levels = []
    # encoder
    H = 224
    Cin = 3
    for i, C in enumerate(F):
        levels.append((f"down{i+1}", H, Cin, C))
        Cin = C
        H //= 2
    levels.append(("bottleneck", H, F[3], F[3] * 2))
    # decoder: up conv-transpose halves channels, concat with skip
    C = F[3] * 2
    for i in range(4, 0, -1):
        H *= 2
        # convT: read C at H/2, write C/2 at H
        levels.append((f"up{i}_convT", H, C, F[i - 1]))
        levels.append((f"up_conv{i}", H, 2 * F[i - 1], F[i - 1]))
        C = F[i - 1]
    levels.append(("final_1x1", 224, F[0], 1))

    for bytes_per_elem, tag in ((2, "bf16"), (1, "s8")):
        CONV_TFLOPS = RATES[tag]
        tot_io = tot_fl = tot_t = 0.0
        for name, H, Cin, Cout in levels:
            if name.endswith("_convT"):
                ios = B * ((H // 2) ** 2 * Cin + H * H * Cout) * bytes_per_elem
                fl = 2 * B * H * H * 4 * (Cin / 4) * Cout  # k=2 s=2: each out pixel sees Cin
                ops = [(name, ios, fl)]
            elif name.startswith(("down", "bottleneck", "up_conv")):
                ops = []
                for cname, Hc, k, ci, co in convs_of_block(H, Cin, Cout):
                    ios = B * Hc * Hc * (ci + co) * bytes_per_elem
                    fl = 2 * B * Hc * Hc * k * ci * co
                    ops.append((f"{name}.{cname}", ios, fl))
            else:  # final
                ios = B * H * H * (Cin + Cout) * bytes_per_elem
                fl = 2 * B * H * H * Cin * Cout
                ops = [(name, ios, fl)]
            for oname, ios, fl in ops:
                t_io = ios / (HBM_GBPS * 1e9)
                t_fl = fl / (CONV_TFLOPS * 1e12)
                tot_io += ios
                tot_fl += fl
                tot_t += max(t_io, t_fl)
        print(f"[{tag}] ideal-fusion floor @B={B}: "
              f"bytes={tot_io/1e9:.2f} GB  flops={tot_fl/1e12:.2f} TF")
        print(f"[{tag}]   t >= {tot_t*1e3:.1f} ms  ->  <= {B/tot_t:,.0f} img/s "
              f"(io-only floor {B/(tot_io/(HBM_GBPS*1e9)):,.0f}, "
              f"flops-only floor {B/(tot_fl/(CONV_TFLOPS*1e12)):,.0f})")


if __name__ == "__main__":
    main()
