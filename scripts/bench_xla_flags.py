#!/usr/bin/env python
"""XLA compiler-flag sweep for the flagship serving path (one process).

The round-3 HLO census (PERF.md) pinned the flagship's remaining 26% gap
to speed-of-light on multi-consumer materialization: 289 standalone
elementwise fusions (38.0 GB) + copies (10.3 GB) that XLA's fusion pass
chooses not to duplicate into consumers.  Fusion sizing is governed by
compiler knobs we never touched — most directly the scoped-VMEM budget.
This script A/Bs those knobs via per-compile `compiler_options` (rides
the PJRT compile request, so it works through the axon tunnel without a
process restart per combo).

A deliberately-bad canary (scoped vmem 4 MiB) is included: if the canary
does NOT slow down, the backend ignored the options and the whole sweep
is inconclusive — the script says so.

    python scripts/bench_xla_flags.py [--mode int8|engine|module] [--batch 128]

Timing is the scan-chained method from bench.py (tunnel-safe).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COMBOS = [
    ("baseline", {}),
    # scoped-VMEM budget: bigger budget -> larger fusions allowed (v5e has
    # 128 MiB VMEM; XLA's default scoped budget is far below that)
    ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem_96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    # canary: starving scoped VMEM must hurt if options are honored
    ("vmem_4m_canary", {"xla_tpu_scoped_vmem_limit_kib": "4096"}),
    ("no_dot_strength_red", {"xla_tpu_enable_dot_strength_reduction": "false"}),
    ("no_rwb_fusion", {"xla_tpu_rwb_fusion": "false"}),
    ("latency_hiding_sched", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["int8", "engine", "module"], default="int8")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--fp32", action="store_true")
    args = p.parse_args()

    import jax.numpy as jnp

    import bench

    dtype = None if args.fp32 else jnp.bfloat16
    fn, variables, x = bench.build_chained(
        "DFC-SA-Res-Block", dtype, False, args.batch, args.k,
        engine=args.mode == "engine", int8=args.mode == "int8",
    )
    lowered = fn.lower(variables, x)

    results = []
    for name, opts in COMBOS:
        try:
            t0 = time.perf_counter()
            compiled = lowered.compile(compiler_options=opts or None)
            t_compile = time.perf_counter() - t0
            float(compiled(variables, x))  # warm
            dt = min(
                (lambda s: (float(compiled(variables, x)), time.perf_counter() - s)[1])(
                    time.perf_counter())
                for _ in range(args.repeats)
            ) / args.k
            ips = args.batch / dt
            results.append((name, opts, dt * 1e3, ips, t_compile))
            print(f"{name:22s} {dt * 1e3:8.2f} ms  {ips:7.1f} img/s"
                  f"  (compile {t_compile:.0f}s)  {opts}", flush=True)
        except Exception as e:
            results.append((name, opts, None, None, None))
            print(f"{name:22s} REJECTED: {type(e).__name__}: {str(e)[:200]}", flush=True)

    ok = [r for r in results if r[3] is not None]
    base = next((r for r in ok if r[0] == "baseline"), None)
    canary = next((r for r in ok if r[0] == "vmem_4m_canary"), None)
    print()
    if base and canary and abs(canary[3] - base[3]) / base[3] < 0.02:
        print("CANARY FLAT: starved scoped-VMEM did not slow the graph — the"
              " backend likely ignores per-compile flag overrides; sweep"
              " inconclusive.")
    if base:
        best = max(ok, key=lambda r: r[3])
        print(f"best: {best[0]} at {best[3]:.1f} img/s"
              f" ({best[3] / base[3] - 1:+.1%} vs baseline {base[3]:.1f})")
    print(json.dumps([
        {"combo": n, "opts": o, "ms": m, "img_per_s": i} for n, o, m, i, _ in results
    ]))


if __name__ == "__main__":
    main()
