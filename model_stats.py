#!/usr/bin/env python
"""Model statistics — params, size, FLOPs — CLI-compatible with the
reference model_stats.py (argparse surface at reference
model_stats.py:200-210), with its FLOPs/MACs label swap fixed (the
reference reports MACs under 'flops' and params under 'macs',
model_stats.py:179-180).

    python model_stats.py --config CFG.yaml [--output DIR]
        [--batch_size N] [--height H] [--width W] [--channels C]

FLOPs come from XLA's own cost model (jit(...).lower().compile()
cost_analysis), i.e. what actually runs on the TPU, not a hook-based
estimate.
"""

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.config import load_config
from dfc_sa_unet_tpu.models.factory import ModelFactory


def count_parameters(params, prefix=""):
    """(per-module table rows, total) — mirrors the reference's per-module
    breakdown (model_stats.py:15-36) over top-level submodules."""
    rows = []
    total = 0
    for name, sub in sorted(params.items()):
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(sub))
        rows.append((f"{prefix}{name}", n))
        total += n
    return rows, total


def leaf_parameter_rows(params):
    """One row per leaf module (a module holding arrays directly) —
    the reference's per-leaf param table (model_stats.py:15-36)."""
    rows = []

    def walk(node, path):
        arrays = {k: v for k, v in node.items() if hasattr(v, "shape")}
        if arrays:
            rows.append((".".join(path) or "<root>",
                         sum(int(np.prod(a.shape)) for a in arrays.values())))
        for k in sorted(node):
            if not hasattr(node[k], "shape"):
                walk(node[k], path + [k])

    walk(params, [])
    return rows


def _params_at(params, path):
    node = params
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return 0
        node = node[p]
    return sum(int(np.prod(a.shape)) for a in jax.tree.leaves(node))


def forward_summary(model, variables, x):
    """[(module path, output shape, params)] for every submodule, in call
    order — the Flax-native analog of the reference's hook-based
    architecture summary (model_stats.py:70-114), via capture_intermediates
    (each module's __call__ output is recorded during one real forward)."""
    _, state = model.apply(
        variables, x, train=False, capture_intermediates=True, mutable=["intermediates"]
    )
    rows = []

    def walk(node, path):
        for k, v in node.items():
            if k == "__call__":
                out = v[0]
                if hasattr(out, "shape"):
                    rows.append(("/".join(path) or "<root>", tuple(out.shape),
                                 _params_at(variables["params"], path)))
            elif isinstance(v, dict):
                walk(v, path + [k])

    walk(state["intermediates"], [])
    return rows


def leaf_flops_rows(model, variables, x):
    """[(leaf module path, flops)] — per-module complexity attribution
    matching the reference's ptflops output (reference
    model_stats.py:164-165), computed analytically from each leaf's
    recorded output shape x its kernel parameter count:

      conv/dense:    2 * output_positions * kernel.size
                     (output positions absorb strides; one MAC = 2 FLOPs)
      conv_transpose: 2 * output_positions * kernel.size / (stride^2)
                     (every INPUT position applies the whole kernel; all
                     ConvTranspose in this repo are stride 2)

    Param-free ops (attention einsums, norms, resizes) contribute 0 here
    and appear only in the XLA cost-model total — the printed coverage
    line makes the gap explicit."""
    _, state = model.apply(
        variables, x, train=False, capture_intermediates=True, mutable=["intermediates"]
    )
    out_shapes = {}

    def walk_inter(node, path):
        for k, v in node.items():
            if k == "__call__":
                out = v[0]
                if hasattr(out, "shape"):
                    out_shapes[tuple(path)] = tuple(out.shape)
            elif isinstance(v, dict):
                walk_inter(v, path + [k])

    walk_inter(state["intermediates"], [])

    rows = []

    def walk_params(node, path):
        arrays = {k: v for k, v in node.items() if hasattr(v, "shape")}
        if arrays:
            fl = 0
            shape = out_shapes.get(tuple(path))
            if shape is not None:
                pos = int(np.prod(shape[:-1]))
                for key, a in arrays.items():
                    if key == "kernel" or key.endswith("proj_weight"):
                        fl += 2 * pos * int(np.prod(a.shape))
                    elif key == "kernel_t":
                        fl += 2 * pos * int(np.prod(a.shape)) // 4
            rows.append((".".join(path) or "<root>", fl))
        for k in sorted(node):
            if not hasattr(node[k], "shape"):
                walk_params(node[k], path + [k])

    walk_params(variables["params"], [])
    return rows


def module_flops_rows(params, leaf_rows):
    """Aggregate leaf FLOPs up to the top-level submodules (the rows of
    the main table)."""
    agg = {name: 0 for name in params}
    for path, fl in leaf_rows:
        top = path.split(".", 1)[0]
        if top in agg:
            agg[top] += fl
    return agg


def model_flops(model, variables, x):
    """(flops, activation_memory_stats) from XLA's own cost model and
    buffer assignment.  Activation memory (the compiled executable's temp
    buffers) is what actually bounds batch size / image size on a chip —
    the reference's model_stats reports only params+FLOPs; this is the
    number that explains OOMs and what --spatial_parallel divides
    (PERF.md spatial-sharding entry)."""

    def fwd(v, x):
        return model.apply(v, x, train=False)

    lowered = jax.jit(fwd).lower(variables, x)
    mem = None
    try:
        compiled = lowered.compile()
        cost = compiled.cost_analysis()
        ma = compiled.memory_analysis()
        if ma is not None:
            mem = {"activations_mb": ma.temp_size_in_bytes / 2**20,
                   "arguments_mb": ma.argument_size_in_bytes / 2**20,
                   "output_mb": ma.output_size_in_bytes / 2**20}
    except Exception:
        cost = lowered.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return (float(cost.get("flops", float("nan"))) if cost else float("nan")), mem


def main():
    p = argparse.ArgumentParser(description="Model parameters / size / FLOPs")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--output", type=str, default="model_stats")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--channels", type=int, default=None)
    args = p.parse_args()

    config = load_config(args.config)
    img_size = config["dataset"].get("img_size", [224, 224])
    if isinstance(img_size, int):
        img_size = [img_size, img_size]
    h = args.height or img_size[0]
    w = args.width or img_size[1]
    c = args.channels or config["model"].get("in_channels", 3)

    model = ModelFactory.get_model(config)
    x = jnp.zeros((args.batch_size, h, w, c), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)

    rows, total = count_parameters(variables["params"])
    leaf_rows = leaf_parameter_rows(variables["params"])
    summary_rows = forward_summary(model, variables, x)
    fl_leaf_rows = leaf_flops_rows(model, variables, x)
    fl_by_module = module_flops_rows(variables["params"], fl_leaf_rows)
    fl_sum = sum(fl for _, fl in fl_leaf_rows)
    n_stats = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(variables.get("batch_stats", {})))
    size_mb = (total + n_stats) * 4 / (1024 ** 2)
    flops, mem = model_flops(model, variables, x)
    macs = flops / 2.0  # one MAC = 2 FLOPs

    name = config["model"]["name"]
    lines = [
        f"Model: {name}",
        f"Input: {(args.batch_size, h, w, c)} (NHWC)",
        "",
        f"{'Module':<40}{'Params':>15}{'FLOPs':>18}{'FLOPs%':>9}",
        "-" * 82,
    ]
    for mod, n in rows:
        fl = fl_by_module.get(mod, 0)
        pct = 100.0 * fl / fl_sum if fl_sum else 0.0
        lines.append(f"{mod:<40}{n:>15,}{fl:>18,}{pct:>8.1f}%")
    lines += [
        "-" * 82,
        f"{'Total trainable params':<40}{total:>15,}",
        f"{'BatchNorm running stats':<40}{n_stats:>15,}",
        f"Model size: {size_mb:.2f} MB (float32)",
        f"FLOPs (per forward, XLA cost model): {flops:,.0f} ({flops / 1e9:.2f} GFLOPs)",
        f"MACs: {macs:,.0f} ({macs / 1e9:.2f} GMACs)",
        f"Per-module FLOPs sum (analytic, param ops): {fl_sum:,.0f} "
        f"({100.0 * fl_sum / flops:.1f}% of the XLA total; the rest is "
        f"param-free math — attention einsums, norms, resizes)"
        if np.isfinite(flops) and flops > 0 else
        f"Per-module FLOPs sum (analytic, param ops): {fl_sum:,.0f}",
    ]
    if mem is not None:
        lines += [
            f"Activation memory (XLA temp buffers, this batch/size/dtype): "
            f"{mem['activations_mb']:.1f} MB"
            f"   [args {mem['arguments_mb']:.1f} MB, output {mem['output_mb']:.1f} MB]",
            "  (scales ~linearly with batch and H*W; --spatial_parallel N "
            "divides it ~N-fold across chips)",
        ]
    fl_of_leaf = dict(fl_leaf_rows)
    lines += [
        "",
        "Per-leaf-module parameters + FLOPs (reference model_stats.py:15-36 "
        "+ ptflops :164-165):",
        f"{'Leaf module':<55}{'Params':>15}{'FLOPs':>18}",
        "-" * 88,
    ]
    for mod, n in leaf_rows:
        lines.append(f"{mod:<55}{n:>15,}{fl_of_leaf.get(mod, 0):>18,}")
    lines += [
        "",
        "Architecture summary — one real forward, NHWC shapes "
        "(reference model_stats.py:70-114):",
        f"{'Module':<55}{'Output shape':>24}{'Params':>14}",
        "-" * 93,
    ]
    for mod, shape, n in summary_rows:
        lines.append(f"{mod:<55}{str(shape):>24}{n:>14,}")
    report = "\n".join(lines)
    print(report)

    os.makedirs(args.output, exist_ok=True)
    base = os.path.join(args.output, f"{name}_stats")
    with open(base + ".txt", "w") as f:
        f.write(report + "\n")
    import csv

    with open(base + ".csv", "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["module", "params", "flops"])
        for mod, n in rows:
            writer.writerow([mod, n, fl_by_module.get(mod, 0)])
        writer.writerow(["TOTAL", total, fl_sum])
        writer.writerow(["flops", int(flops) if np.isfinite(flops) else ""])
        writer.writerow(["macs", int(macs) if np.isfinite(macs) else ""])
        writer.writerow(["size_mb", f"{size_mb:.2f}"])
        if mem is not None:
            writer.writerow(["activation_mb", f"{mem['activations_mb']:.1f}"])

    with open(base + "_layers.csv", "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["module", "output_shape", "params"])
        for mod, shape, n in summary_rows:
            writer.writerow([mod, "x".join(map(str, shape)), n])

    # parameter-distribution pie chart (reference model_stats.py:45-68)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        top = sorted(rows, key=lambda r: -r[1])[:10]
        rest = total - sum(n for _, n in top)
        labels = [m for m, _ in top] + (["other"] if rest > 0 else [])
        sizes = [n for _, n in top] + ([rest] if rest > 0 else [])
        plt.figure(figsize=(8, 8))
        plt.pie(sizes, labels=labels, autopct="%1.1f%%")
        plt.title(f"{name} parameter distribution")
        plt.savefig(base + "_params_pie.png", bbox_inches="tight")
        plt.close("all")
    except Exception as e:  # headless-font issues etc. shouldn't kill stats
        print(f"(pie chart skipped: {e})")
    print(f"Reports written to {args.output}/")


if __name__ == "__main__":
    main()
