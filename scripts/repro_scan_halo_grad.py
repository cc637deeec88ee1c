"""Minimal repro: XLA GSPMD reshape+halo weight-gradient miscompile (jax 0.9).

The grad-accum step reshapes the batch [B,H,W,C] -> [accum, B/accum, ...]
inside jit and takes a 3x3-conv weight gradient per microbatch.  When the
input's H dimension is sharded over a mesh axis ('spatial'), the weight
gradient comes out exactly min(accum, data_axis)x the true value (2x
here).  lax.scan vs an unrolled Python loop makes no difference — the
trigger is the microbatch reshape of a ('data','spatial')-sharded array
combined with the conv halo exchange in the backward pass.  The same
computation is exact (a) under batch-only sharding, (b) under a
spatial-ONLY mesh (data axis 1 — consistent with the min(accum,
data_axis) factor), or (c) on one device.

THE FIX (shipped in Trainer._step_impl): pin the reshaped array's
sharding explicitly — ``with_sharding_constraint(xm, P(None, 'data',
'spatial'))`` — instead of leaving it to GSPMD propagation, which infers
an inconsistent microbatch sharding and double-counts the weight-grad
all-reduce.  The pinned form is exact for accum 2/4, meshes 4x2/2x4,
and through BN-style batch statistics (the last row below; constraint
inside the scan body works equally).

Run: python scripts/repro_scan_halo_grad.py   (forces 8 virtual CPU devices)
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")  # the image sitecustomize pins 'axon'
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ACCUM = 2


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def grad_scan(w, x):
    """The Trainer._train_step grad-accum form: reshape to microbatches
    inside jit, accumulate dL/dw over them with lax.scan."""
    xm = x.reshape(ACCUM, x.shape[0] // ACCUM, *x.shape[1:])
    def micro(g, xi):
        gi = jax.grad(lambda w: conv(xi, w).sum())(w)
        return g + gi, None
    g, _ = jax.lax.scan(micro, jnp.zeros_like(w), xm)
    return g


def grad_unrolled(w, x):
    """Same math, no scan."""
    xm = x.reshape(ACCUM, x.shape[0] // ACCUM, *x.shape[1:])
    g = jnp.zeros_like(w)
    for i in range(ACCUM):
        g = g + jax.grad(lambda w: conv(xm[i], w).sum())(w)
    return g


def make_grad_pinned(mesh):
    """The fix: pin the microbatch sharding instead of trusting GSPMD's
    propagation through the reshape (exact on every axis combination)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(None, "data", "spatial"))

    def grad_pinned(w, x):
        xm = x.reshape(ACCUM, x.shape[0] // ACCUM, *x.shape[1:])
        xm = jax.lax.with_sharding_constraint(xm, sh)

        def micro(g, xi):
            gi = jax.grad(lambda w: conv(xi, w).sum())(w)
            return g + gi, None

        g, _ = jax.lax.scan(micro, jnp.zeros_like(w), xm)
        return g

    return grad_pinned


def main():
    rng = np.random.RandomState(0)
    b, h, wdt, c, k = 8, 16, 16, 3, 5
    x = jnp.asarray(rng.randn(b, h, wdt, c), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, c, k), jnp.float32)

    truth = np.asarray(grad_scan(w, x))  # single device

    devs = jax.devices()
    mesh2d = Mesh(np.array(devs).reshape(4, 2), ("data", "spatial"))
    mesh1d = Mesh(np.array(devs), ("data",))
    meshsp = Mesh(np.array(devs), ("spatial",))
    sh2d = NamedSharding(mesh2d, P("data", "spatial"))  # batch x rows
    sh1d = NamedSharding(mesh1d, P("data"))             # batch only
    shsp = NamedSharding(meshsp, P(None, "spatial"))    # rows only

    for name, sh, fn in [
        ("scan   + 2-D mesh (H sharded)", sh2d, grad_scan),
        ("scan   + 1-D mesh (batch only)", sh1d, grad_scan),
        ("scan   + spatial-only (rows) ", shsp, grad_scan),
        ("unroll + 2-D mesh (H sharded)", sh2d, grad_unrolled),
        ("PINNED + 2-D mesh (the fix)  ", sh2d, make_grad_pinned(mesh2d)),
    ]:
        xs = jax.device_put(x, sh)
        g = np.asarray(jax.jit(fn)(w, xs))
        ratio = g[np.abs(truth) > 1e-3] / truth[np.abs(truth) > 1e-3]
        print(f"{name}:  max|g - truth| = {np.abs(g - truth).max():.3e}   "
              f"g/truth = {ratio.min():.6f}..{ratio.max():.6f}")

    # ---- idle-axis rows: the bug is NOT scan/reshape-specific.  A PLAIN
    # conv weight gradient whose input is 'spatial'-sharded while a >1
    # 'data' axis sits idle (batch dim replicated) is double-counted —
    # exactly the idle axis size.  The idle-SPATIAL dual (batch sharded,
    # rows replicated) is exact, as are full replication and full 2-D
    # sharding.  This is why the trainer's grad-accum fallback for a
    # microbatch that does not divide the data axis must pin the
    # microbatch FULLY replicated: every formulation that keeps the rows
    # sharded (micro pin P(None, None, 'spatial'), batch replicated
    # outside jit, dynamic_slice instead of reshape, pins on xi/gi/g
    # inside the scan body) measures the same 2x.
    print()
    plain = jax.grad(lambda w_, x_: conv(x_, w_).sum())
    truth_p = np.asarray(jax.jit(plain)(w, x))
    for name, spec in [
        ("PLAIN grad, idle data (rows sharded)   ", P(None, "spatial")),
        ("PLAIN grad, idle spatial (batch sharded)", P("data", None)),
        ("PLAIN grad, fully replicated            ", P(None, None)),
        ("PLAIN grad, fully 2-D sharded           ", P("data", "spatial")),
    ]:
        xs = jax.device_put(x, NamedSharding(mesh2d, spec))
        g = np.asarray(jax.jit(plain)(w, xs))
        ratio = g[np.abs(truth_p) > 1e-3] / truth_p[np.abs(truth_p) > 1e-3]
        print(f"{name}:  g/truth = {ratio.min():.6f}..{ratio.max():.6f}")


if __name__ == "__main__":
    main()
