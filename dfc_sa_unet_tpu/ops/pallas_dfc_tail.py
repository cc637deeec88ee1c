"""Pallas TPU kernel: fused DFC-block tail (inference fast path).

The tail of a DynamicFusionConvAttnBlock after the attention branch
(reference models/unet_dfc_sa_res.py:95-115) is a chain of 1x1 convs and
elementwise ops:

    local = ReLU(y3 + bc)                        # 3x3-conv epilogue (BN folded)
    g     = sigmoid(Conv1x1([local ‖ attn]))     # gate (BN folded)
    fused = g*local + (1-g)*attn
    out   = ReLU(Conv1x1([fused ‖ local ‖ attn])) + Conv1x1(x)*res_scale

XLA's TPU conv emitter cannot absorb these epilogues: each stage makes a
full HBM round trip (PERF.md profiler breakdown).  This kernel computes
the whole tail in one pass: per tile it loads y3/attn/x once, runs the
three matmuls out of VMEM (weights resident across the grid), and writes
only the block output.

Layout discipline (the round-2 lesson, PERF.md): TPU physical layout
tiles the LAST TWO dims (W, C) of an NHWC tensor.  The first version of
this kernel reshaped activations to flat [T, C] tokens outside the
kernel — that retiles T=B*H*W into the sublane dim and cost ~18 ms of
physical reshapes plus ~24 ms of boundary copies per forward, more than
the kernel saved.  This version block-specs the 4-D NHWC tensors
directly ((1, rows, W, C) tiles over a (B, H/rows) grid) and collapses
to [rows*W, C] *inside* the kernel — a pure sublane collapse (W stays a
multiple of 8), so the kernel streams the conv outputs in their native
tiling with no relayout at either boundary.

Weight layout (BN already folded by the caller, infer/engine.py):
  bc [C]               — 3x3-conv bias + BN shift (the conv runs bias-free)
  wg [2C, C], bg [C]   — gate conv over the virtual concat [local ‖ attn]
  wf [3C, C], bf [C]   — fusion conv over [fused ‖ local ‖ attn]
  wr [Cin, C]          — residual projection, PRE-SCALED by res_scale

To pass an already-activated ``local`` instead of the raw conv output,
pass bc=0: ReLU(local + 0) == local since local >= 0.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _tail_kernel(y3_ref, a_ref, x_ref, bc_ref, wg_ref, bg_ref, wf_ref, bf_ref, wr_ref, o_ref):
    _, rh, w, c = y3_ref.shape
    cin = x_ref.shape[-1]
    dtype = y3_ref.dtype

    # sublane collapse (W % 8 == 0, C unchanged) — free in Mosaic
    y3 = y3_ref[:].reshape(rh * w, c)
    a = a_ref[:].reshape(rh * w, c)
    x = x_ref[:].reshape(rh * w, cin)

    local_f = jnp.maximum(y3.astype(jnp.float32) + bc_ref[:], 0.0)
    local = local_f.astype(dtype)

    g_lin = (
        jnp.dot(local, wg_ref[:c], preferred_element_type=jnp.float32)
        + jnp.dot(a, wg_ref[c:], preferred_element_type=jnp.float32)
        + bg_ref[:]
    )
    g = jax.nn.sigmoid(g_lin)

    a_f = a.astype(jnp.float32)
    fused = (g * local_f + (1.0 - g) * a_f).astype(dtype)

    o = (
        jnp.dot(fused, wf_ref[:c], preferred_element_type=jnp.float32)
        + jnp.dot(local, wf_ref[c : 2 * c], preferred_element_type=jnp.float32)
        + jnp.dot(a, wf_ref[2 * c :], preferred_element_type=jnp.float32)
        + bf_ref[:]
    )
    o = jnp.maximum(o, 0.0)
    o = o + jnp.dot(x, wr_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = o.astype(o_ref.dtype).reshape(1, rh, w, c)


def _pick_rows(h: int, w: int, c: int, cin: int) -> int:
    """Largest row count (dividing h, rows*w a multiple of 8 sublanes) with
    IO tiles bounded to ~4 MB so double-buffered pipelining fits VMEM."""
    row_bytes = w * (3 * c + cin) * 2  # y3 + a + out (C each) + x (Cin), bf16
    budget = 4 * 2**20
    best = 0
    for rh in range(1, h + 1):
        if h % rh == 0 and (rh * w) % 8 == 0 and rh * row_bytes <= budget:
            best = rh
    return best


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_dfc_tail(y3, attn, x, bc, wg, bg, wf, bf, wr, interpret=False):
    """y3 (raw 3x3-conv out), attn: [B,H,W,C]; x: [B,H,W,Cin] -> [B,H,W,C].

    Caller must check ``tail_supported(...)`` first.
    """
    b, h, w, c = y3.shape
    cin = x.shape[-1]
    rh = _pick_rows(h, w, c, cin)
    assert rh, (b, h, w, c, cin)

    def blk(i, j):
        return (i, j, 0, 0)

    const2 = lambda i, j: (0, 0)  # noqa: E731
    const1 = lambda i, j: (0,)  # noqa: E731

    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        )
    return pl.pallas_call(
        _tail_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), y3.dtype),
        grid=(b, h // rh),
        in_specs=[
            pl.BlockSpec((1, rh, w, c), blk),
            pl.BlockSpec((1, rh, w, c), blk),
            pl.BlockSpec((1, rh, w, cin), blk),
            pl.BlockSpec((c,), const1),
            pl.BlockSpec((2 * c, c), const2),
            pl.BlockSpec((c,), const1),
            pl.BlockSpec((3 * c, c), const2),
            pl.BlockSpec((c,), const1),
            pl.BlockSpec((cin, c), const2),
        ],
        out_specs=pl.BlockSpec((1, rh, w, c), blk),
        interpret=interpret,
        **kwargs,
    )(y3, attn, x, bc, wg, bg, wf, bf, wr)


def tail_supported(b: int, h: int, w: int, c: int, cin: int, max_channels: int = 512) -> bool:
    """The kernel needs resident weights (wg+wf+wr <= ~a few MB; C<=512
    keeps the bottleneck's 11 MB weight set out) and a clean row split
    whose collapse to [rows*W, C] stays sublane-aligned."""
    if c > max_channels:
        return False
    return _pick_rows(h, w, c, cin) > 0
