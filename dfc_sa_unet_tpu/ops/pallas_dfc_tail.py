"""Pallas TPU kernel: fused DFC-block tail (inference).

The tail of a DynamicFusionConvAttnBlock after the two branches
(reference models/unet_dfc_sa_res.py:101-114) is a chain of 1x1 convs and
elementwise ops:

    g     = sigmoid(BN(Conv1x1([local ‖ attn])))
    fused = g*local + (1-g)*attn
    out   = ReLU(BN(Conv1x1([fused ‖ local ‖ attn]))) + res_scale*Conv1x1(x)

At batch 128 these 1x1 stages are HBM-bandwidth-bound (arithmetic
intensity ~44 FLOP/B < the bf16 ridge), and XLA cannot fuse across the
two matmuls, so every intermediate makes an HBM round trip.  With
BatchNorm folded into the conv weights (inference), this kernel computes
the whole tail in one pass: each (batch, row-block) tile loads local/
attn/x once, runs the three matmuls out of VMEM, and writes only the
block output — ~3x less HBM traffic than the unfused chain.

Weight layout (BN already folded by the caller, infer/engine.py):
  wg [2C, C], bg [C]   — gate conv over the virtual concat [local ‖ attn]
  wf [3C, C], bf [C]   — fusion conv over [fused ‖ local ‖ attn]
  wr [Cin, C]          — residual projection, PRE-SCALED by res_scale
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

_ROW_BLOCK = 14  # divides every spatial size in the 224-track (224..14)


def _tail_kernel(l_ref, a_ref, x_ref, wg_ref, bg_ref, wf_ref, bf_ref, wr_ref, o_ref):
    c = l_ref.shape[-1]
    t = l_ref.shape[1] * l_ref.shape[2]
    l = l_ref[0].reshape(t, c)
    a = a_ref[0].reshape(t, c)
    x = x_ref[0].reshape(t, x_ref.shape[-1])

    wg = wg_ref[:]
    g_lin = (
        jnp.dot(l, wg[:c], preferred_element_type=jnp.float32)
        + jnp.dot(a, wg[c:], preferred_element_type=jnp.float32)
        + bg_ref[:]
    )
    g = jax.nn.sigmoid(g_lin)

    lf = l.astype(jnp.float32)
    af = a.astype(jnp.float32)
    fused = (g * lf + (1.0 - g) * af).astype(l.dtype)

    wf = wf_ref[:]
    o = (
        jnp.dot(fused, wf[:c], preferred_element_type=jnp.float32)
        + jnp.dot(l, wf[c : 2 * c], preferred_element_type=jnp.float32)
        + jnp.dot(a, wf[2 * c :], preferred_element_type=jnp.float32)
        + bf_ref[:]
    )
    o = jnp.maximum(o, 0.0)
    o = o + jnp.dot(x, wr_ref[:], preferred_element_type=jnp.float32)
    o_ref[0] = o.reshape(l_ref.shape[1], l_ref.shape[2], c).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_dfc_tail(local, attn, x, wg, bg, wf, bf, wr, interpret=False):
    """local, attn: [B,H,W,C]; x: [B,H,W,Cin] -> [B,H,W,C].

    Requires H % 14 == 0 (the 224-resolution track); callers fall back to
    the unfused path otherwise.
    """
    b, h, w, c = local.shape
    cin = x.shape[-1]
    assert h % _ROW_BLOCK == 0, h
    grid = (b, h // _ROW_BLOCK)

    def row_map(i, j):
        return (i, j, 0, 0)

    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        )
    return pl.pallas_call(
        _tail_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), local.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _ROW_BLOCK, w, c), row_map),
            pl.BlockSpec((1, _ROW_BLOCK, w, c), row_map),
            pl.BlockSpec((1, _ROW_BLOCK, w, cin), row_map),
            pl.BlockSpec((2 * c, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c,), lambda i, j: (0,)),
            pl.BlockSpec((3 * c, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c,), lambda i, j: (0,)),
            pl.BlockSpec((cin, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, _ROW_BLOCK, w, c), row_map),
        interpret=interpret,
        **kwargs,
    )(local, attn, x, wg, bg, wf, bf, wr)
