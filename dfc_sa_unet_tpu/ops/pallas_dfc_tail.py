"""Pallas TPU kernel: fused DFC-block tail (inference fast path).

The tail of a DynamicFusionConvAttnBlock after the attention branch
(reference models/unet_dfc_sa_res.py:95-115) is a chain of 1x1 convs and
elementwise ops:

    local = ReLU(y3 + bc)                        # 3x3-conv epilogue (BN folded)
    g     = sigmoid(Conv1x1([local ‖ attn]))     # gate (BN folded)
    fused = g*local + (1-g)*attn
    out   = ReLU(Conv1x1([fused ‖ local ‖ attn])) + Conv1x1(x)*res_scale

XLA's TPU conv emitter cannot absorb these epilogues: the profiler
(PERF.md) shows each stage making a full HBM round trip — ~35 ms of a
143 ms forward at batch 128.  This kernel computes the whole tail in one
pass over flat [TILE_T, C] token tiles: per tile it loads y3/attn/x once,
runs the three matmuls out of VMEM (weights resident across the grid),
and writes only the block output.  HBM traffic drops from ~11 map
traversals (3x3 epilogue pass, concat materializations, gate conv+BN+
sigmoid, fusion conv+BN+ReLU, residual conv, final add) to 4.

Weight layout (BN already folded by the caller, infer/engine.py):
  bc [C]               — 3x3-conv bias + BN shift (the conv runs bias-free)
  wg [2C, C], bg [C]   — gate conv over the virtual concat [local ‖ attn]
  wf [3C, C], bf [C]   — fusion conv over [fused ‖ local ‖ attn]
  wr [Cin, C]          — residual projection, PRE-SCALED by res_scale

To pass an already-activated ``local`` instead of the raw conv output,
pass bc=0: ReLU(local + 0) == local since local >= 0.

Round-1 history: the first version of this kernel tiled [1, 14, W, C]
blocks and was only ever measured inside a slow einsum-based engine
(PERF.md "engine v1"); this rewrite uses flat token tiles, in-kernel
branch epilogues and bias-free convs upstream, and is benchmarked
per-level against the XLA tail by scripts/bench_tail.py.
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
    c = y3_ref.shape[-1]
    dtype = y3_ref.dtype

    local_f = jnp.maximum(y3_ref[:].astype(jnp.float32) + bc_ref[:], 0.0)
    local = local_f.astype(dtype)
    a = a_ref[:]

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
    o = o + jnp.dot(x_ref[:], wr_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = o.astype(o_ref.dtype)


def _blockdiag2(w):
    """[K, C] -> [2K, 2C] block-diagonal diag(w, w)."""
    z = jnp.zeros_like(w)
    return jnp.concatenate(
        [jnp.concatenate([w, z], axis=1), jnp.concatenate([z, w], axis=1)], axis=0
    )


def _pack_weights(c, bc, wg, bg, wf, bf, wr):
    """Token-packing x2 for C<=64 levels: two adjacent tokens share one
    [*, 2C] row so the MXU contractions run at K,N >= 128 instead of 64
    (a [T,64]@[64,64] dot wastes 3/4 of the systolic array; the packed
    [T/2,128]@[128,128] block-diagonal form doubles nominal FLOPs but
    quadruples utilization — net ~2x).  Free reshapes: row-major [T, C]
    == [T/2, 2C] bitwise."""
    bc2, bg2, bf2 = (jnp.tile(v, 2) for v in (bc, bg, bf))
    wg2 = jnp.concatenate([_blockdiag2(wg[:c]), _blockdiag2(wg[c:])], axis=0)
    wf2 = jnp.concatenate(
        [_blockdiag2(wf[:c]), _blockdiag2(wf[c : 2 * c]), _blockdiag2(wf[2 * c :])], axis=0
    )
    wr2 = _blockdiag2(wr)
    return bc2, wg2, bg2, wf2, bf2, wr2


def _pick_tile(t: int, c: int, cin: int) -> int:
    """Largest tile (multiple of 8 sublanes) dividing t with IO tiles
    bounded to ~4 MB so double-buffered pipelining fits VMEM comfortably."""
    row_bytes = (3 * c + cin) * 2  # y3 + a + out (C each) + x (Cin), bf16
    budget = 4 * 2**20
    for tile in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if t % tile == 0 and tile * row_bytes <= budget:
            return tile
    return 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_dfc_tail(y3, attn, x, bc, wg, bg, wf, bf, wr, interpret=False):
    """y3 (raw 3x3-conv out), attn: [B,H,W,C]; x: [B,H,W,Cin] -> [B,H,W,C].

    Flattens to [T, C] token tiles (free reshape: trailing dim unchanged).
    Caller must check ``tail_supported(...)`` first.
    """
    b, h, w, c_out = y3.shape
    cin = x.shape[-1]
    t = b * h * w
    c = c_out
    if c <= 64 and t % 2 == 0:  # token-pack x2 to fill the MXU lanes
        bc, wg, bg, wf, bf, wr = _pack_weights(c, bc, wg, bg, wf, bf, wr)
        t, c, cin = t // 2, 2 * c, 2 * cin
    tile = _pick_tile(t, c, cin)
    assert tile, (t, c, cin)

    y3f = y3.reshape(t, c)
    af = attn.reshape(t, c)
    xf = x.reshape(t, cin)

    def row_map(i):
        return (i, 0)

    const = lambda i: (0, 0)  # noqa: E731
    const1 = lambda i: (0,)  # noqa: E731

    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        )
    out = pl.pallas_call(
        _tail_kernel,
        out_shape=jax.ShapeDtypeStruct((t, c), y3.dtype),
        grid=(t // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), row_map),
            pl.BlockSpec((tile, c), row_map),
            pl.BlockSpec((tile, cin), row_map),
            pl.BlockSpec((c,), const1),
            pl.BlockSpec((2 * c, c), const),
            pl.BlockSpec((c,), const1),
            pl.BlockSpec((3 * c, c), const),
            pl.BlockSpec((c,), const1),
            pl.BlockSpec((cin, c), const),
        ],
        out_specs=pl.BlockSpec((tile, c), row_map),
        interpret=interpret,
        **kwargs,
    )(y3f, af, xf, bc, wg, bg, wf, bf, wr)
    return out.reshape(b, h, w, c_out)


def tail_supported(b: int, h: int, w: int, c: int, cin: int, max_channels: int = 512) -> bool:
    """The kernel needs resident weights (wg+wf+wr <= ~a few MB; C<=512
    keeps the bottleneck's 11 MB weight set out) and a clean tile split."""
    if c > max_channels:
        return False
    t = b * h * w
    if c <= 64 and t % 2 == 0:  # mirrors the token-packing in fused_dfc_tail
        t, c, cin = t // 2, 2 * c, 2 * cin
    return _pick_tile(t, c, cin) > 0
