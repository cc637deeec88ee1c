"""Fused Pallas conv kernels: the all-Pallas DFC compute path.

Round-2 finding (PERF.md): ~871 img/s is a hard plateau for any XLA
formulation of the flagship — the remaining ~50 ms/forward at B=128 is
required elementwise map traversals (BN/ReLU epilogues, gate math,
residuals) that XLA's TPU conv emitter cannot absorb, and a Pallas
kernel that merely *consumes* an XLA conv output pays a full-map
relayout copy at the boundary (XLA conv outputs use exotic internal
layouts).  Conclusion: the conv must live INSIDE the kernel.

This module provides:

  conv3x3_bn_relu   — 3x3 conv + folded-BN affine + ReLU in one kernel
                      (the per-level A/B probe; PERF.md table)
  dfc_tail_from_x   — the whole DFC block tail given x and the attention
                      branch output: local conv3x3+BN+ReLU, gate
                      conv1x1+BN+sigmoid, fusion conv1x1+BN+ReLU,
                      residual conv1x1, one read of (x, a) -> one write

Reference math: /root/reference/models/unet_dfc_sa_res.py:41-116
(DynamicFusionConvAttnBlock).  BN is folded into conv scale/shift by the
caller (infer/engine.py) — inference only; training stays on the XLA
path.

Design notes (pallas_guide.md):
  - grid (B, H/R): each cell computes an output tile [R, W, Cout] with
    full W so W-edge zero-padding is exactly conv padding.
  - row halo via overlapping ``pl.Element(R+2)`` input windows over an
    explicitly 1-row-zero-padded input (Mosaic rejects OOB/low-padded
    Element windows), so input HBM traffic stays ~1x + one pad pass.
  - the 3x3 conv runs as 3 matmuls of [R*W, 3*Cin] @ [3*Cin, Cout]
    (dx taps concatenated along channels in VMEM): K=3*Cin keeps the
    MXU K-dim >= 192 even at the C=64 level.
  - all accumulation f32; outputs cast to the input dtype.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is unavailable when running the interpreter on CPU
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _shift_w(s, dx):
    """Tap x[., w+dx-1] as a shifted copy of s with zero fill at the edge.

    dx=0 -> neighbor to the left (shift content right), dx=1 -> center,
    dx=2 -> neighbor to the right (shift content left).
    """
    if dx == 1:
        return s
    z = jnp.zeros_like(s[:, :1])
    if dx == 0:
        return jnp.concatenate([z, s[:, :-1]], axis=1)
    return jnp.concatenate([s[:, 1:], z], axis=1)


def _conv3x3_acc(xe, w_ref, r, width, cin, cout):
    """xe: [R+2, W, Cin] halo rows; w_ref: [3, 3*Cin, Cout].

    Returns f32 [R*W, Cout].  For each dy the three dx taps are
    channel-concatenated and contracted in one [R*W, 3Cin] @ [3Cin, Cout]
    matmul.
    """
    acc = jnp.zeros((r * width, cout), jnp.float32)
    for dy in range(3):
        s = xe[dy : dy + r]  # [R, W, Cin]
        taps = jnp.concatenate([_shift_w(s, dx) for dx in range(3)], axis=-1)
        acc += jnp.dot(
            taps.reshape(r * width, 3 * cin), w_ref[dy], preferred_element_type=jnp.float32
        )
    return acc


def _conv3x3_kernel(x_ref, w_ref, b_ref, o_ref):
    _, rp2, width, cin = x_ref.shape
    r = rp2 - 2
    cout = o_ref.shape[-1]
    xe = x_ref[:].reshape(rp2, width, cin)
    acc = _conv3x3_acc(xe, w_ref, r, width, cin, cout)
    y = jnp.maximum(acc + b_ref[:], 0.0)
    o_ref[:] = y.astype(o_ref.dtype).reshape(1, r, width, cout)


def _pick_rows(h: int, w: int, cin: int, cout: int, budget: int = 6 * 2**20,
               itemsize: int = 2) -> int:
    """Largest R dividing h whose full per-cell working set fits in
    ``budget`` bytes of the ~16 MB VMEM, leaving room for the pipeline's
    double buffering.  Counting only the input tile is a trap: at
    224/112-wide levels whole-image tiles fit the input but the f32
    accumulator + tap concat push the live set past VMEM and Mosaic
    spills to HBM (first A/B measured 0.6x XLA at down2 from exactly
    this).  R*W must stay a multiple of 8 sublanes.  ``itemsize`` is the
    element width of the activations (2 for bf16; 4 in f32 parity mode,
    where the real live set doubles and the bf16 estimate would overflow
    VMEM or trigger the HBM-spill slowdown)."""
    best = 0
    for r in range(1, h + 1):
        if h % r != 0 or (r * w) % 8 != 0:
            continue
        live = (
            (r + 2) * w * cin * itemsize  # halo input tile
            + r * w * 3 * cin * itemsize  # dx-tap concat (one dy live at a time)
            + r * w * cout * 4  # f32 accumulator
            + r * w * cout * itemsize  # output tile
        )
        if live <= budget:
            best = r
    return best


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3_bn_relu(x, w, b, interpret=False):
    """x: [B, H, W, Cin]; w: [3, 3, Cin, Cout] (BN scale folded);
    b: [Cout] f32 (bias + BN shift) -> ReLU'd [B, H, W, Cout]."""
    bsz, h, width, cin = x.shape
    cout = w.shape[-1]
    r = _pick_rows(h, width, cin, cout, itemsize=x.dtype.itemsize)
    assert r, (x.shape, w.shape)
    # [3(dy), 3(dx), Cin, Cout] -> [3, 3*Cin, Cout] with dx-major channel packing
    wp = w.astype(x.dtype).reshape(3, 3 * cin, cout)

    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
    # Mosaic does not support OOB (low-padded) Element windows; pad the two
    # halo rows explicitly (one fused XLA pass) so every window is in bounds.
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    grid = (bsz, h // r)
    return pl.pallas_call(
        _conv3x3_kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, h, width, cout), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(r + 2), pl.Element(width), pl.Element(cin)),
                lambda i, j: (i, j * r, 0, 0),
            ),
            pl.BlockSpec((3, 3 * cin, cout), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((cout,), lambda i, j: (0,)),
        ],
        out_specs=pl.BlockSpec((1, r, width, cout), lambda i, j: (i, j, 0, 0)),
        interpret=interpret,
        **kwargs,
    )(xp, wp, b)


def _dfc_tail_kernel(x_ref, a_ref, wc_ref, bc_ref, wg_ref, bg_ref, wf_ref, bf_ref, wr_ref, o_ref):
    """Whole DFC-block tail for one [R, W] tile.

    x_ref: [R+2, W, Cin] (halo rows), a_ref: [R, W, C] attention branch.
    local = ReLU(conv3x3(x) + bc)            (BN folded)
    g     = sigmoid(dot([local ‖ a], wg)+bg) (BN folded)
    fused = g*local + (1-g)*a
    out   = ReLU(dot([fused ‖ local ‖ a], wf)+bf) + dot(x, wr)
    (res_scale is folded into wr by the caller.)
    """
    _, rp2, width, cin = x_ref.shape
    r = rp2 - 2
    c = a_ref.shape[-1]
    dtype = a_ref.dtype

    xe = x_ref[:].reshape(rp2, width, cin)
    acc = _conv3x3_acc(xe, wc_ref, r, width, cin, c)
    local_f = jnp.maximum(acc + bc_ref[:], 0.0)
    local = local_f.astype(dtype)
    a = a_ref[:].reshape(r * width, c)

    g_lin = (
        jnp.dot(local, wg_ref[:c], preferred_element_type=jnp.float32)
        + jnp.dot(a, wg_ref[c:], preferred_element_type=jnp.float32)
        + bg_ref[:]
    )
    g = jax.nn.sigmoid(g_lin)
    fused = (g * local_f + (1.0 - g) * a.astype(jnp.float32)).astype(dtype)

    o = (
        jnp.dot(fused, wf_ref[:c], preferred_element_type=jnp.float32)
        + jnp.dot(local, wf_ref[c : 2 * c], preferred_element_type=jnp.float32)
        + jnp.dot(a, wf_ref[2 * c :], preferred_element_type=jnp.float32)
        + bf_ref[:]
    )
    o = jnp.maximum(o, 0.0)
    xc = xe[1 : 1 + r].reshape(r * width, cin)
    o = o + jnp.dot(xc, wr_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = o.astype(o_ref.dtype).reshape(1, r, width, c)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dfc_tail_from_x(x, a, wc, bc, wg, bg, wf, bf, wr, interpret=False):
    """x: [B, H, W, Cin]; a: [B, H, W, C] -> [B, H, W, C].

    wc: [3, 3, Cin, C] 3x3 conv kernel (BN scale folded)
    bc: [C] f32 conv bias + BN shift
    wg: [2C, C], bg: [C]  — gate 1x1 (BN folded), input order [local, a]
    wf: [3C, C], bf: [C]  — fusion 1x1 (BN folded), order [fused, local, a]
    wr: [Cin, C]          — residual 1x1 * res_scale (identity*scale when
                            Cin == C; caller builds it either way)
    """
    bsz, h, width, cin = x.shape
    c = a.shape[-1]
    r = _pick_rows(h, width, cin, c, itemsize=x.dtype.itemsize)
    assert r, (x.shape, a.shape)
    wcp = wc.astype(x.dtype).reshape(3, 3 * cin, c)

    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
    const2 = lambda i, j: (0, 0)  # noqa: E731
    const1 = lambda i, j: (0,)  # noqa: E731
    const3 = lambda i, j: (0, 0, 0)  # noqa: E731
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return pl.pallas_call(
        _dfc_tail_kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, h, width, c), a.dtype),
        grid=(bsz, h // r),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(r + 2), pl.Element(width), pl.Element(cin)),
                lambda i, j: (i, j * r, 0, 0),
            ),
            pl.BlockSpec((1, r, width, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((3, 3 * cin, c), const3),
            pl.BlockSpec((c,), const1),
            pl.BlockSpec((2 * c, c), const2),
            pl.BlockSpec((c,), const1),
            pl.BlockSpec((3 * c, c), const2),
            pl.BlockSpec((c,), const1),
            pl.BlockSpec((cin, c), const2),
        ],
        out_specs=pl.BlockSpec((1, r, width, c), lambda i, j: (i, j, 0, 0)),
        interpret=interpret,
        **kwargs,
    )(xp, a, wcp, bc, wg, bg, wf, bf, wr)


def conv_supported(b: int, h: int, w: int, cin: int, cout: int, max_channels: int = 512,
                   itemsize: int = 2) -> bool:
    """Weights must stay VMEM-resident (wc 9*Cin*C + wg 2C^2 + wf 3C^2
    + wr Cin*C bf16 — C<=512 keeps this under ~6 MB) and rows must split
    sublane-aligned.  Pass the activation ``itemsize`` (4 in f32 parity
    mode) so the VMEM estimate matches the real working set."""
    if cout > max_channels or cin > 2 * max_channels:
        return False
    return _pick_rows(h, w, cin, cout, itemsize=itemsize) > 0
