"""Pallas TPU kernel: fused pooled self-attention core.

Fuses the LightSelfAttention math after the Q/K/V 1x1 convs — energies
QK^T over N = pool_size^2 tokens, row softmax, A @ V — into a single
VMEM-resident kernel gridded over the batch (reference math at
models/unet_dfc_sa_res.py:28-33; no 1/sqrt(d) scaling, faithfully).

N <= 1024 and C <= 1024, so one batch element's q/k/v/energy all fit in
VMEM at once (worst case ~12 MB in f32 at N=1024, C=1024; typical p=8
case is ~300 KB) — no tiling needed inside an element.  The MXU does both
matmuls back-to-back with the softmax on the VPU in between, and the NxN
attention matrix never touches HBM.

On non-TPU backends (CPU tests) the kernel runs in interpreter mode.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only import; absent on CPU-only installs
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _attn_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0].astype(jnp.float32)  # [N, Cqk]
    k = k_ref[0].astype(jnp.float32)  # [N, Cqk]
    v = v_ref[0]                      # [N, C]
    energy = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [N, N] = q @ k^T
    energy = energy - jnp.max(energy, axis=-1, keepdims=True)
    p = jnp.exp(energy)
    attn = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.dot(attn.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_attention_nmc(q, k, v, interpret=False):
    b, n, cq = q.shape
    c = v.shape[-1]
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(int(1.5 * 4 * (n * n + 2 * n * cq + 2 * n * c) + 2**20), 128 * 2**20),
        )
    grid_spec = pl.GridSpec(
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, cq), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n, cq), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0)),
    )
    return pl.pallas_call(
        _attn_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, c), v.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        **kwargs,
    )(q, k, v)


@jax.custom_vjp
def fused_pooled_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Drop-in replacement for ops.attention.pooled_self_attention.

    q, k: [B, p, p, C']; v: [B, p, p, C] -> [B, p, p, C].

    Differentiable: the forward runs the fused Pallas kernel; the backward
    recomputes through the lax reference math (the pooled attention core is
    <=1024 tokens, so recompute is negligible) — standard custom-VJP
    pattern for Pallas kernels.
    """
    b, ph, pw, cq = q.shape
    c = v.shape[-1]
    n = ph * pw
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = _fused_attention_nmc(
        q.reshape(b, n, cq), k.reshape(b, n, cq), v.reshape(b, n, c), interpret=interpret
    )
    return out.reshape(b, ph, pw, c)


def _fused_fwd(q, k, v):
    return fused_pooled_attention(q, k, v), (q, k, v)


def _fused_bwd(residuals, g):
    from dfc_sa_unet_tpu.ops.attention import pooled_self_attention

    q, k, v = residuals
    _, vjp = jax.vjp(pooled_self_attention, q, k, v)
    return vjp(g)


fused_pooled_attention.defvjp(_fused_fwd, _fused_bwd)


# --------------------------------------------------------------------------
# Fused multi-head attention for the transformer zoo (ViT-seg / TransUNet)
#
# Motivation (PERF.md round 3): at B=128 the ViT-B encoder's attention
# block costs ~31 ms/iter vs ~14.5 ms of pure matmul flops — the waste is
# the [B, 12, 196, 196] f32 score tensors (236 MB each) making HBM round
# trips through the softmax, plus the head-split/merge relayouts.  With
# N = 196 tokens and head_dim 64, one batch row's whole attention fits in
# VMEM, so the scores never need to exist in HBM at all.
#
# The kernel takes the PACKED qkv projection output [B, N, 3E] (exactly
# what the torch-parity in_proj computes — vit_seg.py:70-80) and writes
# the merged [B, N, E] head outputs, so the [B,N,E]->[B,h,N,d] transposes
# disappear along with the score traffic.  Heads are a compile-time
# unrolled loop inside one program; grid is over the batch.


def _heads_attention(get_qkv, nh, scale, out_dtype):
    """Shared per-head attention math for both MHA kernels: f32 scores,
    max-subtracted softmax, AV in f32 — ``get_qkv(h)`` returns that
    head's [N, d] q/k/v slices (packed and separate variants differ only
    in slicing)."""
    outs = []
    for h in range(nh):
        q, k, v = get_qkv(h)
        s = jax.lax.dot_general(
            q.astype(jnp.float32), k.astype(jnp.float32),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * scale
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        attn = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
        outs.append(
            jnp.dot(attn, v, preferred_element_type=jnp.float32).astype(out_dtype)
        )
    return jnp.concatenate(outs, axis=-1)


def _mha_kernel(qkv_ref, o_ref, *, nh, hd, scale):
    x = qkv_ref[0]  # [N, 3E]
    e = nh * hd
    o_ref[0] = _heads_attention(
        lambda h: (x[:, h * hd:(h + 1) * hd],
                   x[:, e + h * hd:e + (h + 1) * hd],
                   x[:, 2 * e + h * hd:2 * e + (h + 1) * hd]),
        nh, scale, o_ref.dtype,
    )


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _fused_mha_packed(qkv, num_heads, interpret=False):
    b, n, e3 = qkv.shape
    e = e3 // 3
    hd = e // num_heads
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        # 2x slack on the analytic live-set: Mosaic pads [N, d] tiles to
        # (8,128) multiples and keeps scratch copies; a tight bound OOMs the
        # scoped vmem stack (measured: needs 3.63M where the exact estimate
        # allowed 3.58M at ViT-B shapes).
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(
                int(2 * (2 * (n * e3 + n * e) + 4 * (3 * n * hd + 2 * n * n)) + 2**22),
                100 * 2**20,
            ),
        )
    return pl.pallas_call(
        functools.partial(
            _mha_kernel, nh=num_heads, hd=hd, scale=1.0 / float(hd) ** 0.5
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, e), qkv.dtype),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, e3), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, n, e), lambda i: (i, 0, 0)),
        interpret=interpret,
        **kwargs,
    )(qkv)


def _mha_sep_reference(q, k, v, num_heads):
    """The lax reference math (mirrors vit_seg.TorchMultiheadAttention's
    split/einsum chain) — used for the custom-VJP backwards and CPU tests
    of BOTH variants (packed splits qkv then delegates here)."""
    b, n, e = q.shape
    hd = e // num_heads

    def heads(t):
        return t.reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q), heads(k), heads(v)
    s = jnp.einsum("bhnd,bhmd->bhnm", qh, kh, preferred_element_type=jnp.float32)
    s = s / float(hd) ** 0.5
    attn = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    out = jnp.einsum(
        "bhnm,bhmd->bhnd", attn, vh, preferred_element_type=jnp.float32
    ).astype(q.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, n, e)


def _mha_reference(qkv, num_heads):
    q, k, v = jnp.split(qkv, 3, axis=-1)
    return _mha_sep_reference(q, k, v, num_heads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fused_mha(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Packed-qkv fused multi-head attention: [B, N, 3E] -> [B, N, E].

    Scores/softmax stay VMEM-resident (never materialized in HBM) and the
    head split/merge transposes disappear.  Numerics: f32 scores with
    max-subtracted softmax, 1/sqrt(head_dim) scaling — matches the torch
    MHA chain (reference models/vision_transformer.py via nn.Transformer;
    models/transformer_unet.py:Attention) within bf16 tolerance.
    """
    interpret = jax.default_backend() not in ("tpu", "axon")
    return _fused_mha_packed(qkv, num_heads, interpret=interpret)


def _mha_fwd(qkv, num_heads):
    return fused_mha(qkv, num_heads), qkv


def _mha_bwd(num_heads, qkv, g):
    _, vjp = jax.vjp(lambda t: _mha_reference(t, num_heads), qkv)
    return vjp(g)


fused_mha.defvjp(_mha_fwd, _mha_bwd)


def _mha_kernel_sep(q_ref, k_ref, v_ref, o_ref, *, nh, hd, scale):
    """Separate-projection variant (TransUNet's q/k/v Linears)."""
    o_ref[0] = _heads_attention(
        lambda h: (q_ref[0, :, h * hd:(h + 1) * hd],
                   k_ref[0, :, h * hd:(h + 1) * hd],
                   v_ref[0, :, h * hd:(h + 1) * hd]),
        nh, scale, o_ref.dtype,
    )


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _fused_mha_sep(q, k, v, num_heads, interpret=False):
    b, n, e = q.shape
    hd = e // num_heads
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(
                int(2 * (2 * 4 * n * e + 4 * (3 * n * hd + 2 * n * n)) + 2**22),
                100 * 2**20,
            ),
        )
    spec = pl.BlockSpec((1, n, e), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(
            _mha_kernel_sep, nh=num_heads, hd=hd, scale=1.0 / float(hd) ** 0.5
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, e), v.dtype),
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
        **kwargs,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_mha_sep(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  num_heads: int) -> jnp.ndarray:
    """Separate-projection fused MHA: q, k, v [B, N, E] -> [B, N, E]."""
    interpret = jax.default_backend() not in ("tpu", "axon")
    return _fused_mha_sep(q, k, v, num_heads, interpret=interpret)


def _mha_sep_fwd(q, k, v, num_heads):
    return fused_mha_sep(q, k, v, num_heads), (q, k, v)


def _mha_sep_bwd(num_heads, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b_, c: _mha_sep_reference(a, b_, c, num_heads), q, k, v)
    return vjp(g)


fused_mha_sep.defvjp(_mha_sep_fwd, _mha_sep_bwd)
