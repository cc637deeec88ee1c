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
