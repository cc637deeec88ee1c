"""Self-attention cores used by the DFC-SA blocks.

``pooled_self_attention`` is the math inside LightSelfAttention after the
Q/K/V 1x1 convs (reference models/unet_dfc_sa_res.py:28-33): unscaled
QK^T energies over N = pool_size^2 tokens, softmax over keys, then A @ V.
Note the reference applies **no** 1/sqrt(d) scaling — we preserve that.

``full_res_self_attention`` is the ablation-3 variant over all H*W tokens
(reference models/unet_dfc_sa_ablation_attention.py:15-26).

Softmax always runs in float32 regardless of the compute dtype; the
matmuls accumulate in float32 on the MXU.
"""

import jax
import jax.numpy as jnp


def _attention_core(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """q,k: [B, N, C']; v: [B, N, C].  Returns [B, N, C].

    out_i = sum_j softmax_j(q_i . k_j) v_j  — matching the reference's
    torch.bmm(V, attention^T) with attention = softmax(Q K^T, dim=-1).
    """
    prec = None if q.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    energy = jnp.einsum("bnc,bmc->bnm", q, k, preferred_element_type=jnp.float32, precision=prec)
    attn = jax.nn.softmax(energy.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bnm,bmc->bnc", attn.astype(v.dtype), v, preferred_element_type=jnp.float32, precision=prec)
    return out.astype(v.dtype)


def pooled_self_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Attention over pooled tokens. q,k: [B,p,p,C'], v: [B,p,p,C] -> [B,p,p,C]."""
    b, ph, pw, cq = q.shape
    c = v.shape[-1]
    n = ph * pw
    out = _attention_core(q.reshape(b, n, cq), k.reshape(b, n, cq), v.reshape(b, n, c))
    return out.reshape(b, ph, pw, c)


def full_res_self_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Attention over all spatial tokens (ablation 3). Same layout contract."""
    return pooled_self_attention(q, k, v)
