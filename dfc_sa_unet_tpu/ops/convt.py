"""2x2/stride-2 transposed convolution as a single matmul + reshape.

Every decoder upsample in the reference is ``nn.ConvTranspose2d(cin, cout,
kernel_size=2, stride=2)`` (reference models/unet_dfc_sa_res.py:147-157).
With kernel == stride the output windows never overlap, so the op is
exactly: each input pixel produces an independent 2x2 output block,

    out[b, 2i+u, 2j+v, o] = sum_c x[b, i, j, c] * w[u, v, c, o] + bias[o]

i.e. one [B*H*W, C] x [C, 4*O] matmul followed by a depth-to-space
reshape — dramatically friendlier to the MXU than a general
``lax.conv_transpose`` and numerically identical to torch.
"""

import jax
import jax.numpy as jnp


def conv_transpose_2x2(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """NHWC transposed conv with 2x2 kernel, stride 2.

    kernel layout: [2, 2, C_in, C_out] (torch ConvTranspose2d stores
    [C_in, C_out, kh, kw]; the checkpoint converter transposes (2,3,0,1)).
    """
    b, h, w, c = x.shape
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (2, 2) and cin == c, (kernel.shape, x.shape)
    # [B,H,W,C] @ [C, 2*2*O] -> [B,H,W,2,2,O]
    k2 = kernel.transpose(2, 0, 1, 3).reshape(cin, 4 * cout)
    bf16 = x.dtype == jnp.bfloat16
    prec = None if bf16 else jax.lax.Precision.HIGHEST
    # bf16 mode emits bf16 (f32 MXU accumulation either way) — avoids an
    # f32 HBM write + separate convert pass on the full-resolution map
    y = jnp.einsum("bhwc,ck->bhwk", x, k2,
                   preferred_element_type=x.dtype if bf16 else jnp.float32, precision=prec)
    y = y.reshape(b, h, w, 2, 2, cout)
    # interleave: out[b, h*2+u, w*2+v, o]
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, cout)
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)
