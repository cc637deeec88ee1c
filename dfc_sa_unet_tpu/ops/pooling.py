"""Pooling ops: torch-exact adaptive average pooling and max pooling.

``adaptive_avg_pool`` matches ``F.adaptive_avg_pool2d`` (reference
models/unet_dfc_sa_res.py:24) including the variable-size windows torch
uses when the input size is not a multiple of the output size:
window_i = [floor(i*H/p), ceil((i+1)*H/p)).  Like resize, it is expressed
as a dense separable matrix so it rides the MXU and needs no gathers.

``max_pool`` covers both MaxPool2d(2) (DFC nets, reference
models/unet_dfc_sa_res.py:132) and MaxPool2d(2, ceil_mode=True) (vanilla
UNet Down, reference models/unet.py:26) plus the 3x3/stride-2/pad-1 pool
in the TransUNet ResNetV2 root (reference models/transformer_unet.py:101).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _adaptive_pool_matrix_np(in_size: int, out_size: int):
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -((-(i + 1) * in_size) // out_size)  # ceil((i+1)*in/out)
        w[i, start:end] = 1.0 / (end - start)
    return w.astype(np.float32)


def adaptive_pool_matrix(in_size: int, out_size: int) -> jnp.ndarray:
    """[out, in] averaging matrix with torch adaptive-pool windowing."""
    return jnp.asarray(_adaptive_pool_matrix_np(in_size, out_size))


def adaptive_avg_pool(x: jnp.ndarray, output_size) -> jnp.ndarray:
    """Adaptive average pool of an NHWC tensor to (p_h, p_w).

    Exact-parity replacement for ``F.adaptive_avg_pool2d`` on NCHW.
    Kept as the separable matmul formulation: both reduce_window (845
    img/s) and reshape-mean (regressed in engine v2) measured slower than
    this in the full model despite the relayout copies it incurs —
    XLA fuses the matmul form best in context (PERF.md).
    """
    p_h, p_w = int(output_size[0]), int(output_size[1])
    b, h, w, c = x.shape
    if (h, w) == (p_h, p_w):
        return x
    orig_dtype = x.dtype
    bf16 = orig_dtype == jnp.bfloat16
    prec = None if bf16 else jax.lax.Precision.HIGHEST
    ah = adaptive_pool_matrix(h, p_h).astype(orig_dtype if bf16 else jnp.float32)
    aw = adaptive_pool_matrix(w, p_w).astype(orig_dtype if bf16 else jnp.float32)
    # bf16 mode: emit bf16 (MXU still accumulates f32 internally) so no
    # separate f32->bf16 convert pass / double-width HBM write is needed
    pet = orig_dtype if bf16 else jnp.float32
    y = jnp.einsum("ph,bhwc->bpwc", ah, x, preferred_element_type=pet, precision=prec)
    y = jnp.einsum("qw,bpwc->bpqc", aw, y, preferred_element_type=pet, precision=prec)
    return y.astype(orig_dtype)


def max_pool(
    x: jnp.ndarray,
    window: int = 2,
    stride: int | None = None,
    padding: int = 0,
    ceil_mode: bool = False,
) -> jnp.ndarray:
    """Max pool an NHWC tensor, matching torch.nn.MaxPool2d semantics.

    ceil_mode=True right-pads with -inf so that partially-covered windows
    (which torch allows as long as they start inside the input) are kept.
    """
    if stride is None:
        stride = window
    b, h, w, c = x.shape

    def out_size(size):
        eff = size + 2 * padding - window
        if ceil_mode:
            n = -((-eff) // stride) + 1
            # torch: the last window must start inside the (padded) input
            if (n - 1) * stride >= size + padding:
                n -= 1
        else:
            n = eff // stride + 1
        return n

    oh, ow = out_size(h), out_size(w)
    pad_h_hi = (oh - 1) * stride + window - h - padding
    pad_w_hi = (ow - 1) * stride + window - w - padding
    # literal init value (a traced -inf breaks reduce_window's max autodiff rule)
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(
        x,
        neg,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, max(pad_h_hi, 0)), (padding, max(pad_w_hi, 0)), (0, 0)),
    )
