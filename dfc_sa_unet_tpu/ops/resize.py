"""Bilinear resize as separable MXU matmuls, exactly matching torch.

The reference uses ``F.interpolate(..., mode='bilinear')`` in two flavours:
  * ``align_corners=False`` — LightSelfAttention upsample and all decoder
    shape-fix paths (reference models/unet_dfc_sa_res.py:36,181).
  * ``align_corners=True``  — vanilla UNet bilinear Up (reference
    models/unet.py:37).

Instead of gather-based interpolation (bad on TPU), we precompute a dense
[out, in] interpolation matrix at trace time (shapes are static under jit)
and apply it as two matmuls: ``out = W_h @ x @ W_w^T``.  This is exact
(each row holds the two bilinear taps) and maps straight onto the MXU.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _bilinear_matrix_np(in_size: int, out_size: int, align_corners: bool):
    """Dense [out_size, in_size] bilinear interpolation matrix (float32).

    Matches torch's area_pixel_compute_source_index semantics:
      align_corners=False: src = (i + 0.5) * in/out - 0.5, clamped below at 0.
      align_corners=True:  src = i * (in-1)/(out-1).
    The upper tap index is clamped to in-1 (torch does the same), which
    makes explicit upper clamping of src unnecessary.
    """
    w = np.zeros((out_size, in_size), dtype=np.float64)
    if in_size == 1:
        w[:, 0] = 1.0
        return w.astype(np.float32)
    idx = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros((1,), dtype=np.float64)
        else:
            src = idx * (in_size - 1) / (out_size - 1)
    else:
        src = (idx + 0.5) * (in_size / out_size) - 0.5
        src = np.maximum(src, 0.0)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.minimum(i0, in_size - 1)
    frac = src - i0
    i1 = np.minimum(i0 + 1, in_size - 1)
    np.add.at(w, (np.arange(out_size), i0), 1.0 - frac)
    np.add.at(w, (np.arange(out_size), i1), frac)
    return w.astype(np.float32)


def bilinear_matrix(in_size: int, out_size: int, align_corners: bool = False) -> jnp.ndarray:
    """Public accessor for the [out, in] interpolation matrix."""
    return jnp.asarray(_bilinear_matrix_np(in_size, out_size, align_corners))


def resize_bilinear(x: jnp.ndarray, size, align_corners: bool = False) -> jnp.ndarray:
    """Bilinear-resize an NHWC tensor to spatial ``size`` = (H_out, W_out).

    Exact-parity replacement for ``F.interpolate(x_nchw, size, mode='bilinear',
    align_corners=...)``.  Runs as two MXU matmuls; a no-op if the size
    already matches.
    """
    h_out, w_out = int(size[0]), int(size[1])
    b, h_in, w_in, c = x.shape
    if (h_in, w_in) == (h_out, w_out):
        return x
    orig_dtype = x.dtype
    # In bf16 compute mode keep everything bf16 (fast MXU path); in f32
    # (parity) mode use HIGHEST so results match torch bit-for-bit.
    bf16 = orig_dtype == jnp.bfloat16
    prec = None if bf16 else jax.lax.Precision.HIGHEST
    wh = bilinear_matrix(h_in, h_out, align_corners).astype(orig_dtype if bf16 else jnp.float32)
    ww = bilinear_matrix(w_in, w_out, align_corners).astype(orig_dtype if bf16 else jnp.float32)
    # Contract H then W; the MXU accumulates f32 internally either way.
    # bf16 mode emits bf16 directly (no separate convert pass / f32 write).
    pet = orig_dtype if bf16 else jnp.float32
    y = jnp.einsum("oh,bhwc->bowc", wh, x, preferred_element_type=pet, precision=prec)
    y = jnp.einsum("pw,bowc->bopc", ww, y, preferred_element_type=pet, precision=prec)
    return y.astype(orig_dtype)
