"""Core layers with PyTorch-default numerics, built for TPU.

Parity notes (verified in tests/test_layers.py):
  * Conv / Dense use torch's default init — kaiming_uniform(a=sqrt(5)) on
    weights and U(-1/sqrt(fan_in), 1/sqrt(fan_in)) on biases — so a model
    trained from scratch here matches the reference's training dynamics.
  * BatchNorm reproduces torch.nn.BatchNorm2d exactly: biased variance for
    normalization, *unbiased* variance for the running-stat update, torch
    momentum convention (new = (1-m)*old + m*batch, m=0.1 by default).
    Under GSPMD data parallelism the batch statistics are automatically
    global (jnp.mean over the sharded batch compiles to a cross-replica
    reduction over ICI) — no explicit pmean needed.
  * All normalization math runs in float32 even when activations are bf16.

Layout: NHWC activations, HWIO conv kernels (TPU-native).
"""

import contextlib
import contextvars
from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dfc_sa_unet_tpu.ops.convt import conv_transpose_2x2

Dtype = Any

# Cross-replica axis for BatchNorm under shard_map.  Under GSPMD data
# parallelism this stays None (jnp.mean over the sharded batch already
# compiles to a global reduction); an explicit shard_map step sets it so
# BN emits lax.pmean over the named axis.
_BN_AXIS: contextvars.ContextVar = contextvars.ContextVar("bn_cross_replica_axis", default=None)


@contextlib.contextmanager
def bn_cross_replica_axis(axis_name: Optional[str]):
    """Make every BatchNorm traced inside this context sync batch
    statistics over ``axis_name`` (for shard_map-style SPMD)."""
    token = _BN_AXIS.set(axis_name)
    try:
        yield
    finally:
        _BN_AXIS.reset(token)


def conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv2d/Linear default weight init: kaiming_uniform(a=sqrt(5)).

    For HWIO kernels fan_in = H*W*I; the resulting bound is 1/sqrt(fan_in).
    """
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    """torch default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _prec(dtype):
    """HIGHEST for f32 (exact torch parity); default for bf16 (fast MXU)."""
    return None if dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST


def _conv_preferred(dtype):
    """Accumulation dtype request for lax.conv.

    In bf16 mode we must NOT request an f32 output: the conv VJP would
    pair an f32 cotangent with the bf16 kernel, which lax.conv rejects
    (strict same-dtype requirement).  The MXU accumulates in f32
    internally either way; only the stored output dtype changes.
    """
    return None if dtype == jnp.bfloat16 else jnp.float32


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class Conv(nn.Module):
    """2D convolution on NHWC with torch-default init and padding ints.

    Mirrors torch.nn.Conv2d(in, out, kernel_size, stride, padding).
    """

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    use_bias: bool = True
    groups: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", conv_kernel_init, (kh, kw, cin // self.groups, self.features), jnp.float32
        )
        fan_in = kh * kw * (cin // self.groups)
        bias = (
            self.param("bias", torch_bias_init(fan_in), (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(sh, sw),
            padding=((ph, ph), (pw, pw)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
            preferred_element_type=_conv_preferred(dtype), precision=_prec(dtype),
        )
        if bias is not None:
            y = y + bias
        return y.astype(dtype)


class WSConv(nn.Module):
    """Weight-standardized conv (TransUNet StdConv2d, reference
    models/transformer_unet.py:21-27): per-output-channel standardization
    of the kernel with biased variance and eps=1e-5, applied pre-conv.
    """

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    use_bias: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        cin = x.shape[-1]
        kernel = self.param("kernel", conv_kernel_init, (kh, kw, cin, self.features), jnp.float32)
        fan_in = kh * kw * cin
        bias = (
            self.param("bias", torch_bias_init(fan_in), (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        # Standardize over (H, W, I) per output channel, f32.
        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
        kernel = (kernel - mean) / jnp.sqrt(var + 1e-5)
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(sh, sw),
            padding=((ph, ph), (pw, pw)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=_conv_preferred(dtype), precision=_prec(dtype),
        )
        if bias is not None:
            y = y + bias
        return y.astype(dtype)


class ConvTranspose2x2(nn.Module):
    """torch.nn.ConvTranspose2d(cin, cout, kernel_size=2, stride=2).

    The kernel param is named ``kernel_t`` so the checkpoint converter can
    apply the ConvTranspose-specific layout transpose ([Cin,Cout,2,2] ->
    [2,2,Cin,Cout]) without ambiguity.
    """

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel_t", conv_kernel_init, (2, 2, cin, self.features), jnp.float32)
        # torch ConvTranspose2d fan_in (for init) is C_out * kh * kw / groups
        fan_in = 2 * 2 * self.features
        bias = (
            self.param("bias", torch_bias_init(fan_in), (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        dtype = self.dtype or x.dtype
        return conv_transpose_2x2(
            x.astype(dtype), kernel.astype(dtype), bias.astype(jnp.float32) if bias is not None else None
        )


class ConvTranspose(nn.Module):
    """General torch.nn.ConvTranspose2d(cin, cout, k, s, p) on NHWC.

    Implemented as a conv over the stride-dilated input with a spatially
    flipped kernel (the exact adjoint identity), so XLA lowers it to one
    MXU conv.  kernel param is ``kernel_t`` [kh, kw, Cin, Cout] (torch
    stores [Cin, Cout, kh, kw]; converter transposes (2,3,0,1)).
    """

    features: int
    kernel_size: Union[int, Sequence[int]] = 2
    stride: Union[int, Sequence[int]] = 2
    padding: Union[int, Sequence[int]] = 0
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        cin = x.shape[-1]
        kernel = self.param("kernel_t", conv_kernel_init, (kh, kw, cin, self.features), jnp.float32)
        fan_in = kh * kw * self.features  # torch convT fan_in = Cout*kh*kw
        bias = (
            self.param("bias", torch_bias_init(fan_in), (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        dtype = self.dtype or x.dtype
        if (kh, kw, sh, sw, ph, pw) == (2, 2, 2, 2, 0, 0):
            return conv_transpose_2x2(
                x.astype(dtype), kernel.astype(dtype), bias.astype(jnp.float32) if bias is not None else None
            )
        flipped = kernel[::-1, ::-1, :, :]
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            flipped.astype(dtype),
            window_strides=(1, 1),
            padding=((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)),
            lhs_dilation=(sh, sw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=_conv_preferred(dtype), precision=_prec(dtype),
        )
        if bias is not None:
            y = y + bias
        return y.astype(dtype)


class BatchNorm(nn.Module):
    """torch.nn.BatchNorm2d-exact batch normalization (see module docstring)."""

    momentum: float = 0.1
    eps: float = 1e-5
    axis_name: Optional[str] = None  # only needed under shard_map; GSPMD DP is automatic

    @nn.compact
    def __call__(self, x, train: bool):
        features = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((features,), jnp.float32))

        if train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            mean2 = jnp.mean(jnp.square(xf), axis=reduce_axes)
            n = int(np.prod([x.shape[a] for a in reduce_axes]))
            axis_name = self.axis_name or _BN_AXIS.get()
            if axis_name is not None:
                mean = jax.lax.pmean(mean, axis_name)
                mean2 = jax.lax.pmean(mean2, axis_name)
                n = n * jax.lax.psum(1, axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(x.dtype)


class GroupNorm(nn.Module):
    """torch.nn.GroupNorm-exact group normalization (TransUNet ResNetV2)."""

    num_groups: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        assert features % self.num_groups == 0, (features, self.num_groups)
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        orig_shape = x.shape
        xf = x.astype(jnp.float32).reshape(
            orig_shape[0], -1, self.num_groups, features // self.num_groups
        )
        # normalize per (sample, group) over spatial and in-group channels
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.var(xf, axis=(1, 3), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y.reshape(orig_shape)
        y = y * scale + bias
        return y.astype(x.dtype)


class LayerNorm(nn.Module):
    """torch.nn.LayerNorm over the last dimension."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(x.dtype)


class Dense(nn.Module):
    """torch.nn.Linear with torch-default init; kernel stored [in, out]."""

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", conv_kernel_init, (cin, self.features), jnp.float32)
        bias = (
            self.param("bias", torch_bias_init(cin), (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        dtype = self.dtype or x.dtype
        # bf16 mode: do NOT request an f32 dot output.  The round-4
        # TransUNet HLO census (scripts/census_transunet.py) showed every
        # encoder linear materializing an f32 [B,196,3072]/[B,196,768]
        # result to HBM (8.3 GB/forward at B=128) with a separate
        # bias+cast pass re-reading it — the MXU accumulates f32
        # internally either way; emitting bf16 halves the dot's write and
        # the epilogue's read.  f32 mode keeps the f32 output + HIGHEST
        # (exact torch parity); the f32 bias add below is unchanged in
        # both modes (bf16 y + f32 bias promotes to f32 in registers).
        y = jnp.einsum(
            "...i,io->...o", x.astype(dtype), kernel.astype(dtype),
            preferred_element_type=_conv_preferred(dtype), precision=_prec(dtype),
        )
        if bias is not None:
            y = y + bias
        return y.astype(dtype)
