"""Parity tests: core ops vs the corresponding torch functional ops."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from dfc_sa_unet_tpu.ops import (
    adaptive_avg_pool,
    conv_transpose_2x2,
    max_pool,
    resize_bilinear,
)


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((8, 8), (224, 224)), ((14, 14), (28, 28)), ((13, 17), (31, 9)), ((37, 37), (19, 19)), ((1, 5), (7, 3))],
)
def test_resize_bilinear_matches_torch(align_corners, in_hw, out_hw):
    x = _rand((2, *in_hw, 5))
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners=align_corners))
    want = _to_nhwc(
        F.interpolate(_nchw(x), size=out_hw, mode="bilinear", align_corners=align_corners)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((224, 224), (8, 8)), ((224, 224), (4, 4)), ((14, 14), (8, 8)), ((30, 17), (7, 5)), ((9, 9), (9, 9))],
)
def test_adaptive_avg_pool_matches_torch(in_hw, out_hw):
    x = _rand((3, *in_hw, 4), seed=1)
    got = np.asarray(adaptive_avg_pool(jnp.asarray(x), out_hw))
    want = _to_nhwc(F.adaptive_avg_pool2d(_nchw(x), out_hw))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("ceil_mode", [False, True])
@pytest.mark.parametrize("hw", [(224, 224), (75, 75), (13, 9), (300, 300)])
def test_max_pool_2x2_matches_torch(ceil_mode, hw):
    x = _rand((2, *hw, 3), seed=2)
    got = np.asarray(max_pool(jnp.asarray(x), 2, 2, ceil_mode=ceil_mode))
    want = _to_nhwc(F.max_pool2d(_nchw(x), 2, 2, ceil_mode=ceil_mode))
    np.testing.assert_allclose(got, want, atol=0, rtol=0)


def test_max_pool_3x3_s2_p1_matches_torch():
    x = _rand((2, 112, 112, 8), seed=3)
    got = np.asarray(max_pool(jnp.asarray(x), 3, 2, padding=1))
    want = _to_nhwc(F.max_pool2d(_nchw(x), 3, 2, padding=1))
    np.testing.assert_allclose(got, want, atol=0, rtol=0)


def test_conv_transpose_2x2_matches_torch():
    x = _rand((2, 14, 14, 32), seed=4)
    w = _rand((32, 16, 2, 2), seed=5)  # torch layout [Cin, Cout, kh, kw]
    b = _rand((16,), seed=6)
    got = np.asarray(
        conv_transpose_2x2(
            jnp.asarray(x), jnp.asarray(np.transpose(w, (2, 3, 0, 1))), jnp.asarray(b)
        )
    )
    want = _to_nhwc(
        F.conv_transpose2d(_nchw(x), torch.from_numpy(w), torch.from_numpy(b), stride=2)
    )
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-5)
